"""Serving tests: continuous-batching engine + HTTP protocol surface.

The engine must match the offline greedy path bit-for-bit (same model, same
rules) while admitting/harvesting requests mid-flight; the HTTP layer must
speak both reference wire protocols (python multipart, C++ octet-stream).
"""

import json
import struct
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax.numpy as jnp

from whisper_tpu.config import N_SAMPLES, WhisperConfig
from whisper_tpu.decode import greedy_decode
from whisper_tpu.models.model import init_params
from whisper_tpu.ops.audio import write_wav
from whisper_tpu.ops.mel import log_mel_batch
from whisper_tpu.serving.engine import ContinuousBatchingEngine, Request
from whisper_tpu.serving.server import make_server, parse_multipart

NANO = WhisperConfig(
    name="nano-srv",
    n_mels=80,
    n_audio_ctx=64,
    n_audio_state=64,
    n_audio_head=2,
    n_audio_layer=2,
    n_vocab=51865,
    n_text_ctx=24,
    n_text_state=64,
    n_text_head=2,
    n_text_layer=2,
)


class IdTok:
    """Tokenizer stand-in that emits ids as text (no vocab asset needed)."""

    def decode(self, ids):
        return " ".join(str(int(i)) for i in ids)

    def decode_with_timestamps(self, ids):
        return self.decode(ids)

    non_speech_tokens = ()


@pytest.fixture(scope="module")
def nano_params():
    return init_params(NANO)


@pytest.fixture()
def engine(nano_params):
    eng = ContinuousBatchingEngine(
        nano_params, NANO, IdTok(),
        max_slots=4,
        compute_dtype=jnp.float32,
        steps_per_sync=2,
        max_tokens=12,
        apply_filters=False,
    ).start()
    yield eng
    eng.stop()


def _audio(rng, seconds=1.0):
    return (rng.standard_normal(int(16000 * seconds)) * 0.1).astype(np.float32)


def test_engine_single_request(engine, rng):
    res = engine.transcribe(_audio(rng), language="zh", timeout=60)
    assert res["success"]
    assert isinstance(res["text"], str)
    assert res["audio_seconds"] == pytest.approx(1.0)
    assert engine.stats.requests_total == 1
    # phase breakdown advanced and roughly accounts for busy time
    s = engine.stats
    assert s.ticks_total >= 1
    assert s.admit_seconds_total > 0 and s.harvest_seconds_total > 0
    # clock-call ordering leaves ~50 us/tick of slack between the two sums
    assert (s.admit_seconds_total + s.step_seconds_total
            + s.harvest_seconds_total) <= s.busy_seconds_total + 0.01 * s.ticks_total


def test_engine_matches_offline_greedy(engine, nano_params, rng):
    """Continuous-batching decode == offline greedy_decode on the same input."""
    wav = _audio(rng, 0.7)
    res = engine.transcribe(wav, language="zh", timeout=60)
    got_ids = [int(s) for s in res["text"].split()] if res["text"] else []

    audio = np.zeros((1, N_SAMPLES), np.float32)
    audio[0, : len(wav)] = wav
    mel = log_mel_batch(jnp.asarray(audio), jnp.asarray([len(wav)], np.int32),
                        n_mels=NANO.n_mels)[..., : 2 * NANO.n_audio_ctx]
    prompt = jnp.asarray([NANO.sot_sequence("zh", "transcribe")], jnp.int32)
    ref = greedy_decode(nano_params, mel, prompt, NANO, max_tokens=12)
    ref_ids = np.asarray(ref.tokens)[0, 4: np.asarray(ref.lengths)[0]].tolist()
    assert got_ids == ref_ids


def test_engine_concurrent_requests(engine, rng):
    """More requests than slots; all must complete with per-request results."""
    wavs = [_audio(rng, 0.5 + 0.2 * i) for i in range(7)]
    futs = [engine.submit(Request(audio=w, language="zh")) for w in wavs]
    results = [f.result(timeout=120) for f in futs]
    assert all(r["success"] for r in results)
    for w, r in zip(wavs, results):
        assert r["audio_seconds"] == pytest.approx(len(w) / 16000)
    assert engine.stats.requests_total >= 7


def test_engine_staggered_admission(engine, rng):
    """A request arriving mid-decode of another must still match offline."""
    w1 = _audio(rng, 0.9)
    f1 = engine.submit(Request(audio=w1, language="zh"))
    time.sleep(0.05)  # let decoding of w1 start
    w2 = _audio(rng, 0.4)
    f2 = engine.submit(Request(audio=w2, language="zh"))
    r1, r2 = f1.result(timeout=60), f2.result(timeout=60)

    for w, r in ((w1, r1), (w2, r2)):
        audio = np.zeros((1, N_SAMPLES), np.float32)
        audio[0, : len(w)] = w
        mel = log_mel_batch(jnp.asarray(audio), jnp.asarray([len(w)], np.int32),
                            n_mels=NANO.n_mels)[..., : 2 * NANO.n_audio_ctx]
        prompt = jnp.asarray([NANO.sot_sequence("zh", "transcribe")], jnp.int32)
        ref = greedy_decode(engine.params, mel, prompt, NANO,
                            compute_dtype=jnp.float32, max_tokens=12)
        ref_ids = np.asarray(ref.tokens)[0, 4: np.asarray(ref.lengths)[0]].tolist()
        got = [int(s) for s in r["text"].split()] if r["text"] else []
        assert got == ref_ids


def test_multipart_parser():
    boundary = "XBOUND"
    body = (
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="language"\r\n\r\n'
        "en\r\n"
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="wav"; filename="a.wav"\r\n'
        "Content-Type: audio/wav\r\n\r\n"
    ).encode() + b"BINARY\x00DATA" + f"\r\n--{boundary}--\r\n".encode()
    fields = parse_multipart(body, f'multipart/form-data; boundary={boundary}')
    assert fields["language"] == "en"
    assert fields["wav"] == b"BINARY\x00DATA"


@pytest.fixture()
def http_server(engine):
    srv = make_server(engine, "127.0.0.1", 0, request_timeout_s=90)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()


def test_http_health_and_metrics(http_server):
    with urllib.request.urlopen(f"{http_server}/health", timeout=10) as r:
        assert json.load(r)["status"] == "healthy"
    with urllib.request.urlopen(f"{http_server}/metrics", timeout=10) as r:
        m = json.load(r)
    assert "requests_total" in m and "rtf" in m


def test_http_asr_octet_stream(http_server, rng):
    """C++ reference protocol: raw f32le PCM body."""
    wav = _audio(rng, 0.5)
    req = urllib.request.Request(
        f"{http_server}/asr", data=wav.tobytes(),
        headers={"Content-Type": "application/octet-stream"})
    with urllib.request.urlopen(req, timeout=90) as r:
        res = json.load(r)
    assert res["success"] is True
    assert "text" in res


def test_http_asr_multipart_wav(http_server, rng, tmp_path):
    """Python reference protocol: multipart WAV upload."""
    wav = _audio(rng, 0.5)
    p = tmp_path / "u.wav"
    write_wav(str(p), wav)
    boundary = "WHISPERTPU"
    body = (
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="language"\r\n\r\nzh\r\n'
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="wav"; filename="u.wav"\r\n'
        "Content-Type: audio/wav\r\n\r\n"
    ).encode() + p.read_bytes() + f"\r\n--{boundary}--\r\n".encode()
    req = urllib.request.Request(
        f"{http_server}/asr", data=body,
        headers={"Content-Type": f"multipart/form-data; boundary={boundary}"})
    with urllib.request.urlopen(req, timeout=90) as r:
        res = json.load(r)
    assert res["success"] is True


def test_http_asr_bad_inputs(http_server):
    # octet-stream with size % 4 != 0 -> 400 (C++ server parity)
    req = urllib.request.Request(
        f"{http_server}/asr", data=b"abc",
        headers={"Content-Type": "application/octet-stream"})
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=10)
    assert ei.value.code == 400
    # garbage WAV -> 400
    req = urllib.request.Request(
        f"{http_server}/asr", data=b"not a wav at all",
        headers={"Content-Type": "audio/wav"})
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=10)
    assert ei.value.code == 400


def test_client_module(http_server, rng, tmp_path):
    """whisper_tpu.serving.client against a live server (both protocols)."""
    from whisper_tpu.serving import client

    host, port = http_server.rsplit(":", 1)[0].replace("http://", ""), int(http_server.rsplit(":", 1)[1])
    assert client.health(host, port)["status"] == "healthy"
    wav = _audio(rng, 0.4)
    p = tmp_path / "c.wav"
    write_wav(str(p), wav)
    r1 = client.transcribe_file(str(p), host, port, use_multipart=True, timeout=90)
    r2 = client.transcribe_file(str(p), host, port, use_multipart=False, timeout=90)
    assert r1["success"] and r2["success"]
    # 16-bit WAV quantization can flip low-confidence random-weight tokens;
    # the PCM path must at least produce the same result shape
    assert isinstance(r1["text"], str) and isinstance(r2["text"], str)


def test_engine_auto_language(nano_params, rng):
    """language='auto' resolves to a concrete code via the detection step."""
    eng = ContinuousBatchingEngine(
        nano_params, NANO, IdTok(), max_slots=2,
        compute_dtype=jnp.float32, steps_per_sync=2, max_tokens=6,
        apply_filters=False,
    ).start()
    try:
        res = eng.transcribe(_audio(rng, 0.5), language="auto", timeout=60)
        assert res["success"]
        from whisper_tpu.tokenizer import LANGUAGES

        assert res["language"] in LANGUAGES
    finally:
        eng.stop()


def test_engine_backpressure(nano_params, rng):
    """submit raises OverloadedError once the queue is at capacity."""
    from whisper_tpu.serving.engine import OverloadedError

    eng = ContinuousBatchingEngine(
        nano_params, NANO, IdTok(), max_slots=1,
        compute_dtype=jnp.float32, max_tokens=4,
        apply_filters=False, max_queue=2,
    )  # NOT started: queue only fills
    eng.submit(Request(audio=_audio(rng, 0.2)))
    eng.submit(Request(audio=_audio(rng, 0.2)))
    import pytest as _pytest

    with _pytest.raises(OverloadedError):
        eng.submit(Request(audio=_audio(rng, 0.2)))


def test_http_streaming(http_server, rng):
    """X-Stream: 1 returns chunked NDJSON partials then the final result."""
    import http.client

    host, port = http_server.replace("http://", "").split(":")
    wav = _audio(rng, 1.2)
    conn = http.client.HTTPConnection(host, int(port), timeout=90)
    conn.request("POST", "/asr", body=wav.tobytes(),
                 headers={"Content-Type": "application/octet-stream",
                          "X-Stream": "1"})
    resp = conn.getresponse()
    assert resp.status == 200
    assert "ndjson" in resp.getheader("Content-Type", "")
    lines = [json.loads(l) for l in resp.read().decode().strip().splitlines()]
    conn.close()
    assert lines, "no stream output"
    final = lines[-1]
    assert final.get("success") is True
    # any earlier lines are partials and must be prefixes of progress
    partial_texts = [l["partial"] for l in lines[:-1] if "partial" in l]
    for a, b in zip(partial_texts, partial_texts[1:]):
        assert b.startswith(a[: max(len(a) - 8, 0)])  # monotone-ish growth


def test_engine_survives_bad_batch(nano_params, rng):
    """A crashing step must fail in-flight futures but keep serving."""
    eng = ContinuousBatchingEngine(
        nano_params, NANO, IdTok(), max_slots=2,
        compute_dtype=jnp.float32, max_tokens=6, apply_filters=False,
    ).start()
    try:
        # sabotage one admission round: break the prefill fn once
        real_encode = eng._encode_fn

        def boom(*a, **k):
            eng.__dict__["_encode_fn"] = real_encode  # restore for next round
            raise RuntimeError("injected failure")

        eng.__dict__["_encode_fn"] = boom
        f1 = eng.submit(Request(audio=_audio(rng, 0.3)))
        with pytest.raises(RuntimeError, match="injected"):
            f1.result(timeout=30)
        # engine still alive: next request succeeds
        res = eng.transcribe(_audio(rng, 0.3), timeout=60)
        assert res["success"]
    finally:
        eng.stop()


def test_engine_kv_quant_matches_fp(nano_params, rng):
    """int8 cross-KV engine produces (near-)identical transcripts; random
    near-uniform logits are the worst case, so just require the machinery to
    run and produce a full result; numeric closeness is covered at the
    attention level in test_quant."""
    eng = ContinuousBatchingEngine(
        nano_params, NANO, IdTok(), max_slots=2,
        compute_dtype=jnp.float32, max_tokens=8, apply_filters=False,
        kv_quant=True,
    ).start()
    try:
        res = eng.transcribe(_audio(rng, 0.5), timeout=60)
        assert res["success"]
        assert isinstance(res["text"], str)
    finally:
        eng.stop()


def test_engine_w8a8_quantized_params(nano_params, rng, monkeypatch):
    """The flagship quant mode end-to-end through the engine: int8 weights
    (QTensor leaves flow through the slot machinery, TP placement, jit) with
    dynamic-int8 encoder activations. Numeric closeness is covered at the
    op level (test_quant); here the serving path must run and resolve."""
    from whisper_tpu.ops.quant import quantize_params

    monkeypatch.setenv("WHISPER_TPU_W8A8", "1")
    eng = ContinuousBatchingEngine(
        quantize_params(nano_params), NANO, IdTok(), max_slots=2,
        compute_dtype=jnp.float32, max_tokens=8, apply_filters=False,
        kv_quant=True, self_kv_quant=True,
    ).start()
    try:
        res = eng.transcribe(_audio(rng, 0.5), timeout=60)
        assert res["success"]
        assert isinstance(res["text"], str)
    finally:
        eng.stop()


def test_engine_timestamps_mode(nano_params, rng):
    """Engine with timestamps=True: 3-token prompt, grammar-filtered decode."""
    eng = ContinuousBatchingEngine(
        nano_params, NANO, IdTok(), max_slots=2,
        compute_dtype=jnp.float32, max_tokens=8,
        apply_filters=True, timestamps=True,
    ).start()
    try:
        res = eng.transcribe(_audio(rng, 0.5), timeout=60)
        assert res["success"]
        ids = [int(s) for s in res["text"].split()] if res["text"] else []
        ts0 = NANO.timestamp_begin
        if ids:  # first sampled token is a timestamp under the grammar
            assert ids[0] >= ts0
    finally:
        eng.stop()


@pytest.mark.slow
def test_engine_tensor_parallel_matches_single(nano_params, rng):
    """TP-placed engine (weights + KV sharded over the model axis) must
    produce the same tokens as the unsharded engine."""
    from whisper_tpu.parallel.sharding import make_mesh

    wavs = [_audio(rng, 0.5), _audio(rng, 0.8), _audio(rng, 0.3)]

    def run(mesh):
        eng = ContinuousBatchingEngine(
            nano_params, NANO, IdTok(), max_slots=4,
            compute_dtype=jnp.float32, steps_per_sync=2, max_tokens=10,
            apply_filters=False, mesh=mesh,
        ).start()
        try:
            futs = [eng.submit(Request(audio=w, language="zh")) for w in wavs]
            return [f.result(timeout=120)["text"] for f in futs]
        finally:
            eng.stop()

    base = run(None)
    tp = run(make_mesh(1, 2))
    assert tp == base


def test_http_query_string_params(http_server, rng):
    """POST /asr?language=..&stream=.. — query strings must route (the path
    equality check used to 404 them) and override the language default."""
    import urllib.request

    pcm = _audio(rng, 0.4).tobytes()
    req = urllib.request.Request(
        f"{http_server}/asr?language=en", data=pcm,
        headers={"Content-Type": "application/octet-stream"})
    out = json.loads(urllib.request.urlopen(req, timeout=120).read())
    assert out["success"] and out["language"] == "en"


def test_engine_self_kv_quant_matches_offline(nano_params, rng):
    """Engine with the packed int8 self-KV cache must match the offline
    greedy decoder running with the same quantization."""
    eng = ContinuousBatchingEngine(
        nano_params, NANO, IdTok(), max_slots=2,
        compute_dtype=jnp.float32, steps_per_sync=2, max_tokens=10,
        apply_filters=False, self_kv_quant=True,
    ).start()
    try:
        wav = _audio(rng, 0.6)
        res = eng.transcribe(wav, language="zh", timeout=120)
    finally:
        eng.stop()
    got = [int(s) for s in res["text"].split()] if res["text"] else []

    audio = np.zeros((1, N_SAMPLES), np.float32)
    audio[0, : len(wav)] = wav
    mel = log_mel_batch(jnp.asarray(audio), jnp.asarray([len(wav)], np.int32),
                        n_mels=NANO.n_mels)[..., : 2 * NANO.n_audio_ctx]
    prompt = jnp.asarray([NANO.sot_sequence("zh", "transcribe")], jnp.int32)
    ref = greedy_decode(nano_params, mel, prompt, NANO, max_tokens=10,
                        self_kv_quant=True)
    ref_ids = np.asarray(ref.tokens)[0, 4: np.asarray(ref.lengths)[0]].tolist()
    assert got == ref_ids


# ---------------------------------------------------------------- hardening
def test_engine_fifo_fair_admission(nano_params, rng):
    """With one slot, queued requests must complete in submit order — the
    admission path may not rotate a waiting request behind later arrivals."""
    eng = ContinuousBatchingEngine(
        nano_params, NANO, IdTok(), max_slots=1, compute_dtype=jnp.float32,
        steps_per_sync=2, max_tokens=6, apply_filters=False).start()
    try:
        order = []
        lock = threading.Lock()
        futs = []
        for i in range(4):
            req = Request(audio=_audio(rng, 0.3), language="zh")
            req.future.add_done_callback(
                lambda f, i=i: (lock.acquire(), order.append(i), lock.release()))
            futs.append(eng.submit(req))
        for f in futs:
            f.result(timeout=120)
        assert order == [0, 1, 2, 3], f"admission not FIFO: {order}"
    finally:
        eng.stop()


def test_engine_deadline_expires_in_queue(nano_params, rng):
    """A request whose deadline passes while queued fails with TimeoutError
    and never occupies a slot."""
    eng = ContinuousBatchingEngine(
        nano_params, NANO, IdTok(), max_slots=1, compute_dtype=jnp.float32,
        steps_per_sync=2, max_tokens=12, apply_filters=False).start()
    try:
        # fill the only slot with a long decode
        long_req = Request(audio=_audio(rng, 1.0), language="zh")
        eng.submit(long_req)
        doomed = Request(audio=_audio(rng, 0.3), language="zh",
                         deadline_s=1e-4)  # already expired on admission
        f = eng.submit(doomed)
        with pytest.raises(TimeoutError):
            f.result(timeout=120)
        assert long_req.future.result(timeout=120)["success"]
    finally:
        eng.stop()


def test_engine_deadline_frees_slot_mid_decode(nano_params, rng):
    """An in-flight request past its deadline is failed and its slot returns
    to the pool (capacity is not leaked to dead clients)."""
    eng = ContinuousBatchingEngine(
        nano_params, NANO, IdTok(), max_slots=1, compute_dtype=jnp.float32,
        steps_per_sync=1, max_tokens=None, apply_filters=False).start()
    try:
        # nano ctx=24 decodes fast; use deadline 0 so the first expiry check
        # after admission trips it
        doomed = Request(audio=_audio(rng, 1.0), language="zh", deadline_s=0.0)
        f = eng.submit(doomed)
        with pytest.raises(TimeoutError):
            f.result(timeout=120)
        # slot must be reusable afterwards
        ok = eng.transcribe(_audio(rng, 0.3), language="zh", timeout=120)
        assert ok["success"]
    finally:
        eng.stop()


def test_engine_cancellation(nano_params, rng):
    """Cancelling a queued request drops it without wedging the engine."""
    eng = ContinuousBatchingEngine(
        nano_params, NANO, IdTok(), max_slots=1, compute_dtype=jnp.float32,
        steps_per_sync=2, max_tokens=12, apply_filters=False).start()
    try:
        first = Request(audio=_audio(rng, 1.0), language="zh")
        eng.submit(first)
        victim = Request(audio=_audio(rng, 0.3), language="zh")
        fv = eng.submit(victim)
        assert victim.cancel() or fv.done()
        after = Request(audio=_audio(rng, 0.3), language="zh")
        fa = eng.submit(after)
        assert first.future.result(timeout=120)["success"]
        assert fa.result(timeout=120)["success"]
        assert fv.cancelled() or fv.done()
    finally:
        eng.stop()


def test_engine_quality_fields_and_silence_gate(nano_params, rng):
    """Harvest computes no_speech_prob / avg_logprob / compression_ratio and
    applies the silence gate (longform.silence_mask semantics) in-engine —
    the reference carries the no_speech id but never uses it
    (model_convert/export_onnx.py:602-629)."""
    # threshold 0.0: any nsp > 0 counts as silence; logprob_threshold=None so
    # confidence can't override — the text must be gated to ""
    eng = ContinuousBatchingEngine(
        nano_params, NANO, IdTok(), max_slots=2, compute_dtype=jnp.float32,
        steps_per_sync=2, max_tokens=6, apply_filters=False,
        no_speech_threshold=0.0, logprob_threshold=None,
        compression_ratio_threshold=None).start()
    try:
        res = eng.transcribe(_audio(rng, 0.4), language="zh", timeout=60)
        assert res["text"] == ""
        assert res["no_speech_prob"] > 0.0
        assert "avg_logprob" in res and "compression_ratio" in res
        assert eng.stats.no_speech_total == 1
    finally:
        eng.stop()

    # gates off: same audio keeps its text; random-weight avg_logprob is very
    # low, so a logprob_threshold flags quality_ok=False without blanking
    eng = ContinuousBatchingEngine(
        nano_params, NANO, IdTok(), max_slots=2, compute_dtype=jnp.float32,
        steps_per_sync=2, max_tokens=6, apply_filters=False,
        no_speech_threshold=None, logprob_threshold=-0.0001).start()
    try:
        res = eng.transcribe(_audio(rng, 0.4), language="zh", timeout=60)
        assert res["avg_logprob"] < -0.0001
        assert res["quality_ok"] is False
        assert eng.stats.no_speech_total == 0
        assert eng.stats.low_quality_total == 1
    finally:
        eng.stop()


def test_word_timestamps_survive_temperature_retry(nano_params, rng):
    """A request re-decoded by the quality ladder resolves from the aux
    worker — which must run the align pass too, not silently drop the
    word timings (found by driving the live server with its default
    ladder, round 4)."""
    from whisper_tpu.tokenizer import get_tokenizer

    tok = get_tokenizer(True, language="en", task="transcribe")
    eng = ContinuousBatchingEngine(
        nano_params, NANO, tok, max_slots=2, compute_dtype=jnp.float32,
        steps_per_sync=2, max_tokens=6, apply_filters=False,
        no_speech_threshold=None, logprob_threshold=-0.0001,
        temperature_fallback=(0.2,)).start()
    try:
        res = eng.submit(Request(audio=_audio(rng, 0.5), language="en",
                                 word_timestamps=True)).result(timeout=180)
        assert res["attempts"] >= 2, res  # the ladder fired (random weights)
        assert isinstance(res.get("words"), list), res
    finally:
        eng.stop()


def test_adaptive_sync_round_sizing(nano_params):
    """Rounds grow to 2x/4x base while every active slot is far from its
    budget, shrink back as the nearest completion approaches, and fall
    back to base with no resolved offsets (r4: each sync round costs a
    tunnel RTT; fewer rounds while nobody can finish)."""
    import numpy as np

    eng = ContinuousBatchingEngine(
        nano_params, NANO, IdTok(), max_slots=4, compute_dtype=jnp.float32,
        steps_per_sync=2, max_tokens=8, apply_filters=False)
    # no resolve yet -> base
    assert eng._adaptive_steps() == 2
    eng._slot_req[0] = Request(audio=np.zeros(800, np.float32))
    eng._slot_req[2] = Request(audio=np.zeros(800, np.float32))
    eng._slot_limit_h[:] = 24
    eng._last_offs_h = np.array([5, 0, 5, 0])
    # min remaining = 19; minus in-flight base (2) = 17 >= 4*2 -> 4x
    assert eng._adaptive_steps() == 8
    eng._last_offs_h = np.array([17, 0, 5, 0])
    # slot 0 has 7 left; 7-2=5 >= 2*2 -> 2x
    assert eng._adaptive_steps() == 4
    eng._last_offs_h = np.array([21, 0, 5, 0])
    # slot 0 nearly done -> base
    assert eng._adaptive_steps() == 2
    # done-marked slots (-1) don't constrain the round
    eng._last_offs_h = np.array([-1, 0, 5, 0])
    assert eng._adaptive_steps() == 8
    # the in-flight round's ACTUAL dispatched size is discounted, not base:
    # after an 8-step round, a slot with 11 tokens left has ~3 remaining —
    # base, where discounting base (2) would wrongly size another 8-step
    # round and delay its completion (ADVICE r4 medium)
    eng._last_offs_h = np.array([13, 0, 5, 0])
    eng._last_round_steps = 8
    assert eng._adaptive_steps() == 2
    eng._last_round_steps = 2
    assert eng._adaptive_steps() == 8


def test_harvest_slot_reuse_no_cross_wiring(nano_params, rng):
    """ADVICE r4 (high): the pipelined harvest packs round N's buffer
    BEFORE resolving round N-1 — a slot harvested and re-admitted in the
    same tick leaves stale done=True + the OLD request's tokens in that
    packed buffer. The next tick's resolve must NOT deliver them to the
    NEW occupant (generation stamps). Driven tick-by-tick to force the
    exact same-tick reuse the threaded tests never hit."""
    from whisper_tpu.ops.mel import log_mel_batch as _lmb

    eng = ContinuousBatchingEngine(
        nano_params, NANO, IdTok(), max_slots=1, compute_dtype=jnp.float32,
        steps_per_sync=4, max_tokens=2, apply_filters=False,
        adaptive_sync=False)
    wav_a = _audio(rng, 0.5)
    wav_b = _audio(rng, 0.9)

    def offline_ids(wav):
        audio = np.zeros((1, N_SAMPLES), np.float32)
        audio[0, : len(wav)] = wav
        mel = _lmb(jnp.asarray(audio), jnp.asarray([len(wav)], np.int32),
                   n_mels=NANO.n_mels)[..., : 2 * NANO.n_audio_ctx]
        prompt = jnp.asarray([NANO.sot_sequence("zh", "transcribe")],
                             jnp.int32)
        ref = greedy_decode(nano_params, mel, prompt, NANO, max_tokens=2)
        return np.asarray(ref.tokens)[0, 4: np.asarray(ref.lengths)[0]].tolist()

    fa = eng.submit(Request(audio=wav_a, language="zh"))
    eng._prepare_pending_once()
    eng._tick()                      # admits A into slot 0
    assert eng.stats.active_slots == 1
    eng._tick()                      # round: A hits its 2-token limit (done)
    fb = eng.submit(Request(audio=wav_b, language="zh"))
    eng._prepare_pending_once()      # B encoded+prefilled, waiting for a slot
    eng._tick()                      # packs stale done=1, THEN resolves A,
    #                                  frees slot 0 and re-admits B into it
    assert fa.done()
    gen_after_readmit = int(eng._slot_gen[0])
    assert gen_after_readmit == 2    # A's admission + B's re-admission
    eng._tick()                      # resolves the stale pre-admit buffer:
    #                                  without generation stamps this
    #                                  delivered A's tokens to B's future
    assert not fb.done(), (
        "stale harvest buffer resolved the re-admitted slot's request")
    for _ in range(8):
        if fb.done():
            break
        eng._tick()
    ra, rb = fa.result(0), fb.result(0)
    ids_a = [int(s) for s in ra["text"].split()] if ra["text"] else []
    ids_b = [int(s) for s in rb["text"].split()] if rb["text"] else []
    assert ids_a == offline_ids(wav_a)
    assert ids_b == offline_ids(wav_b)
    assert rb["audio_seconds"] == pytest.approx(0.9)


def _offline_ids(nano_params, wav, max_tokens):
    audio = np.zeros((1, N_SAMPLES), np.float32)
    audio[0, : len(wav)] = wav
    mel = log_mel_batch(jnp.asarray(audio), jnp.asarray([len(wav)], np.int32),
                        n_mels=NANO.n_mels)[..., : 2 * NANO.n_audio_ctx]
    prompt = jnp.asarray([NANO.sot_sequence("zh", "transcribe")], jnp.int32)
    ref = greedy_decode(nano_params, mel, prompt, NANO, max_tokens=max_tokens)
    return np.asarray(ref.tokens)[0, 4: np.asarray(ref.lengths)[0]].tolist()


def test_warmup_preserves_state_and_results(nano_params, rng):
    """warmup() compiles the step at every adaptive size, the pack, and
    encode/prefill/admit per bucket against the REAL slot state — with no
    active slots every update is masked, so a post-warm decode must match
    the offline greedy path exactly (round 5: workers execute-only)."""
    eng = ContinuousBatchingEngine(
        nano_params, NANO, IdTok(), max_slots=2, compute_dtype=jnp.float32,
        steps_per_sync=2, max_tokens=8, apply_filters=False,
        adaptive_sync=True,  # warm all three step variants
        warm_start=True).start()
    try:
        assert eng.stats.warmup_seconds > 0
        # every decode/admission-path program is warm (context width 0,
        # prompt P0 = the sot-sequence length)
        P0 = len(NANO.sot_sequence("zh", "transcribe"))
        for key in [("step", 2), ("step", 4), ("step", 8), ("pack",),
                    ("prepare", 1, 0), ("prepare", 2, 0),
                    ("admit", 1, P0), ("admit", 2, P0)]:
            assert key in eng._warm_keys, key
        wav = _audio(rng, 0.6)
        res = eng.transcribe(wav, language="zh", timeout=60)
        got = [int(s) for s in res["text"].split()] if res["text"] else []
        assert got == _offline_ids(nano_params, wav, 8)
    finally:
        eng.stop()


def test_threaded_engine_under_tp_stress(nano_params, rng):
    """VERDICT r4 #1: the threaded engine over SPMD-partitioned state —
    the cell a real multi-chip deployment runs. TP=2 mesh on the CPU
    backend, warm start (workers execute-only), concurrent submits from
    several threads including beam + word-timestamp requests; every
    result must match the single-request decode of the same audio."""
    from whisper_tpu.parallel.sharding import make_mesh

    mesh = make_mesh(1, 2)  # TP=2 over two of the 8 virtual CPU devices
    eng = ContinuousBatchingEngine(
        nano_params, NANO, IdTok(), max_slots=4, compute_dtype=jnp.float32,
        steps_per_sync=2, max_tokens=8, apply_filters=False,
        kv_quant=True, self_kv_quant=True, mesh=mesh,
        warm_start=True).start()
    try:
        wavs = [_audio(rng, 0.3 + 0.1 * i) for i in range(10)]
        futs = [None] * len(wavs)

        def submit_some(idxs):
            for i in idxs:
                futs[i] = eng.submit(Request(audio=wavs[i], language="zh",
                                             beam_size=2 if i == 9 else 1))

        threads = [threading.Thread(target=submit_some,
                                    args=(range(j, len(wavs), 3),))
                   for j in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        results = [f.result(timeout=300) for f in futs]
        assert all(r["success"] for r in results)
        # per-request correctness under concurrency: each greedy result
        # equals a fresh solo decode of the same audio through the engine
        for i in (0, 4, 7):
            solo = eng.transcribe(wavs[i], language="zh", timeout=120)
            assert results[i]["text"] == solo["text"], i
    finally:
        eng.stop()


def test_segmented_encode_matches_monolithic(nano_params, rng):
    """encode_chunks > 1 splits the admission encoder into layer-group
    programs (decode rounds interleave with admission encodes on one
    chip, VERDICT r4 #2) — the segmented math must equal the monolithic
    program exactly."""
    eng = ContinuousBatchingEngine(
        nano_params, NANO, IdTok(), max_slots=2, compute_dtype=jnp.float32,
        steps_per_sync=2, max_tokens=8, apply_filters=False,
        encode_chunks=2)
    assert len(eng._encode_seg_fns) == 3  # front + 1 middle + tail
    wav = _audio(rng, 0.6)
    fa = eng.submit(Request(audio=wav, language="zh"))
    eng._prepare_pending_once()
    for _ in range(12):
        if fa.done():
            break
        eng._tick()
    got = fa.result(0)
    ids = [int(s) for s in got["text"].split()] if got["text"] else []
    assert ids == _offline_ids(nano_params, wav, 8)


def test_align_worker_micro_batches(nano_params, rng):
    """VERDICT r4 #4: queued word-timestamp jobs coalesce into ONE bucketed
    (B, S) alignment pass, and batched words match a solo pass bit-for-bit
    (deterministic decode => identical sequences)."""
    import threading as _th

    from whisper_tpu.tokenizer import get_tokenizer

    tok = get_tokenizer(True, language="en", task="transcribe")
    eng = ContinuousBatchingEngine(
        nano_params, NANO, tok, max_slots=4, compute_dtype=jnp.float32,
        steps_per_sync=2, max_tokens=6, apply_filters=False,
        no_speech_threshold=None, logprob_threshold=None,
        compression_ratio_threshold=None).start()
    try:
        # hold the align worker back so all jobs queue up first
        eng._align_thread = _th.Thread(target=lambda: None)  # placeholder
        wavs = [_audio(rng, 0.4 + 0.1 * i) for i in range(3)]
        futs = [eng.submit(Request(audio=w, language="en",
                                   word_timestamps=True)) for w in wavs]
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline and len(eng._align_q) < 3:
            time.sleep(0.01)
        assert len(eng._align_q) == 3, "align jobs never queued"
        worker = _th.Thread(target=eng._align_run, daemon=True)
        eng._align_thread = worker
        worker.start()
        results = [f.result(timeout=60) for f in futs]
        assert all(isinstance(r.get("words"), list) for r in results)
        assert eng.stats.align_total == 3
        assert eng.stats.align_batches_total == 1  # ONE bucketed pass
        # batched == solo: resubmit the first request alone
        solo = eng.submit(Request(audio=wavs[0], language="en",
                                  word_timestamps=True)).result(timeout=60)
        assert solo["text"] == results[0]["text"]
        assert solo["words"] == results[0]["words"]
    finally:
        eng.stop()


def test_engine_initial_prompt_matches_pipeline(rng):
    """VERDICT r4 #5: a served initial_prompt must (a) change the decoded
    prefix and (b) match the offline pipeline's decode with the same
    prompt — the serving tier must not trail the pipeline's quality
    features. The engine rides the same left-pad convention, so tokens
    agree exactly."""
    from whisper_tpu.pipeline import WhisperPipeline
    from whisper_tpu.serving.engine import ContinuousBatchingEngine

    pipe = WhisperPipeline(model="test-nano", language="zh",
                           compute_dtype="float32", apply_filters=False,
                           max_tokens=8, no_speech_threshold=2.0,
                           logprob_threshold=-1e9,
                           initial_prompt="hello world")
    eng = ContinuousBatchingEngine(
        pipe.params, pipe.cfg, pipe.tokenizer, max_slots=2,
        compute_dtype=jnp.float32, steps_per_sync=2, max_tokens=8,
        apply_filters=False, no_speech_threshold=None,
        logprob_threshold=None, compression_ratio_threshold=None).start()
    try:
        wav = _audio(rng, 0.6)
        plain = eng.transcribe(wav, language="zh", timeout=60)
        primed = eng.submit(Request(audio=wav, language="zh",
                                    initial_prompt="hello world")
                            ).result(timeout=60)
        # conditioning entered the program: decoded prefix differs (random
        # weights make logit shifts essentially certain to flip argmax)
        assert primed["text"] != plain["text"]
        ref = pipe.transcribe(wav, language="zh")
        assert primed["text"] == ref.text
    finally:
        eng.stop()


def test_beam_path_initial_prompt(rng):
    """The aux (beam) worker builds the same [sot_prev, ctx] left-pad
    prompts: a primed beam request must change the decode and keep its
    prompt across the path (grouping by context width)."""
    from whisper_tpu.pipeline import WhisperPipeline
    from whisper_tpu.serving.engine import ContinuousBatchingEngine

    pipe = WhisperPipeline(model="test-nano", language="zh",
                           compute_dtype="float32", apply_filters=False,
                           max_tokens=8, no_speech_threshold=2.0,
                           logprob_threshold=-1e9)
    eng = ContinuousBatchingEngine(
        pipe.params, pipe.cfg, pipe.tokenizer, max_slots=2,
        compute_dtype=jnp.float32, steps_per_sync=2, max_tokens=8,
        apply_filters=False, no_speech_threshold=None,
        logprob_threshold=None, compression_ratio_threshold=None).start()
    try:
        wav = _audio(rng, 0.5)
        plain = eng.submit(Request(audio=wav, language="zh",
                                   beam_size=2)).result(timeout=60)
        primed = eng.submit(Request(audio=wav, language="zh", beam_size=2,
                                    initial_prompt="hello world")
                            ).result(timeout=60)
        assert plain["success"] and primed["success"]
        assert primed["beam_size"] == 2
        assert primed["text"] != plain["text"]
        # greedy-slot decode with the same prompt agrees on the conditioning
        # (different search, same program family — just assert both ran and
        # the primed beam is deterministic)
        again = eng.submit(Request(audio=wav, language="zh", beam_size=2,
                                   initial_prompt="hello world")
                           ).result(timeout=60)
        assert again["text"] == primed["text"]
    finally:
        eng.stop()


def test_engine_conditioned_longform_sequential(nano_params, rng):
    """condition_on_previous chains >30 s windows sequentially, each
    seeded with the accumulated transcript (longform.py:258-271 at the
    serving tier)."""
    from whisper_tpu.tokenizer import get_tokenizer

    tok = get_tokenizer(True, language="zh", task="transcribe")
    eng = ContinuousBatchingEngine(
        nano_params, NANO, tok, max_slots=2, compute_dtype=jnp.float32,
        steps_per_sync=2, max_tokens=6, apply_filters=False).start()
    try:
        prompts_seen = []
        orig = eng._prepare_batch

        def spy(newcomers, *a, **k):
            prompts_seen.extend(r.initial_prompt for r in newcomers)
            return orig(newcomers, *a, **k)

        eng._prepare_batch = spy
        wav = _audio(rng, 75.0)  # 3 windows
        res = eng.submit(Request(audio=wav, language="zh",
                                 condition_on_previous=True,
                                 initial_prompt="seed words")
                         ).result(timeout=300)
        assert res["success"] and res["windows"] == 3
        assert res.get("conditioned") is True
        assert len(prompts_seen) == 3
        assert prompts_seen[0] == "seed words"
        # each later window is conditioned on the accumulated transcript
        assert prompts_seen[1] and prompts_seen[1].startswith("seed words")
        assert prompts_seen[2] and len(prompts_seen[2]) >= len(
            prompts_seen[1])
    finally:
        eng.stop()


@pytest.mark.slow
def test_http_conditioned_longform(nano_params, rng):
    """condition_on_previous over the wire: a >30 s octet-stream request
    with X-Condition-On-Previous decodes sequentially through the engine's
    conditioned path (response carries conditioned: true)."""
    from whisper_tpu.tokenizer import get_tokenizer

    tok = get_tokenizer(True, language="zh", task="transcribe")
    eng = ContinuousBatchingEngine(
        nano_params, NANO, tok, max_slots=2, compute_dtype=jnp.float32,
        steps_per_sync=2, max_tokens=6, apply_filters=False).start()
    srv = make_server(eng, "127.0.0.1", 0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    port = srv.server_address[1]
    try:
        wav = _audio(rng, 70.0)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/asr?language=zh"
            f"&condition_on_previous=1&initial_prompt=seed",
            data=wav.tobytes(),
            headers={"Content-Type": "application/octet-stream"})
        res = json.loads(urllib.request.urlopen(req, timeout=300).read())
        assert res["success"] and res["windows"] == 3
        assert res.get("conditioned") is True
    finally:
        srv.shutdown()
        eng.stop()


def test_http_initial_prompt(nano_params, rng):
    """initial_prompt over the wire (query param + multipart field) reaches
    the engine and changes the decode."""
    from whisper_tpu.tokenizer import get_tokenizer

    tok = get_tokenizer(True, language="zh", task="transcribe")
    eng = ContinuousBatchingEngine(
        nano_params, NANO, tok, max_slots=2, compute_dtype=jnp.float32,
        steps_per_sync=2, max_tokens=8, apply_filters=False,
        no_speech_threshold=None, logprob_threshold=None,
        compression_ratio_threshold=None).start()
    srv = make_server(eng, "127.0.0.1", 0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    port = srv.server_address[1]
    try:
        wav = _audio(rng, 0.5)
        body = wav.tobytes()

        def post(path):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}", data=body,
                headers={"Content-Type": "application/octet-stream"})
            return json.loads(urllib.request.urlopen(req, timeout=120).read())

        plain = post("/asr?language=zh")
        primed = post("/asr?language=zh&initial_prompt=hello%20world")
        assert plain["success"] and primed["success"]
        assert primed["text"] != plain["text"]
        # engine-level reference with the same prompt
        ref = eng.submit(Request(audio=wav, language="zh",
                                 initial_prompt="hello world")
                         ).result(timeout=60)
        assert primed["text"] == ref["text"]
    finally:
        srv.shutdown()
        eng.stop()


def test_engine_admission_chunking(nano_params, rng):
    """With active slots, the encode worker prepares at most admit_chunk
    newcomers per batch (bounding the device-level stall one admission
    encode causes); an idle engine encodes the full pending set in one
    bucketed batch."""
    eng = ContinuousBatchingEngine(
        nano_params, NANO, IdTok(), max_slots=4, compute_dtype=jnp.float32,
        steps_per_sync=1, max_tokens=6, apply_filters=False, admit_chunk=1)
    # not started: drive the encode/admit path by hand for determinism
    batches = []
    orig = eng._prepare_batch

    def spy(newcomers):
        batches.append(len(newcomers))
        return orig(newcomers)

    eng._prepare_batch = spy
    # idle: 3 submissions prepare as ONE batch
    for _ in range(3):
        eng.submit(Request(audio=_audio(rng, 0.2), language="zh"))
    eng._prepare_pending_once()
    eng._admit_new()
    assert batches == [3]
    assert eng.stats.active_slots == 3
    # active slots present: the 4th prepares alone (chunk=1)
    eng.submit(Request(audio=_audio(rng, 0.2), language="zh"))
    eng._prepare_pending_once()
    eng._admit_new()
    assert batches == [3, 1]
    assert eng.stats.active_slots == 4


def test_decode_advances_during_newcomer_encode(nano_params, rng):
    """Round-4 design goal: admission encode+prefill runs on the encode
    worker thread, so ACTIVE slots keep stepping WHILE a newcomer encodes —
    not just between admissions (VERDICT r3 #1)."""
    import threading as _th
    import time as _time

    eng = ContinuousBatchingEngine(
        nano_params, NANO, IdTok(), max_slots=2, compute_dtype=jnp.float32,
        steps_per_sync=1, max_tokens=16, apply_filters=False,
        adaptive_sync=False)  # fixed round size: no mid-test jit compiles
    in_encode = _th.Event()
    release = _th.Event()
    calls = []
    orig = eng._prepare_batch

    def slow(newcomers):
        calls.append(len(newcomers))
        if len(calls) > 1:  # the newcomer's batch: stall mid-encode
            in_encode.set()
            release.wait(timeout=10)
        return orig(newcomers)

    eng._prepare_batch = slow
    eng.start()
    try:
        import jax as _jax

        a = eng.submit(Request(audio=_audio(rng, 0.5), language="zh"))
        # steady state first: wait for A to be admitted AND for the decode
        # step program to be compiled + stepping (offset past prompt+2)
        deadline = _time.monotonic() + 60
        slot = None
        while _time.monotonic() < deadline:
            if slot is None and eng.stats.active_slots:
                slot = next(i for i, r in enumerate(eng._slot_req)
                            if r is not None)
            if (slot is not None
                    and int(_jax.device_get(eng.offsets)[slot]) >= 7):
                break
            _time.sleep(0.01)
        assert slot is not None and not a.done()
        b = eng.submit(Request(audio=_audio(rng, 0.5), language="zh"))
        assert in_encode.wait(timeout=30), "newcomer encode never started"
        off0 = int(_jax.device_get(eng.offsets)[slot])
        _time.sleep(0.4)  # encode worker still stalled inside prepare
        off1 = int(_jax.device_get(eng.offsets)[slot])
        release.set()
        # slot A stepped while B's encode was in flight (or had already
        # finished its budget — require progress OR completion)
        assert off1 > off0 or a.done(), (off0, off1)
        assert a.result(timeout=60)["success"]
        assert b.result(timeout=60)["success"]
    finally:
        release.set()
        eng.stop()


def test_engine_auto_language_immutable_request(nano_params, rng):
    """Detection must not mutate Request.language (a retried request keeps
    'auto'); the resolved code is exposed via the result dict."""
    eng = ContinuousBatchingEngine(
        nano_params, NANO, IdTok(), max_slots=2, compute_dtype=jnp.float32,
        steps_per_sync=2, max_tokens=6, apply_filters=False).start()
    try:
        req = Request(audio=_audio(rng, 0.5), language="auto")
        res = eng.submit(req).result(timeout=60)
        from whisper_tpu.tokenizer import LANGUAGES

        assert req.language == "auto"
        assert res["language"] in LANGUAGES
        assert req.language_resolved == res["language"]
    finally:
        eng.stop()


def test_engine_longform_split_and_merge(nano_params, rng):
    """A >30 s request is split into overlapping windows at submit and the
    parent future resolves with the merged transcript — the reference
    silently truncates at 30 s instead (python/whisper.py:148-152)."""
    from whisper_tpu.longform import merge_texts, split_audio

    eng = ContinuousBatchingEngine(
        nano_params, NANO, IdTok(), max_slots=4, compute_dtype=jnp.float32,
        steps_per_sync=2, max_tokens=8, apply_filters=False,
        longform_overlap_s=2.0).start()
    try:
        wav = _audio(rng, 75.0)  # 3 windows at 28 s step
        res = eng.transcribe(wav, language="zh", timeout=300)
        assert res["success"]
        assert res["windows"] == 3
        assert res["audio_seconds"] == pytest.approx(75.0)

        # the merged text must equal merging the per-window results
        waves, _ = split_audio(wav, N_SAMPLES, eng.longform_overlap)
        parts = [eng.transcribe(w, language="zh", timeout=120)["text"]
                 for w in waves]
        assert res["text"] == merge_texts(parts, "zh")
    finally:
        eng.stop()


def test_http_asr_long_audio(http_server, rng):
    """HTTP POST of a >30 s clip returns the full (non-truncated) result."""
    url = http_server
    wav = _audio(rng, 65.0)
    req = urllib.request.Request(
        f"{url}/asr", data=wav.tobytes(),
        headers={"Content-Type": "application/octet-stream"})
    res = json.loads(urllib.request.urlopen(req, timeout=300).read())
    assert res["success"]
    assert res["audio_seconds"] == pytest.approx(65.0)
    assert res["windows"] == 3


# ---------------------------------------------------------------- beam serving

def test_engine_beam_matches_offline(engine, nano_params, rng):
    """A beam_size=K request is served by the beam worker and must match the
    offline beam_search bit-for-bit (same params, same rules). The reference
    is greedy-only (python/whisper.py:235)."""
    from whisper_tpu.beam import beam_search

    wav = _audio(rng, 0.8)
    res = engine.transcribe_beam(wav, language="zh", beam_size=3, timeout=120)
    assert res["success"]
    assert res["beam_size"] == 3
    got_ids = [int(s) for s in res["text"].split()] if res["text"] else []

    audio = np.zeros((1, N_SAMPLES), np.float32)
    audio[0, : len(wav)] = wav
    mel = log_mel_batch(jnp.asarray(audio), jnp.asarray([len(wav)], np.int32),
                        n_mels=NANO.n_mels)[..., : 2 * NANO.n_audio_ctx]
    prompt = jnp.asarray([NANO.sot_sequence("zh", "transcribe")], jnp.int32)
    ref = beam_search(nano_params, mel, prompt, NANO, beam_size=3,
                      compute_dtype=jnp.float32, max_tokens=12,
                      apply_filters=False)
    ref_ids = np.asarray(ref.tokens)[0, 4: np.asarray(ref.lengths)[0]].tolist()
    assert got_ids == ref_ids
    assert res["avg_logprob"] == pytest.approx(float(ref.avg_logprob[0]), abs=1e-4)


@pytest.mark.slow
def test_engine_mixed_greedy_beam_traffic(engine, rng):
    """Greedy slots and the beam worker serve concurrently; neither path
    blocks the other and each result is labeled."""
    futs = []
    for i in range(3):
        futs.append(engine.submit(Request(audio=_audio(rng, 0.4 + 0.1 * i),
                                          language="zh")))
        futs.append(engine.submit(Request(audio=_audio(rng, 0.5 + 0.1 * i),
                                          language="zh", beam_size=2)))
    results = [f.result(timeout=180) for f in futs]
    assert all(r["success"] for r in results)
    beam_results = [r for r in results if r.get("beam_size", 1) > 1]
    assert len(beam_results) == 3
    assert engine.stats.beam_requests_total >= 3
    assert engine.stats.requests_total >= 6


def test_engine_beam_size_cap(engine, rng):
    with pytest.raises(ValueError, match="beam_size"):
        engine.submit(Request(audio=_audio(rng, 0.3), beam_size=99))


def test_http_asr_beam(http_server, rng):
    """HTTP beam=K parameter routes to the beam worker (query string on the
    octet-stream protocol; out-of-range K is a 400)."""
    wav = _audio(rng, 0.6)
    req = urllib.request.Request(
        f"{http_server}/asr?language=zh&beam=3", data=wav.tobytes(),
        headers={"Content-Type": "application/octet-stream"})
    res = json.loads(urllib.request.urlopen(req, timeout=120).read())
    assert res["success"]
    assert res["beam_size"] == 3
    assert "avg_logprob" in res

    bad = urllib.request.Request(
        f"{http_server}/asr?beam=99", data=wav.tobytes(),
        headers={"Content-Type": "application/octet-stream"})
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(bad, timeout=30)
    assert ei.value.code == 400


def test_engine_beam_longform(nano_params, rng):
    """>30 s + beam_size: windows inherit the beam size and the parent
    future resolves with the merged beam transcripts."""
    eng = ContinuousBatchingEngine(
        nano_params, NANO, IdTok(), max_slots=4, compute_dtype=jnp.float32,
        steps_per_sync=2, max_tokens=8, apply_filters=False,
        longform_overlap_s=2.0).start()
    try:
        wav = _audio(rng, 65.0)
        fut = eng.submit(Request(audio=wav, language="zh", beam_size=2))
        res = fut.result(timeout=300)
        assert res["success"]
        assert res["windows"] == 3
        assert eng.stats.beam_requests_total == 3
    finally:
        eng.stop()


def test_engine_per_request_max_tokens(engine, rng):
    """Ragged per-request token budgets: a request's max_tokens caps its own
    generation without affecting the batch (the slot limit row is per-slot)."""
    wav = _audio(rng, 0.5)
    short = engine.submit(Request(audio=wav, language="zh", max_tokens=3))
    full = engine.submit(Request(audio=wav, language="zh"))
    r_short, r_full = short.result(timeout=60), full.result(timeout=60)
    n_short = len(r_short["text"].split()) if r_short["text"] else 0
    n_full = len(r_full["text"].split()) if r_full["text"] else 0
    assert n_short <= 3
    # same audio, engine cap 12: the un-budgeted request may run longer
    assert n_full >= n_short


def test_engine_active_slots_advance_during_admission_burst(nano_params, rng):
    """VERDICT r2 #4 'done' criterion: while a multi-request admission burst
    drains chunk-by-chunk, already-active slots keep generating tokens every
    sync round — the step-count delta during the burst is > 0 per round."""
    eng = ContinuousBatchingEngine(
        nano_params, NANO, IdTok(), max_slots=8, compute_dtype=jnp.float32,
        steps_per_sync=1, max_tokens=16, apply_filters=False, admit_chunk=1)
    # not started: drive sync rounds by hand for determinism
    eng.submit(Request(audio=_audio(rng, 0.8), language="zh"))
    eng._tick()  # admits the first request; its slot is now active
    slot0 = next(i for i, r in enumerate(eng._slot_req) if r is not None)

    for _ in range(4):  # an admission burst larger than admit_chunk
        eng.submit(Request(audio=_audio(rng, 0.3), language="zh"))

    offsets_seen = [int(np.asarray(eng.offsets)[slot0])]
    admitted = [eng.stats.active_slots]
    for _ in range(4):
        eng._tick()
        offsets_seen.append(int(np.asarray(eng.offsets)[slot0]))
        admitted.append(sum(r is not None for r in eng._slot_req))
    # the burst drained one chunk per round...
    assert admitted[:4] == [1, 2, 3, 4]
    # ...and slot0 advanced on EVERY round of the burst (no head-of-line
    # stall across the admission sequence)
    deltas = [b - a for a, b in zip(offsets_seen, offsets_seen[1:])]
    assert all(d > 0 for d in deltas), (offsets_seen, admitted)


# ---------------------------------------------------- temperature / quality ladder

def test_engine_sampled_request(engine, rng):
    """temperature > 0 routes to the aux worker's categorical-sampling
    decode; t=0 stays on the greedy slots."""
    wav = _audio(rng, 0.5)
    res = engine.transcribe(wav, language="zh", timeout=120)
    res_t = engine.submit(Request(audio=wav, language="zh",
                                  temperature=0.8)).result(timeout=120)
    assert res_t["success"]
    assert res_t["temperature"] == 0.8
    assert res.get("temperature", 0.0) == 0.0
    with pytest.raises(ValueError, match="temperature"):
        engine.submit(Request(audio=wav, temperature=3.0))


def test_engine_temperature_ladder_retries(nano_params, rng):
    """OpenAI retry semantics at the serving level: a result failing the
    logprob criterion re-decodes through the ladder; when the ladder is
    exhausted the last attempt resolves, flagged low-quality."""
    eng = ContinuousBatchingEngine(
        nano_params, NANO, IdTok(), max_slots=4, compute_dtype=jnp.float32,
        steps_per_sync=2, max_tokens=8, apply_filters=False,
        logprob_threshold=100.0,          # impossible: every decode "fails"
        no_speech_threshold=None,         # keep the silence gate out of it
        compression_ratio_threshold=None,
        temperature_fallback=(0.5, 1.0)).start()
    try:
        res = eng.transcribe(_audio(rng, 0.5), language="zh", timeout=180)
        assert res["success"]
        assert res["quality_ok"] is False          # ladder exhausted
        assert res["temperature"] == 1.0           # last rung
        assert res["attempts"] == 3                # greedy + 2 retries
        assert eng.stats.retries_total == 2
        assert eng.stats.requests_total == 1       # counted once
    finally:
        eng.stop()


def test_engine_ladder_skips_silence(nano_params, rng):
    """Silence-gated results are skipped, not retried (OpenAI semantics)."""
    eng = ContinuousBatchingEngine(
        nano_params, NANO, IdTok(), max_slots=4, compute_dtype=jnp.float32,
        steps_per_sync=2, max_tokens=8, apply_filters=False,
        no_speech_threshold=-1.0,         # everything counts as silence
        logprob_threshold=100.0,          # and fails the logprob criterion
        compression_ratio_threshold=None,
        temperature_fallback=(0.5, 1.0)).start()
    try:
        res = eng.transcribe(_audio(rng, 0.4), language="zh", timeout=120)
        assert res["success"]
        assert res["text"] == ""                   # silenced
        assert eng.stats.retries_total == 0        # never retried
        assert res["attempts"] == 1
    finally:
        eng.stop()


def test_http_temperature_param(http_server, rng):
    wav = _audio(rng, 0.4)
    req = urllib.request.Request(
        f"{http_server}/asr?language=zh&temperature=0.7", data=wav.tobytes(),
        headers={"Content-Type": "application/octet-stream"})
    res = json.loads(urllib.request.urlopen(req, timeout=120).read())
    assert res["success"] and res["temperature"] == 0.7
    bad = urllib.request.Request(
        f"{http_server}/asr?temperature=9", data=wav.tobytes(),
        headers={"Content-Type": "application/octet-stream"})
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(bad, timeout=30)
    assert ei.value.code == 400


# -------------------------------------------------------- word timestamps
@pytest.fixture(scope="module")
def engine_wt(nano_params):
    """Engine with the REAL tokenizer (word splitting needs it)."""
    from whisper_tpu.tokenizer import get_tokenizer

    tok = get_tokenizer(True, language="en", task="transcribe")
    eng = ContinuousBatchingEngine(
        nano_params, NANO, tok,
        max_slots=4,
        compute_dtype=jnp.float32,
        steps_per_sync=2,
        max_tokens=10,
        apply_filters=False,
    ).start()
    yield eng
    eng.stop()


def test_engine_word_timestamps(engine_wt, rng):
    req = Request(audio=_audio(rng), language="en", word_timestamps=True)
    res = engine_wt.submit(req).result(timeout=120)
    assert res["success"]
    assert engine_wt.stats.snapshot()["align_total"] >= 1
    assert isinstance(res["words"], list)
    for w in res["words"]:
        assert 0.0 <= w["start"] <= w["end"]
        assert "probability" in w
    starts = [w["start"] for w in res["words"]]
    assert starts == sorted(starts)


def test_engine_word_timestamps_longform(engine_wt, rng):
    """>30 s request: window-local word times come back absolute."""
    req = Request(audio=_audio(rng, seconds=40), language="en",
                  word_timestamps=True)
    res = engine_wt.submit(req).result(timeout=300)
    assert res["success"] and res["windows"] == 2
    assert isinstance(res["words"], list)
    starts = [w["start"] for w in res["words"]]
    assert starts == sorted(starts)
    # second window's surviving words sit past the overlap boundary
    if any(s > 30 for s in starts):
        assert max(starts) <= res["audio_seconds"] + 1.0


def test_http_word_timestamps_param(engine_wt, rng):
    srv = make_server(engine_wt, "127.0.0.1", 0, request_timeout_s=120)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        wav = _audio(rng, 0.4)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/asr?language=en&word_timestamps=1",
            data=wav.tobytes(),
            headers={"Content-Type": "application/octet-stream"})
        res = json.loads(urllib.request.urlopen(req, timeout=120).read())
        assert res["success"] and isinstance(res["words"], list)
        # without the flag, no words key
        req2 = urllib.request.Request(
            f"http://127.0.0.1:{port}/asr?language=en", data=wav.tobytes(),
            headers={"Content-Type": "application/octet-stream"})
        res2 = json.loads(urllib.request.urlopen(req2, timeout=120).read())
        assert res2["success"] and "words" not in res2
    finally:
        srv.shutdown()


def test_engine_word_timestamps_int8_cross(nano_params, rng):
    """kv_quant engine: the align worker dequantizes the slot's int8
    cross-KV slice (align.dequantize_cross_kv) before the alignment pass."""
    from whisper_tpu.tokenizer import get_tokenizer

    tok = get_tokenizer(True, language="en", task="transcribe")
    eng = ContinuousBatchingEngine(
        nano_params, NANO, tok, max_slots=2, compute_dtype=jnp.float32,
        steps_per_sync=2, max_tokens=8, apply_filters=False,
        kv_quant=True).start()
    try:
        req = Request(audio=_audio(rng), language="en", word_timestamps=True)
        res = eng.submit(req).result(timeout=120)
        assert res["success"]
        assert isinstance(res["words"], list)
        assert "align_error" not in res
        starts = [w["start"] for w in res["words"]]
        assert starts == sorted(starts)
    finally:
        eng.stop()


def test_http_streaming_word_timestamps(engine_wt, rng):
    """X-Stream + word_timestamps: final NDJSON line carries words."""
    srv = make_server(engine_wt, "127.0.0.1", 0, request_timeout_s=120)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        wav = _audio(rng, 0.3)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/asr?language=en&stream=1"
            "&word_timestamps=1",
            data=wav.tobytes(),
            headers={"Content-Type": "application/octet-stream"})
        with urllib.request.urlopen(req, timeout=120) as r:
            lines = [json.loads(ln) for ln in r.read().decode().splitlines()
                     if ln]
        final = lines[-1]
        assert final["success"] and isinstance(final["words"], list)
    finally:
        srv.shutdown()


def test_partial_scatter_stays_warm_and_correct(nano_params, rng):
    """A partial scatter (prepared batch wider than the free slots) must
    reuse the admit program warmup() compiled — the scatter width is the
    PREPARE bucket, not a smaller bucket of the row count, which would
    mint a new (scatter, source) shape signature and compile lock-free on
    the decode thread (execute-only invariant). Also an end-to-end check
    that rows consumed across several ticks land on the right callers."""
    eng = ContinuousBatchingEngine(
        nano_params, NANO, IdTok(), max_slots=4, compute_dtype=jnp.float32,
        steps_per_sync=2, max_tokens=12, apply_filters=False,
        admit_chunk=4, prefill_buckets=(1, 2, 4))
    eng.warmup()
    # occupy 2 slots with long decodes (driven manually — no threads)
    long_wavs = [_audio(rng, 0.4 + 0.2 * i) for i in range(2)]
    long_futs = [eng.submit(Request(audio=w, language="zh", max_tokens=12))
                 for w in long_wavs]
    eng._prepare_pending_once()
    eng._tick()
    assert eng.stats.active_slots == 2
    # now a 4-wide batch against only 2 free slots -> partial scatter
    short_wavs = [_audio(rng, 0.3 + 0.1 * i) for i in range(4)]
    short_futs = [eng.submit(Request(audio=w, language="zh", max_tokens=4))
                  for w in short_wavs]
    cold0 = eng.stats.cold_compiles_total
    for _ in range(60):
        if all(f.done() for f in long_futs + short_futs):
            break
        eng._tick()
    results = [f.result(timeout=0) for f in long_futs + short_futs]
    assert all(r["success"] for r in results)
    assert eng.stats.cold_compiles_total == cold0, (
        "partial scatter compiled a new program after warmup()")
    # right tokens to the right caller through the multi-tick consume
    for w, r, budget in zip(long_wavs + short_wavs, results, [12, 12, 4, 4, 4, 4]):
        ids = [int(s) for s in r["text"].split()] if r["text"] else []
        assert ids == _offline_ids(nano_params, w, budget), r


def test_align_worker_survives_batch_exception(nano_params, rng):
    """The align worker thread must outlive an exception escaping
    _align_batch (e.g. the set_result/cancel race): the batch fails soft
    with align_error, and the NEXT word-timestamp request is still
    served — the r4 ThreadPoolExecutor isolated per-job exceptions and
    the r5 micro-batch loop must not regress that."""
    from concurrent.futures import InvalidStateError

    from whisper_tpu.tokenizer import get_tokenizer

    tok = get_tokenizer(True, language="en", task="transcribe")
    eng = ContinuousBatchingEngine(
        nano_params, NANO, tok, max_slots=2, compute_dtype=jnp.float32,
        steps_per_sync=2, max_tokens=6, apply_filters=False,
        no_speech_threshold=None, logprob_threshold=None,
        compression_ratio_threshold=None).start()
    real = eng._align_batch
    state = {"calls": 0}

    def flaky(jobs):
        state["calls"] += 1
        if state["calls"] == 1:
            raise InvalidStateError("simulated set_result/cancel race")
        return real(jobs)

    eng._align_batch = flaky
    try:
        r1 = eng.submit(Request(audio=_audio(rng, 0.4), language="en",
                                word_timestamps=True)).result(timeout=60)
        assert r1["success"] and r1["words"] is None
        assert "align_error" in r1
        r2 = eng.submit(Request(audio=_audio(rng, 0.5), language="en",
                                word_timestamps=True)).result(timeout=60)
        assert r2["success"] and isinstance(r2["words"], list)
        assert eng._align_thread.is_alive()
    finally:
        eng.stop()


def test_http_format_srt_vtt_tsv(engine_wt, rng):
    """POST /asr?format=srt|vtt|tsv renders the transcript through the
    CLI's subtitle writers (serving must not be the lesser surface);
    subtitle formats imply word_timestamps. format=json stays the raw
    payload; unknown formats 400."""
    srv = make_server(engine_wt, "127.0.0.1", 0, request_timeout_s=120)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        wav = _audio(rng, 0.4)

        def post(fmt):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/asr?language=en&format={fmt}",
                data=wav.tobytes(),
                headers={"Content-Type": "application/octet-stream"})
            with urllib.request.urlopen(req, timeout=120) as r:
                return r.status, r.headers.get("Content-Type"), r.read().decode()

        code, ctype, body = post("srt")
        assert code == 200 and ctype.startswith("application/x-subrip")
        assert "-->" in body  # cue timing line present

        code, ctype, body = post("vtt")
        assert code == 200 and ctype.startswith("text/vtt")
        assert body.startswith("WEBVTT")

        code, ctype, body = post("tsv")
        assert code == 200 and body.splitlines()[0] == "start\tend\ttext"

        code, ctype, body = post("txt")
        assert code == 200 and ctype.startswith("text/plain")

        # unknown format -> 400
        try:
            post("exe")
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400

        # streaming + format -> 400 (NDJSON only)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/asr?language=en&format=srt&stream=1",
            data=wav.tobytes(),
            headers={"Content-Type": "application/octet-stream"})
        try:
            urllib.request.urlopen(req, timeout=120)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.shutdown()
