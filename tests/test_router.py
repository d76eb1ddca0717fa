"""Data-parallel router tests: policy unit tests, live fan-out across two
in-process replicas, failover, and a true 2-process `--dp 2` integration run.

The reference has a single server wrapping a single NPU
(cpp/whisper_srv.cpp:10-70); DP-across-replicas serving is new capability and
the core of the multi-host scaling story (parallel/distributed.py).
"""

import json
import os
import signal
import socket
import struct
import subprocess
import sys
import threading
import time
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest

import jax.numpy as jnp

from whisper_tpu.config import WhisperConfig
from whisper_tpu.models.model import init_params
from whisper_tpu.serving.engine import ContinuousBatchingEngine
from whisper_tpu.serving.router import Backend, Router, make_router
from whisper_tpu.serving.server import make_server

NANO = WhisperConfig(
    name="nano-router",
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
    def decode(self, ids):
        return " ".join(str(int(i)) for i in ids)

    def decode_with_timestamps(self, ids):
        return self.decode(ids)

    non_speech_tokens = ()


# ---------------------------------------------------------------- policy
def test_pick_least_in_flight():
    r = Router(["http://a:1", "http://b:1", "http://c:1"])
    r.backends[0].in_flight = 2
    r.backends[1].in_flight = 0
    r.backends[2].in_flight = 1
    assert r.pick().url == "http://b:1"


def test_pick_round_robins_ties():
    r = Router(["http://a:1", "http://b:1"])
    seen = {r.pick().url for _ in range(4)}
    assert seen == {"http://a:1", "http://b:1"}


def test_pick_skips_down_and_excluded():
    r = Router(["http://a:1", "http://b:1"])
    r.mark_down(r.backends[0])
    assert r.pick().url == "http://b:1"
    assert r.pick(exclude={id(r.backends[1])}) is None  # a down, b excluded
    r.backends[0].down_until = 0.0  # cooldown over
    r.backends[1].in_flight = 1  # a now least-loaded
    assert r.pick().url == "http://a:1"


# ---------------------------------------------------------------- live
@pytest.fixture()
def two_replicas():
    """Two engines + servers on loopback, a router in front."""
    params = init_params(NANO)
    engines, servers, threads = [], [], []
    urls = []
    for _ in range(2):
        eng = ContinuousBatchingEngine(
            params, NANO, IdTok(), max_slots=2, compute_dtype=jnp.float32,
            steps_per_sync=2, max_tokens=8, apply_filters=False).start()
        srv = make_server(eng, "127.0.0.1", 0)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        engines.append(eng)
        servers.append(srv)
        threads.append(t)
        urls.append(f"http://127.0.0.1:{srv.server_address[1]}")
    router_srv = make_router(urls, "127.0.0.1", 0, cooldown_s=0.2)
    rt = threading.Thread(target=router_srv.serve_forever, daemon=True)
    rt.start()
    yield router_srv, servers, engines, urls
    router_srv.shutdown()
    for s in servers:
        s.shutdown()
    for e in engines:
        e.stop()


def _post_pcm(port: int, rng, seconds=0.5, timeout=60):
    pcm = (rng.standard_normal(int(16000 * seconds)) * 0.1).astype(np.float32)
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/asr?language=zh", data=pcm.tobytes(),
        headers={"Content-Type": "application/octet-stream"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read().decode())


@pytest.mark.slow
def test_router_fans_out(two_replicas, rng):
    router_srv, _, _, _ = two_replicas
    port = router_srv.server_address[1]
    with ThreadPoolExecutor(max_workers=6) as ex:
        results = list(ex.map(lambda _: _post_pcm(port, rng), range(6)))
    assert all(code == 200 and body["success"] for code, body in results)
    served = [b.requests_total for b in router_srv.router.backends]
    assert sum(served) == 6
    assert all(n >= 1 for n in served), f"no fan-out: {served}"


def test_router_health_and_metrics(two_replicas, rng):
    router_srv, _, _, _ = two_replicas
    port = router_srv.server_address[1]
    _post_pcm(port, rng)
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/health", timeout=10) as r:
        h = json.loads(r.read().decode())
    assert h["status"] == "healthy" and len(h["backends"]) == 2
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics", timeout=10) as r:
        m = json.loads(r.read().decode())
    assert m["requests_total"] >= 1
    assert len(m["backends"]) == 2


def test_router_failover_on_dead_backend(two_replicas, rng):
    """Killing one replica degrades capacity, not availability."""
    router_srv, servers, engines, _ = two_replicas
    port = router_srv.server_address[1]
    servers[0].shutdown()
    servers[0].server_close()  # release the listening socket too
    engines[0].stop()
    for _ in range(3):
        code, body = _post_pcm(port, rng)
        assert code == 200 and body["success"]
    served = [b.requests_total for b in router_srv.router.backends]
    assert served[1] >= 3
    import urllib.error

    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/health",
                                    timeout=10) as r:
            h = json.loads(r.read().decode())
            status = r.status
    except urllib.error.HTTPError as e:  # degraded -> 503 with JSON body
        h = json.loads(e.read().decode())
        status = e.code
    assert status == 503 and h["status"] == "degraded"


def test_router_streaming_longform_split(two_replicas, rng):
    """A >30 s STREAMING request fans out across the fleet AND keeps its
    NDJSON stream: ordered window partials, then the merged final payload
    (round 4 — previously split requests lost streaming)."""
    router_srv, _, engines, _ = two_replicas
    port = router_srv.server_address[1]
    pcm = (rng.standard_normal(16000 * 70) * 0.1).astype(np.float32)
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/asr?language=zh&stream=1",
        data=pcm.tobytes(),
        headers={"Content-Type": "application/octet-stream"})
    with urllib.request.urlopen(req, timeout=300) as r:
        assert "ndjson" in r.headers.get("Content-Type", "")
        lines = [json.loads(ln) for ln in r.read().decode().splitlines()
                 if ln]
    final = lines[-1]
    assert final.get("success") is True
    assert final["split"] == "router" and final["windows"] == 3
    partials = [ln for ln in lines[:-1] if "partial" in ln]
    assert partials, "no window partials relayed"
    # partials arrive in window order
    wins = [p["window"] for p in partials]
    assert wins == sorted(wins)
    # the windows really decoded fleet-parallel on the replicas
    assert sum(e.stats.requests_total for e in engines) == 3
    served = [b.requests_total for b in router_srv.router.backends]
    assert all(n >= 1 for n in served), f"not fanned out: {served}"


def test_router_streaming_passthrough(two_replicas, rng):
    """NDJSON streaming relays through the router chunk-by-chunk."""
    router_srv, _, _, _ = two_replicas
    port = router_srv.server_address[1]
    pcm = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/asr?language=zh&stream=1", data=pcm.tobytes(),
        headers={"Content-Type": "application/octet-stream"})
    with urllib.request.urlopen(req, timeout=60) as r:
        lines = [json.loads(ln) for ln in r.read().decode().splitlines() if ln]
    assert lines, "no NDJSON lines relayed"
    assert lines[-1].get("success") is True


def test_router_splits_longform_across_backends(two_replicas, rng):
    """A >30 s POST is split into windows at the router and fanned out over
    BOTH replicas in parallel; the response carries the merged transcript
    (serving-level long-audio at the fleet tier, SURVEY §5)."""
    router_srv, _, engines, _ = two_replicas
    port = router_srv.server_address[1]
    code, body = _post_pcm(port, rng, seconds=70, timeout=300)
    assert code == 200 and body["success"]
    assert body["split"] == "router"
    assert body["windows"] == 3  # 70 s, 30 s windows, 2 s overlap
    assert body["audio_seconds"] == pytest.approx(70.0)
    assert isinstance(body["text"], str)
    served = [b.requests_total for b in router_srv.router.backends]
    assert sum(served) == 3
    assert all(n >= 1 for n in served), f"windows not fanned out: {served}"
    assert router_srv.router.metrics()["router_split_requests"] == 1
    # each engine saw only <=30 s windows, so none re-split internally
    assert sum(e.stats.snapshot()["requests_total"] for e in engines) == 3


@pytest.mark.slow
def test_router_split_disabled_keeps_affinity(two_replicas, rng):
    """With split_longform off the router relays the long request untouched
    to ONE backend, which then windows it itself (engine-level long audio)."""
    _, _, engines, urls = two_replicas
    srv = make_router(urls, "127.0.0.1", 0, split_longform=False)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        code, body = _post_pcm(port, rng, seconds=70, timeout=300)
        assert code == 200 and body["success"]
        assert body.get("split") != "router"
        assert body["windows"] == 3  # engine-side split still applies
        served = [b.requests_total for b in srv.router.backends]
        assert sum(served) == 1, f"expected single-backend affinity: {served}"
    finally:
        srv.shutdown()


def test_make_router_split_flags():
    srv = make_router(["http://127.0.0.1:1", "http://127.0.0.1:2"],
                      "127.0.0.1", 0, split_longform=False,
                      longform_overlap_s=1.5)
    try:
        assert srv.router.split_longform is False
        assert srv.router.longform_overlap_s == 1.5
    finally:
        srv.server_close()


# ---------------------------------------------------------------- 2-process
def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_dp2_subprocess_integration(rng, tmp_path):
    """`python -m whisper_tpu.serving --dp 2` on the CPU backend: two worker
    PROCESSES behind the router; concurrent requests fan out and return."""
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.Popen(
        [sys.executable, "-m", "whisper_tpu.serving", "--dp", "2",
         "--model_type", "test-nano", "--port", str(port),
         "--dtype", "float32", "--slots", "2", "--max_tokens", "6",
         "--steps_per_sync", "2"],
        env=env, cwd="/root/repo", start_new_session=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    try:
        deadline = time.monotonic() + 240
        up = False
        while time.monotonic() < deadline:
            if proc.poll() is not None:
                pytest.fail(f"orchestrator died rc={proc.returncode}")
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{port}/health", timeout=2) as r:
                    if r.status == 200:
                        up = True
                        break
            except OSError:
                time.sleep(0.5)
        assert up, "router never became healthy"

        with ThreadPoolExecutor(max_workers=4) as ex:
            results = list(ex.map(
                lambda _: _post_pcm(port, rng, timeout=120), range(4)))
        assert all(code == 200 and body["success"] for code, body in results)

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/metrics", timeout=10) as r:
            m = json.loads(r.read().decode())
        per = [b.get("router_requests", 0) for b in m["backends"]]
        assert sum(per) == 4
        assert all(n >= 1 for n in per), f"no cross-process fan-out: {per}"
    finally:
        # SIGTERM the orchestrator (its handler tears down the workers),
        # then sweep the exact process group we created — without the group
        # kill a wedged orchestrator leaks one worker process per replica
        proc.terminate()
        try:
            proc.wait(timeout=15)
        except subprocess.TimeoutExpired:
            proc.kill()
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            pass  # group already gone


@pytest.mark.slow
def test_router_split_merges_word_timestamps(rng):
    """Router-split windows carry word_timestamps through and the merged
    response has absolute, sorted word times."""
    from whisper_tpu.tokenizer import get_tokenizer

    tok = get_tokenizer(True, language="en", task="transcribe")
    engines, servers, urls = [], [], []
    for _ in range(2):
        eng = ContinuousBatchingEngine(
            init_params(NANO), NANO, tok, max_slots=2,
            compute_dtype=jnp.float32, steps_per_sync=2, max_tokens=8,
            apply_filters=False).start()
        srv = make_server(eng, "127.0.0.1", 0)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        engines.append(eng)
        servers.append(srv)
        urls.append(f"http://127.0.0.1:{srv.server_address[1]}")
    router_srv = make_router(urls, "127.0.0.1", 0)
    threading.Thread(target=router_srv.serve_forever, daemon=True).start()
    try:
        port = router_srv.server_address[1]
        pcm = (rng.standard_normal(16000 * 70) * 0.1).astype(np.float32)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/asr?language=en&word_timestamps=1",
            data=pcm.tobytes(),
            headers={"Content-Type": "application/octet-stream"})
        body = json.loads(urllib.request.urlopen(req, timeout=300).read())
        assert body["success"] and body["split"] == "router"
        assert isinstance(body["words"], list)
        starts = [w["start"] for w in body["words"]]
        assert starts == sorted(starts)
        assert all(0 <= w["start"] <= w["end"] <= 70.5 for w in body["words"])
    finally:
        router_srv.shutdown()
        for s in servers:
            s.shutdown()
        for e in engines:
            e.stop()


def test_parse_asr_request_recovers_utf8_prompt_header():
    """X-Initial-Prompt arrives latin-1 over HTTP; the router must recover
    the utf-8 text BEFORE storing it, or the split path's re-encode
    (hdrs_for/_stream_window) double-encodes non-ASCII prompts — exactly
    the zh vocabulary-priming case the feature targets."""
    from whisper_tpu.serving.router import _parse_asr_request

    prompt = "中文词汇表"
    wire = prompt.encode("utf-8").decode("latin-1")  # as http.server delivers
    body = struct.pack("<4f", 0.0, 0.1, -0.1, 0.2)
    parsed = _parse_asr_request(
        body, "application/octet-stream",
        {"X-Initial-Prompt": wire, "X-Language": "zh"}, {})
    assert parsed is not None
    _audio, params = parsed
    assert params["initial_prompt"] == prompt
    # and the wire re-encode round-trips back to the same header value
    assert params["initial_prompt"].encode("utf-8").decode("latin-1") == wire
    # an ASCII prompt passes through untouched
    parsed = _parse_asr_request(
        body, "application/octet-stream", {"X-Initial-Prompt": "hello"}, {})
    assert parsed[1]["initial_prompt"] == "hello"
