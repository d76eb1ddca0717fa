"""Word-level timestamp machinery (align.py) + output writers (formats.py).

With random weights the *times* are arbitrary; these tests assert the
machinery: DTW correctness on crafted cost matrices, attention-map shapes
and normalization, monotone non-overlapping word spans, writer formats.
"""

import io

import numpy as np
import pytest

import jax.numpy as jnp

from whisper_tpu.align import (
    TIME_PER_FRAME,
    alignment_cross_attn,
    alignment_head_mask,
    dequantize_cross_kv,
    dtw_path,
    median_filter,
    merge_punctuations,
    words_from_attention,
)
from whisper_tpu.config import WhisperConfig
from whisper_tpu.models.model import init_params
from whisper_tpu.tokenizer import get_tokenizer

NANO = WhisperConfig(
    name="nano",
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


# ------------------------------------------------------------------- dtw
def test_dtw_diagonal():
    n = 8
    cost = np.ones((n, n)) - np.eye(n)  # zero cost on the diagonal
    ti, tj = dtw_path(cost)
    assert ti[0] == 0 and tj[0] == 0
    assert ti[-1] == n - 1 and tj[-1] == n - 1
    # the path should ride the diagonal exactly
    assert (ti == tj).all()


def test_dtw_monotone_and_complete():
    rng = np.random.default_rng(7)
    cost = rng.random((13, 29))
    ti, tj = dtw_path(cost)
    assert (np.diff(ti) >= 0).all() and (np.diff(tj) >= 0).all()
    assert (np.diff(ti) + np.diff(tj) >= 1).all()  # always advances
    assert set(ti) == set(range(13))  # every text row visited
    assert ti[-1] == 12 and tj[-1] == 28


def test_dtw_prefers_cheap_path():
    # two-row matrix where row 0 is cheap early, row 1 cheap late: the
    # transition must happen between columns 1 and 2
    cost = np.array([[0.0, 0.0, 9.0, 9.0],
                     [9.0, 9.0, 0.0, 0.0]])
    ti, tj = dtw_path(cost)
    switch = tj[np.searchsorted(ti, 1)]
    assert switch == 2


def test_median_filter_matches_numpy():
    rng = np.random.default_rng(3)
    x = rng.random((2, 33))
    got = median_filter(x, 7)
    xp = np.pad(x, [(0, 0), (3, 3)], mode="reflect")
    for i in range(33):
        assert got[0, i] == pytest.approx(np.median(xp[0, i : i + 7]))
    assert got.shape == x.shape


def test_median_filter_width1_identity():
    x = np.arange(12.0).reshape(3, 4)
    assert (median_filter(x, 1) == x).all()


# -------------------------------------------------------- device alignment
@pytest.fixture(scope="module")
def nano_setup(rng=None):
    import jax

    params = init_params(NANO, jax.random.PRNGKey(0))
    r = np.random.default_rng(11)
    B, Ta = 2, NANO.n_audio_ctx
    L, H, dh = NANO.n_text_layer, NANO.n_text_head, NANO.head_dim_text
    ck = jnp.asarray(r.standard_normal((L, B, H, Ta, dh)).astype(np.float32))
    cv = jnp.asarray(r.standard_normal((L, B, H, Ta, dh)).astype(np.float32))
    return params, (ck, cv)


def test_alignment_cross_attn_shapes(nano_setup):
    params, cross_kv = nano_setup
    B, S = 2, 10
    tokens = jnp.full((B, S), NANO.sot, jnp.int32)
    attn, tlp = alignment_cross_attn(params, tokens, cross_kv, NANO)
    assert attn.shape == (NANO.n_text_layer, B, NANO.n_text_head, S,
                          NANO.n_audio_ctx)
    assert tlp.shape == (B, S - 1)
    # softmax over the audio axis
    sums = np.asarray(attn).sum(-1)
    np.testing.assert_allclose(sums, 1.0, atol=1e-4)
    assert (np.asarray(tlp) <= 0).all()


def test_alignment_head_mask_default():
    m = alignment_head_mask(NANO)
    assert m.shape == (NANO.n_text_layer, NANO.n_text_head)
    assert not m[0].any() and m[1].all()  # last half of 2 layers


def test_alignment_head_mask_sidecar(tmp_path):
    import json

    p = tmp_path / "heads.json"
    p.write_text(json.dumps({"nano": [[0, 1], [1, 0]]}))
    m = alignment_head_mask(NANO, str(p))
    assert m[0, 1] and m[1, 0] and m.sum() == 2


def test_dequantize_cross_kv_roundtrip(nano_setup):
    from whisper_tpu.models.model import quantize_cross_kv

    _, cross_kv = nano_setup
    dq = dequantize_cross_kv(quantize_cross_kv(cross_kv))
    for a, b in zip(cross_kv, dq):
        assert b.shape == a.shape
        err = np.abs(np.asarray(a) - np.asarray(b)).max()
        assert err < 0.05  # int8 rounding
    # fp passthrough
    assert dequantize_cross_kv(cross_kv) is cross_kv


def test_median7_network_matches_numpy():
    from whisper_tpu.align import _median7_time

    rng = np.random.default_rng(9)
    arrs = [rng.standard_normal((3, 17)).astype(np.float32) for _ in range(7)]
    got = np.asarray(_median7_time([jnp.asarray(a) for a in arrs]))
    want = np.median(np.stack(arrs), axis=0)
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_median_taps_generic_width_matches_numpy():
    """Non-7 tap counts take the sorted-stack path (the medfilt_width
    parameter must work for any odd width, not trap at trace time —
    ADVICE r4)."""
    from whisper_tpu.align import _median7_time

    rng = np.random.default_rng(11)
    for w in (1, 3, 5, 9):
        arrs = [rng.standard_normal((2, 9)).astype(np.float32)
                for _ in range(w)]
        got = np.asarray(_median7_time([jnp.asarray(a) for a in arrs]))
        want = np.median(np.stack(arrs), axis=0)
        np.testing.assert_allclose(got, want, atol=1e-7)


def test_alignment_matrix_nondefault_width(nano_setup):
    """alignment_matrix with medfilt_width=5 runs (no trace-time crash)
    and matches the host reference at the same width; even widths are
    rejected with a clear error."""
    from whisper_tpu.align import alignment_matrix, median_filter

    params, cross_kv = nano_setup
    B, S, Ta = 2, 8, NANO.n_audio_ctx
    rng = np.random.default_rng(23)
    tokens = np.full((B, S), NANO.eot, np.int32)
    for b in range(B):
        tokens[b] = rng.integers(0, 200, S)
    row_mask = np.zeros((B, S), bool)
    row_mask[:, 2:] = True
    hm = alignment_head_mask(NANO)
    got, _ = alignment_matrix(
        params, jnp.asarray(tokens), cross_kv,
        jnp.asarray(hm, jnp.float32), jnp.asarray(row_mask),
        jnp.asarray([Ta, Ta], jnp.int32), NANO, medfilt_width=5)
    got = np.asarray(got, np.float32)
    attn, _ = alignment_cross_attn(params, jnp.asarray(tokens), cross_kv,
                                   NANO)
    for b in range(B):
        sel = np.asarray(attn, np.float32)[:, b][hm][:, 2:, :]
        mean = sel.mean(axis=-2, keepdims=True)
        std = sel.std(axis=-2, keepdims=True) + 1e-9
        want = median_filter((sel - mean) / std, 5).mean(axis=0)
        np.testing.assert_allclose(got[b, 2:], want, rtol=2e-3, atol=2e-3)
    with pytest.raises(ValueError, match="odd"):
        alignment_matrix(
            params, jnp.asarray(tokens), cross_kv,
            jnp.asarray(hm, jnp.float32), jnp.asarray(row_mask),
            jnp.asarray([Ta, Ta], jnp.int32), NANO, medfilt_width=4)


def test_alignment_matrix_matches_host_reference(nano_setup):
    """Device-reduced matrix (head mask + standardize + median filter +
    head-mean on device) == the host post-processing of the full attention
    stack, per utterance, with ragged row/frame validity."""
    from whisper_tpu.align import alignment_matrix, median_filter

    params, cross_kv = nano_setup
    B, S, Ta = 2, 12, NANO.n_audio_ctx
    rng = np.random.default_rng(21)
    tokens = np.full((B, S), NANO.eot, np.int32)
    prompt_len = 2
    Ls = [S, 8]           # utterance 1 has padding rows
    frames = [Ta, 20]     # utterance 1 has a short audio span
    for b in range(B):
        tokens[b, : Ls[b]] = rng.integers(0, 200, Ls[b])
    row_mask = np.zeros((B, S), bool)
    for b in range(B):
        row_mask[b, prompt_len : Ls[b]] = True
    hm = alignment_head_mask(NANO)

    got, tlp = alignment_matrix(
        params, jnp.asarray(tokens), cross_kv,
        jnp.asarray(hm, jnp.float32), jnp.asarray(row_mask),
        jnp.asarray(frames, jnp.int32), NANO)
    got = np.asarray(got, np.float32)
    assert got.shape == (B, S, Ta)

    attn, tlp_ref = alignment_cross_attn(params, jnp.asarray(tokens),
                                         cross_kv, NANO)
    attn = np.asarray(attn, np.float32)
    np.testing.assert_allclose(np.asarray(tlp), np.asarray(tlp_ref),
                               rtol=1e-4, atol=1e-4)
    for b in range(B):
        sel = attn[:, b][hm][:, prompt_len : Ls[b], : frames[b]]
        mean = sel.mean(axis=-2, keepdims=True)
        std = sel.std(axis=-2, keepdims=True) + 1e-9
        want = median_filter((sel - mean) / std, 7).mean(axis=0)
        np.testing.assert_allclose(
            got[b, prompt_len : Ls[b], : frames[b]], want,
            rtol=2e-3, atol=2e-3)


def test_words_eot_row_excluded_from_dtw():
    """Word times must be INVARIANT to the eot row's attention: OpenAI's
    find_alignment drops the final row before DTW (ADVICE r3) so the noisy
    eot map cannot distort the path through the real tokens."""
    from whisper_tpu.align import words_from_matrix

    tok = get_tokenizer(True, language="en", task="transcribe")
    text_ids = tok.encode(" hi there")
    rows = text_ids + [tok.eot]
    St, F = len(rows), 40
    t = np.linspace(0, F - 1, St)
    base = np.exp(-((np.arange(F)[None, :] - t[:, None]) ** 2) / 2.0)
    words_a = words_from_matrix(base.copy(), rows, tok)
    # mangle the eot row wildly: concentrated on one arbitrary mid frame
    mangled = base.copy()
    mangled[St - 1, :] = 1e-6
    mangled[St - 1, 7] = 1.0
    words_b = words_from_matrix(mangled, rows, tok)
    assert words_a == words_b and len(words_a) == 2


# ------------------------------------------------------------- words
def _diag_attention(n_rows, n_frames, L, H, sharp=50.0):
    """Synthetic maps attending diagonally: token i -> frame i*stride."""
    t = np.linspace(0, n_frames - 1, n_rows)
    f = np.arange(n_frames)
    w = np.exp(-((f[None, :] - t[:, None]) ** 2) / 2.0) + 1e-6
    w = w / w.sum(-1, keepdims=True)
    return np.tile(w[None, None], (L, H, 1, 1)).astype(np.float32)


def test_words_monotone_on_diagonal_attention():
    tok = get_tokenizer(True, language="en", task="transcribe")
    text_ids = tok.encode(" hello world how are you")
    prompt = [NANO.sot, NANO.eot - 1]  # arbitrary 2-token prompt
    seq = prompt + text_ids + [tok.eot]
    S, F = len(seq), 40
    attn = _diag_attention(S, F, NANO.n_text_layer, NANO.n_text_head)
    words = words_from_attention(attn, seq, len(prompt), tok, NANO, F)
    assert [w["word"].strip() for w in words] == [
        "hello", "world", "how", "are", "you"]
    starts = [w["start"] for w in words]
    ends = [w["end"] for w in words]
    assert all(s <= e for s, e in zip(starts, ends))
    assert starts == sorted(starts)
    # successive words don't overlap
    assert all(ends[i] <= starts[i + 1] + 1e-9 for i in range(len(words) - 1))
    assert ends[-1] <= F * TIME_PER_FRAME + 1e-9


def test_words_zh_unicode_split():
    tok = get_tokenizer(True, language="zh", task="transcribe")
    text_ids = tok.encode("你好世界")
    seq = [NANO.sot] + text_ids + [tok.eot]
    S, F = len(seq), 30
    attn = _diag_attention(S, F, NANO.n_text_layer, NANO.n_text_head)
    words = words_from_attention(attn, seq, 1, tok, NANO, F)
    assert "".join(w["word"] for w in words) == "你好世界"
    starts = [w["start"] for w in words]
    assert starts == sorted(starts)


def test_words_probability_attached():
    tok = get_tokenizer(True, language="en", task="transcribe")
    text_ids = tok.encode(" hi there")
    seq = [NANO.sot] + text_ids + [tok.eot]
    S, F = len(seq), 20
    attn = _diag_attention(S, F, NANO.n_text_layer, NANO.n_text_head)
    tlp = np.full(S - 1, np.log(0.5), np.float32)
    words = words_from_attention(attn, seq, 1, tok, NANO, F,
                                 token_logprobs=tlp)
    assert all(w["probability"] == pytest.approx(0.5, abs=1e-3) for w in words)


def test_merge_punctuations():
    words = [
        {"word": " \"", "start": 0.0, "end": 0.1},
        {"word": "hi", "start": 0.1, "end": 0.5},
        {"word": ",", "start": 0.5, "end": 0.6},
        {"word": " there", "start": 0.6, "end": 1.0},
    ]
    merged = merge_punctuations(words)
    assert [w["word"] for w in merged] == [" \"hi,", " there"]
    assert merged[0]["start"] == 0.0 and merged[0]["end"] == 0.6


# ------------------------------------------------------------- pipeline e2e
@pytest.mark.slow
@pytest.mark.parametrize("kv_quant", [False, True])
def test_pipeline_word_timestamps_e2e(tmp_path, kv_quant):
    """Random-weight tiny-config-free e2e: words come back monotone within
    the audio span (incl. the int8 cross-KV dequantize path)."""
    from whisper_tpu.pipeline import WhisperPipeline

    pipe = WhisperPipeline.__new__(WhisperPipeline)  # skip heavy init
    # build a minimal pipeline around NANO by hand
    import jax

    pipe.task = "transcribe"
    pipe.language = "en"
    pipe.compute_dtype = jnp.float32
    pipe.beam_size = 0
    pipe.timestamps = False
    pipe.max_tokens = 6
    pipe.apply_filters = False
    pipe.kv_quant = kv_quant
    pipe.self_kv_quant = False
    pipe.temperature = 0.0
    pipe.temperature_fallback = False
    pipe.compression_ratio_threshold = 2.4
    pipe.logprob_threshold = -1.0
    pipe.no_speech_threshold = 0.6
    pipe.condition_on_previous_text = True
    pipe.initial_prompt = None
    pipe.longform_overlap = 32000
    pipe.word_timestamps = True
    pipe.alignment_heads = None
    pipe.cfg = NANO
    pipe.params = init_params(NANO, jax.random.PRNGKey(0))
    pipe.tokenizer = get_tokenizer(True, language="en", task="transcribe")
    pipe._suppress_ids = None

    rng = np.random.default_rng(5)
    audio = (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)
    res = pipe.transcribe(audio)
    assert res.words is not None
    for w in res.words:
        assert 0.0 <= w["start"] <= w["end"] <= res.audio_seconds + 0.5
    starts = [w["start"] for w in res.words]
    assert starts == sorted(starts)


# ------------------------------------------------------------- formats
class _R:
    def __init__(self, **kw):
        self.__dict__.update(kw)

    @property
    def rtf(self):
        return 0.001

    @property
    def segments(self):
        return self.segments_list or []


def _result_with_words():
    words = [
        {"word": " hello", "start": 0.0, "end": 0.5},
        {"word": " world.", "start": 0.6, "end": 1.0},
        {"word": " bye", "start": 3.0, "end": 3.4},
    ]
    return _R(text="hello world. bye", language="en", segments_list=None,
              words=words, audio_seconds=4.0)


def test_srt_output():
    from whisper_tpu.formats import write_result

    f = io.StringIO()
    write_result(_result_with_words(), "srt", f)
    out = f.getvalue()
    assert "1\n00:00:00,000 --> 00:00:01,000\nhello world.\n" in out
    assert "2\n00:00:03,000 --> 00:00:03,400\nbye\n" in out


def test_vtt_output():
    from whisper_tpu.formats import write_result

    f = io.StringIO()
    write_result(_result_with_words(), "vtt", f)
    out = f.getvalue()
    assert out.startswith("WEBVTT\n\n")
    assert "00:00:00.000 --> 00:00:01.000\nhello world.\n" in out


def test_json_output_includes_words():
    import json as _json

    from whisper_tpu.formats import write_result

    f = io.StringIO()
    write_result(_result_with_words(), "json", f)
    data = _json.loads(f.getvalue())
    assert data["text"] == "hello world. bye"
    assert len(data["words"]) == 3
    assert len(data["segments"]) == 2  # gap > 1 s splits


def test_tsv_and_txt_and_unknown():
    from whisper_tpu.formats import write_result

    f = io.StringIO()
    write_result(_result_with_words(), "tsv", f)
    lines = f.getvalue().splitlines()
    assert lines[0] == "start\tend\ttext"
    assert lines[1].startswith("0\t1000\t")
    f = io.StringIO()
    write_result(_result_with_words(), "txt", f)
    assert f.getvalue() == "hello world. bye\n"
    with pytest.raises(ValueError):
        write_result(_result_with_words(), "nope", io.StringIO())


def test_segments_from_explicit_segments():
    from whisper_tpu.formats import write_result

    r = _R(text="t", language="zh", segments_list=[(0.0, 1.5, "你好")],
           words=None, audio_seconds=2.0)
    f = io.StringIO()
    write_result(r, "srt", f)
    assert "00:00:00,000 --> 00:00:01,500\n你好\n" in f.getvalue()


def test_render_payload_from_serving_dict():
    """render_payload adapts a serving payload dict (engine result) to the
    writer interface: segments synthesized from words, utf-8 text out."""
    from whisper_tpu.formats import HTTP_CONTENT_TYPES, render_payload

    payload = {
        "success": True,
        "text": "hello world again",
        "language": "en",
        "audio_seconds": 2.0,
        "rtf": 0.01,
        "words": [
            {"word": " hello", "start": 0.1, "end": 0.4},
            {"word": " world", "start": 0.5, "end": 0.9},
            {"word": " again", "start": 2.2, "end": 2.5},  # >1 s gap splits
        ],
    }
    srt = render_payload(payload, "srt")
    assert "1\n00:00:00,100 --> 00:00:00,900\nhello world\n" in srt
    assert "2\n" in srt  # the gap produced a second cue
    vtt = render_payload(payload, "vtt")
    assert vtt.startswith("WEBVTT")
    tsv = render_payload(payload, "tsv")
    assert tsv.splitlines()[1] == "100\t900\thello world"
    txt = render_payload(payload, "txt")
    assert txt == "hello world again\n"
    assert set(HTTP_CONTENT_TYPES) == {"txt", "srt", "vtt", "tsv", "json"}
    # no words at all: subtitle formats degrade to empty cue lists
    assert render_payload({"text": "x", "language": "en"}, "srt") == ""
