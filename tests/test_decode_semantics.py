"""OpenAI decode-semantics tests: shared encoder pass (cross-KV reuse),
no-speech silence gating, and beam feature parity (self_kv_quant/prompt_pad).

The reference has none of these semantics (it always emits argmax tokens and
re-runs nothing); these are OpenAI whisper/transcribe.py behaviors rebuilt
for the batched TPU decode path.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from whisper_tpu.config import WhisperConfig
from whisper_tpu.decode import (
    GreedyResult,
    detect_language,
    detect_language_kv,
    encode_cross_kv,
    greedy_decode,
    greedy_decode_kv,
    index_cross_kv,
)
from whisper_tpu.models.model import init_params

NANO = WhisperConfig(
    name="nano-sem",
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


@pytest.fixture(scope="module")
def params():
    return init_params(NANO)


def _mel(rng, b=2):
    return jnp.asarray(
        rng.standard_normal((b, NANO.n_mels, 2 * NANO.n_audio_ctx)).astype(np.float32))


def _prompt(b=2):
    return jnp.asarray(
        np.tile(np.asarray(NANO.sot_sequence("zh", "transcribe"), np.int32), (b, 1)))


@pytest.mark.slow
def test_greedy_decode_kv_matches_fused(params, rng):
    """Split encode+decode must produce the exact tokens of the fused path."""
    mel = _mel(rng)
    prompt = _prompt()
    fused = greedy_decode(params, mel, prompt, NANO)
    ckv = encode_cross_kv(params, mel, NANO)
    split = greedy_decode_kv(params, ckv, prompt, NANO)
    np.testing.assert_array_equal(np.asarray(fused.tokens), np.asarray(split.tokens))
    np.testing.assert_array_equal(np.asarray(fused.lengths), np.asarray(split.lengths))
    np.testing.assert_allclose(np.asarray(fused.no_speech_prob),
                               np.asarray(split.no_speech_prob), rtol=1e-5)


@pytest.mark.slow
def test_greedy_decode_kv_matches_fused_quantized(params, rng):
    mel = _mel(rng)
    prompt = _prompt()
    fused = greedy_decode(params, mel, prompt, NANO, kv_quant=True)
    ckv = encode_cross_kv(params, mel, NANO, kv_quant=True)
    split = greedy_decode_kv(params, ckv, prompt, NANO)
    np.testing.assert_array_equal(np.asarray(fused.tokens), np.asarray(split.tokens))


@pytest.mark.slow
def test_detect_language_kv_matches(params, rng):
    mel = _mel(rng)
    ckv = encode_cross_kv(params, mel, NANO)
    i1, p1 = detect_language(params, mel, NANO)
    i2, p2 = detect_language_kv(params, ckv, NANO)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-5)


@pytest.mark.slow
def test_index_cross_kv_subset_decode(params, rng):
    """Retry-ladder invariant: decoding an indexed cross-KV subset equals the
    matching rows of the full-batch decode."""
    mel = _mel(rng, b=3)
    prompt = _prompt(b=3)
    ckv = encode_cross_kv(params, mel, NANO)
    full = greedy_decode_kv(params, ckv, prompt, NANO)
    idx = np.asarray([2, 0])
    sub = greedy_decode_kv(params, index_cross_kv(ckv, idx), prompt[idx], NANO)
    np.testing.assert_array_equal(np.asarray(full.tokens)[idx], np.asarray(sub.tokens))


@pytest.mark.slow
def test_beam_kv_matches_fused(params, rng):
    from whisper_tpu.beam import beam_search, beam_search_kv

    mel = _mel(rng)
    prompt = _prompt()
    fused = beam_search(params, mel, prompt, NANO, beam_size=3,
                        apply_filters=False, max_tokens=8)
    ckv = encode_cross_kv(params, mel, NANO)
    split = beam_search_kv(params, ckv, prompt, NANO, beam_size=3,
                           apply_filters=False, max_tokens=8)
    np.testing.assert_array_equal(np.asarray(fused.tokens), np.asarray(split.tokens))
    np.testing.assert_allclose(np.asarray(fused.scores), np.asarray(split.scores),
                               rtol=1e-5)


@pytest.fixture(autouse=True)
def _fresh_jit_caches():
    """Workaround for an environment-level jax dispatch bug: after specific
    sequences of compilations across pytest test boundaries, re-dispatching
    an already-compiled jit drops an argument buffer ("Execution supplied 52
    buffers but compiled program expected 53"). Not reproducible in plain
    scripts with identical call sequences (delta-debugged: greedy_decode in
    one test, then beam_search twice across two tests). Clearing all jit
    caches per test trades recompiles for immunity."""
    import jax

    jax.clear_caches()


@pytest.mark.slow
def test_beam_padded_prompt_parity(params, rng):
    """Beam with a zero left-pad must equal beam without prompt_pad — the
    invariant that lets longform condition-on-previous use beam search."""
    from whisper_tpu.beam import beam_search

    mel = _mel(rng)
    prompt = _prompt()
    plain = beam_search(params, mel, prompt, NANO, beam_size=3,
                        apply_filters=False, max_tokens=8)
    padded = beam_search(params, mel, prompt, NANO, beam_size=3,
                         apply_filters=False, max_tokens=8,
                         prompt_pad=jnp.zeros((2,), jnp.int32))
    np.testing.assert_array_equal(np.asarray(plain.tokens), np.asarray(padded.tokens))


@pytest.mark.slow
def test_beam_left_padded_matches_unpadded(params, rng):
    """Beam with a real left-pad (masked, position-shifted) must decode the
    same continuation as the unpadded prompt."""
    from whisper_tpu.beam import beam_search

    mel = _mel(rng)
    base = [NANO.sot, NANO.lang_token_start, NANO.transcribe]
    plain = np.asarray([base, base], np.int32)
    r_plain = beam_search(params, mel, jnp.asarray(plain), NANO, beam_size=3,
                          apply_filters=False, max_tokens=6)
    pad = 4
    padded = np.full((2, pad + len(base)), NANO.eot, np.int32)
    padded[:, pad:] = plain
    r_pad = beam_search(params, mel, jnp.asarray(padded), NANO, beam_size=3,
                        apply_filters=False, max_tokens=6,
                        prompt_pad=jnp.full((2,), pad, jnp.int32),
                        sot_index=pad)
    P0, P1 = plain.shape[1], padded.shape[1]
    l0, l1 = np.asarray(r_plain.lengths), np.asarray(r_pad.lengths)
    np.testing.assert_array_equal(l0 - P0, l1 - P1)
    for b in range(2):
        np.testing.assert_array_equal(
            np.asarray(r_plain.tokens)[b, P0:l0[b]],
            np.asarray(r_pad.tokens)[b, P1:l1[b]])
    np.testing.assert_allclose(np.asarray(r_plain.no_speech_prob),
                               np.asarray(r_pad.no_speech_prob), rtol=1e-5)


@pytest.mark.slow
def test_beam_self_kv_quant_smoke(params, rng):
    """Beam with the packed int8 self-KV cache runs and keeps valid shapes
    (numerics shift within int8 rounding; token identity isn't guaranteed)."""
    from whisper_tpu.beam import beam_search

    mel = _mel(rng)
    prompt = _prompt()
    r = beam_search(params, mel, prompt, NANO, beam_size=3,
                    apply_filters=False, max_tokens=8, self_kv_quant=True)
    toks = np.asarray(r.tokens)
    lens = np.asarray(r.lengths)
    assert toks.shape == (2, NANO.n_text_ctx)
    assert (lens >= prompt.shape[1]).all() and (lens <= NANO.n_text_ctx).all()


# ---------------------------------------------------------------- no-speech
def _result(nsp, avg_lp):
    n = len(nsp)
    return GreedyResult(
        tokens=jnp.zeros((n, 8), jnp.int32),
        lengths=jnp.full((n,), 4, jnp.int32),
        no_speech_prob=jnp.asarray(nsp, jnp.float32),
        avg_logprob=jnp.asarray(avg_lp, jnp.float32),
    )


def test_silence_mask_semantics():
    from whisper_tpu.longform import silence_mask

    # silent iff nsp > thresh and NOT confident (avg_lp <= lp_thresh)
    res = _result([0.9, 0.9, 0.1, 0.9], [-2.0, -0.5, -2.0, -1.0])
    m = silence_mask(res, no_speech_threshold=0.6, logprob_threshold=-1.0)
    np.testing.assert_array_equal(m, [True, False, False, True])
    # disabled when threshold is None
    m = silence_mask(res, None, -1.0)
    assert not m.any()
    # no confidence override when logprob_threshold is None
    m = silence_mask(res, 0.6, None)
    np.testing.assert_array_equal(m, [True, True, False, True])


def test_needs_retry_skips_silent_segments():
    """A silent segment must NOT enter the temperature-retry ladder."""
    pipe = object.__new__(__import__("whisper_tpu.pipeline",
                                     fromlist=["WhisperPipeline"]).WhisperPipeline)
    pipe.no_speech_threshold = 0.6
    pipe.logprob_threshold = -1.0
    pipe.compression_ratio_threshold = 2.4
    pipe.timestamps = False

    class Tok:
        def decode(self, ids):
            return "x" * len(ids)

    pipe.tokenizer = Tok()
    # both fail the logprob criterion, but row 0 is silent -> skip not retry
    res = _result([0.9, 0.1], [-5.0, -5.0])
    bad = pipe._needs_retry(res, np.zeros((2, 2), np.int32))
    np.testing.assert_array_equal(bad, [False, True])


_SEEK_SILENT_SCRIPT = r"""
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from whisper_tpu.config import WhisperConfig
from whisper_tpu.longform import transcribe_seek
from whisper_tpu.models.model import init_params
from whisper_tpu.tokenizer import get_tokenizer

cfg = WhisperConfig(
    name="nano-sil", n_mels=80, n_audio_ctx=1500, n_audio_state=64,
    n_audio_head=2, n_audio_layer=1, n_vocab=51865, n_text_ctx=24,
    n_text_state=64, n_text_head=2, n_text_layer=1)

class Pipe: pass
pipe = Pipe()
pipe.cfg = cfg
pipe.params = init_params(cfg)
pipe.compute_dtype = jnp.float32
pipe.task = "transcribe"
pipe.max_tokens = 4
pipe.kv_quant = False
pipe._suppress_ids = None
pipe.tokenizer = get_tokenizer(True, num_languages=99)
# force every window silent: any nsp beats -1, and no finite avg_logprob
# clears a +1e9 confidence bar
pipe.no_speech_threshold = -1.0
pipe.logprob_threshold = 1e9

rng = np.random.default_rng(0)
waves = [(rng.standard_normal(16000 * 45) * 0.1).astype(np.float32)]
out = transcribe_seek(pipe, waves, "en")
text, segs = out[0]
assert text == "", text
assert segs == [], segs
print("SEEK_SILENT_OK")
"""


@pytest.mark.slow
def test_transcribe_seek_skips_silent_windows():
    """With everything classified silent, the seek loop advances full windows,
    emits nothing, and terminates.

    Runs in a subprocess: in-process, this exact call sequence triggers the
    environment's jit-dispatch corruption (see _fresh_jit_caches) after the
    earlier tests' compilations, even with cleared caches; the identical
    sequence passes in a fresh interpreter.
    """
    import os
    import subprocess
    import sys

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, "-c", _SEEK_SILENT_SCRIPT], env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "SEEK_SILENT_OK" in proc.stdout


@pytest.mark.slow
def test_initial_prompt_prefix(params, rng):
    """initial_prompt builds a [sot_prev, tokens] prefix and the decode
    matches a manual greedy_decode with the same prompt + sot_index."""
    import pytest as _pytest

    from whisper_tpu.pipeline import WhisperPipeline
    from whisper_tpu.tokenizer import find_vocab_file

    try:
        find_vocab_file()
    except FileNotFoundError:
        _pytest.skip("vocab asset unavailable")

    pipe = WhisperPipeline(model="test-nano", language="en",
                           apply_filters=False, max_tokens=6,
                           initial_prompt="ZyXw glossary")
    audio = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    r = pipe.transcribe(audio)

    ptoks = pipe.tokenizer.encode(" ZyXw glossary")
    base = list(pipe.cfg.sot_sequence("en", "transcribe"))
    manual_prompt = np.asarray([[pipe.cfg.sot_prev, *ptoks, *base]], np.int32)
    from whisper_tpu.ops.mel import log_mel_batch

    batch = np.zeros((1, 480000), np.float32)
    batch[0, :8000] = audio
    mel = log_mel_batch(jnp.asarray(batch),
                        jnp.asarray([8000], np.int32))[..., : 2 * pipe.cfg.n_audio_ctx]
    manual = greedy_decode(pipe.params, mel, jnp.asarray(manual_prompt),
                           pipe.cfg, max_tokens=6,
                           sot_index=1 + len(ptoks))
    toks = np.asarray(manual.tokens)[0]
    ln = int(np.asarray(manual.lengths)[0])
    manual_text = pipe.tokenizer.decode(
        toks[manual_prompt.shape[1]: ln]).strip()
    assert r.text == manual_text
