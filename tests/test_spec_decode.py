"""Speculative decoding (spec_decode.py): the exactness invariant and the
accept/reject bookkeeping.

The invariant is the whole point: for ANY draft, the emitted sequence
equals plain target greedy (a draft token survives only when it matches
the target's own argmax; the first mismatch emits the target's argmax).
A random-weights draft exercises the reject/bonus path with acceptance
near zero; draft == target exercises the full-accept path. No reference
analog (strict one-token-per-call decode, python/whisper.py:241-253).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import jax

from whisper_tpu.config import WhisperConfig
from whisper_tpu.decode import encode_cross_kv, greedy_decode_kv
from whisper_tpu.models.model import init_params
from whisper_tpu.ops.mel import log_mel_batch
from whisper_tpu.spec_decode import speculative_decode_kv

NANO = WhisperConfig(
    name="nano-spec",
    n_mels=80,
    n_audio_ctx=64,
    n_audio_state=64,
    n_audio_head=2,
    n_audio_layer=2,
    n_vocab=51865,
    n_text_ctx=32,
    n_text_state=64,
    n_text_head=2,
    n_text_layer=2,
)

DRAFT = WhisperConfig(
    name="nano-spec-draft",
    n_mels=80,
    n_audio_ctx=64,
    n_audio_state=32,
    n_audio_head=2,
    n_audio_layer=1,
    n_vocab=51865,       # must share the vocabulary
    n_text_ctx=32,
    n_text_state=32,
    n_text_head=2,
    n_text_layer=1,
)


@pytest.fixture(scope="module")
def setup(rng):
    params = init_params(NANO, jax.random.PRNGKey(0))
    draft = init_params(DRAFT, jax.random.PRNGKey(7))
    wavs = np.stack([
        (rng.standard_normal(16000) * 0.1).astype(np.float32)
        for _ in range(3)])
    mel = log_mel_batch(jnp.asarray(wavs),
                        jnp.asarray([w.size for w in wavs], np.int32),
                        n_mels=NANO.n_mels)[..., : 2 * NANO.n_audio_ctx]
    prompt = jnp.asarray([NANO.sot_sequence("zh", "transcribe")] * 3,
                         jnp.int32)
    return params, draft, mel, prompt


def _greedy(params, mel, prompt, max_tokens, **kw):
    cross = encode_cross_kv(params, mel, NANO,
                            kv_quant=kw.pop("kv_quant", False))
    return greedy_decode_kv(params, cross, prompt, NANO,
                            max_tokens=max_tokens, **kw)


def _spec(params, draft, mel, prompt, max_tokens, gamma=4, draft_cfg=DRAFT,
          kv_quant=False, **kw):
    cross_t = encode_cross_kv(params, mel, NANO, kv_quant=kv_quant)
    cross_d = encode_cross_kv(draft, mel, draft_cfg, kv_quant=kv_quant)
    return speculative_decode_kv(params, cross_t, draft, cross_d, prompt,
                                 NANO, draft_cfg, gamma=gamma,
                                 max_tokens=max_tokens, **kw)


@pytest.mark.parametrize("gamma", [1, 3, 4])
def test_spec_equals_greedy_random_draft(setup, gamma):
    """Any draft — even an unrelated random model — must reproduce the
    target's greedy output exactly (reject/bonus path)."""
    params, draft, mel, prompt = setup
    ref = _greedy(params, mel, prompt, 12)
    got = _spec(params, draft, mel, prompt, 12, gamma=gamma)
    assert np.array_equal(np.asarray(got.tokens), np.asarray(ref.tokens))
    assert np.array_equal(np.asarray(got.lengths), np.asarray(ref.lengths))
    np.testing.assert_allclose(np.asarray(got.no_speech_prob),
                               np.asarray(ref.no_speech_prob), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.avg_logprob),
                               np.asarray(ref.avg_logprob), atol=1e-4)
    assert int(got.rounds) >= 1
    # emitted >= 1 token per round regardless of draft quality
    total = int(np.sum(np.maximum(np.asarray(ref.lengths) - prompt.shape[1],
                                  0)))
    assert total > 0


def test_spec_self_draft_accepts_everything(setup):
    """draft == target: every proposal matches, so acceptance is total and
    each round advances gamma+1 tokens (the ceiling case)."""
    params, _, mel, prompt = setup
    gamma = 3
    ref = _greedy(params, mel, prompt, 16)
    got = _spec(params, params, mel, prompt, 16, gamma=gamma, draft_cfg=NANO)
    assert np.array_equal(np.asarray(got.tokens), np.asarray(ref.tokens))
    acc, drafted = int(got.accepted), int(got.drafted)
    assert drafted > 0
    # all live-row proposals accepted except those clipped by eot/limit
    assert acc >= drafted - int(got.rounds) * 2
    # rounds must beat one-per-token: the longest row emitted the most
    longest = int(np.max(np.asarray(ref.lengths))) - prompt.shape[1]
    assert int(got.rounds) <= -(-longest // (gamma + 1)) + 1


def test_spec_equals_greedy_int8_caches(setup):
    """Flagship cache config: int8 cross-KV + packed int8 self-KV."""
    params, draft, mel, prompt = setup
    ref = _greedy(params, mel, prompt, 10, kv_quant=True, self_kv_quant=True)
    got = _spec(params, draft, mel, prompt, 10, gamma=2, kv_quant=True,
                self_kv_quant=True)
    assert np.array_equal(np.asarray(got.tokens), np.asarray(ref.tokens))
    assert np.array_equal(np.asarray(got.lengths), np.asarray(ref.lengths))


def test_spec_respects_token_budget(setup):
    """Rows stop exactly at prompt_len + max_tokens like greedy."""
    params, draft, mel, prompt = setup
    for budget in (1, 2, 5):
        ref = _greedy(params, mel, prompt, budget)
        got = _spec(params, draft, mel, prompt, budget, gamma=4)
        assert np.array_equal(np.asarray(got.tokens), np.asarray(ref.tokens))
        assert np.all(np.asarray(got.lengths)
                      <= prompt.shape[1] + budget)


def test_spec_unbounded_matches_greedy_at_ctx_edge(setup, rng):
    """max_tokens=None at a short n_text_ctx: the ceiling path, where the
    verify window's write positions cross the cache edge and must be
    clipped/masked without corrupting any live row.

    Kept to a short horizon on purpose: each verify window recomputes KV
    in width-(gamma+1) matmuls whose float accumulation differs from the
    1-wide greedy step by ~1e-6; over tens of positions of a flat
    random-weights distribution that drift can flip an argmax (the
    documented numerical-tie caveat), which would test float ordering,
    not the algorithm."""
    import dataclasses

    cfg16 = dataclasses.replace(NANO, name="nano-spec16", n_text_ctx=16)
    d16 = dataclasses.replace(DRAFT, name="nano-draft16", n_text_ctx=16)
    params = init_params(cfg16, jax.random.PRNGKey(3))
    draft = init_params(d16, jax.random.PRNGKey(11))
    _, _, mel, _ = setup
    prompt = jnp.asarray([cfg16.sot_sequence("zh", "transcribe")] * 3,
                         jnp.int32)
    cross_t = encode_cross_kv(params, mel, cfg16)
    cross_d = encode_cross_kv(draft, mel, d16)
    ref = greedy_decode_kv(params, cross_t, prompt, cfg16, max_tokens=None)
    got = speculative_decode_kv(params, cross_t, draft, cross_d, prompt,
                                cfg16, d16, gamma=4, max_tokens=None)
    assert np.array_equal(np.asarray(got.tokens), np.asarray(ref.tokens))
    assert np.array_equal(np.asarray(got.lengths), np.asarray(ref.lengths))


def test_pipeline_spec_draft_matches_plain(rng):
    """Pipeline-level wiring: spec_draft routes the greedy path through
    speculative_decode_kv and the transcript equals the plain pipeline's
    (same target weights). Filters+spec is rejected up front."""
    from whisper_tpu.pipeline import WhisperPipeline

    wav = (rng.standard_normal(12000) * 0.1).astype(np.float32)
    common = dict(model="test-nano", language="zh", compute_dtype="float32",
                  apply_filters=False, max_tokens=8,
                  no_speech_threshold=2.0, logprob_threshold=-1e9)
    plain = WhisperPipeline(**common)
    spec = WhisperPipeline(**common, spec_draft="test-nano", spec_gamma=3)
    r0 = plain.transcribe(wav)
    r1 = spec.transcribe(wav)
    assert r1.text == r0.text
    assert np.array_equal(r1.tokens, r0.tokens)
    s = spec.last_spec_stats
    assert s is not None and s["rounds"] >= 1 and s["drafted"] > 0

    with pytest.raises(ValueError):
        WhisperPipeline(model="test-nano", spec_draft="test-nano",
                        apply_filters=True)


def test_window_multipos_matches_sequential_steps(setup):
    """The verify primitive itself: a width-W window pass at per-row
    offsets produces the same logits and cache writes as W sequential
    1-wide multipos steps teacher-forced on the same tokens."""
    from whisper_tpu.models.model import (
        KVCache,
        decoder_step_multipos,
        decoder_window_multipos,
    )

    params, _, mel, prompt = setup
    cross = encode_cross_kv(params, mel, NANO)
    B, W = 3, 4
    # distinct per-row offsets (the continuous-batching shape)
    offs = jnp.asarray([5, 7, 6], jnp.int32)
    toks = jnp.asarray(np.arange(B * W).reshape(B, W) + 100, jnp.int32)

    kv_a = KVCache.create(NANO, B, ctx=NANO.n_text_ctx)
    logits_w, kv_a = decoder_window_multipos(params, toks, offs, kv_a,
                                             cross, NANO)

    kv_b = KVCache.create(NANO, B, ctx=NANO.n_text_ctx)
    seq_logits = []
    for j in range(W):
        lj, kv_b = decoder_step_multipos(params, toks[:, j], offs + j,
                                         kv_b, cross, NANO)
        seq_logits.append(np.asarray(lj))
    seq = np.stack(seq_logits, axis=1)  # (B, W, V)

    np.testing.assert_allclose(np.asarray(logits_w), seq,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(kv_a.k), np.asarray(kv_b.k),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(kv_a.v), np.asarray(kv_b.v),
                               rtol=2e-4, atol=2e-4)
