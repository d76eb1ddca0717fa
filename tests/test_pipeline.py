"""End-to-end pipeline tests on the nano config (random weights).

Mirrors the reference's minimum e2e slice (SURVEY.md §7 stage 3): demo.wav
through mel -> encoder -> greedy decode -> detokenize. With random weights the
text is meaningless; these tests assert the machinery — shapes, stop
conditions, batching consistency, determinism.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from whisper_tpu.config import WhisperConfig
from whisper_tpu.decode import detect_language, extract_texts, greedy_decode
from whisper_tpu.models.model import init_params
from whisper_tpu.ops.mel import log_mel_spectrogram

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


@pytest.fixture(scope="module")
def nano_params():
    return init_params(NANO)


def _mel(rng, b=1):
    return jnp.asarray(rng.standard_normal((b, NANO.n_mels, 2 * NANO.n_audio_ctx)).astype(np.float32))


def test_greedy_decode_shapes_and_stop(nano_params, rng):
    mel = _mel(rng, b=2)
    prompt = np.tile(np.asarray(NANO.sot_sequence("zh", "transcribe"), np.int32), (2, 1))
    res = greedy_decode(nano_params, mel, jnp.asarray(prompt), NANO)
    toks = np.asarray(res.tokens)
    lens = np.asarray(res.lengths)
    assert toks.shape == (2, NANO.n_text_ctx)
    assert (lens >= 4).all() and (lens <= NANO.n_text_ctx).all()
    # prompt preserved in the buffer
    np.testing.assert_array_equal(toks[:, :4], prompt)
    # everything at/after length is eot
    for b in range(2):
        if lens[b] < NANO.n_text_ctx:
            assert (toks[b, lens[b] :] == NANO.eot).all()


@pytest.mark.slow
def test_greedy_decode_deterministic(nano_params, rng):
    mel = _mel(rng)
    prompt = np.asarray([NANO.sot_sequence("en", "transcribe")], np.int32)
    r1 = greedy_decode(nano_params, mel, jnp.asarray(prompt), NANO)
    r2 = greedy_decode(nano_params, mel, jnp.asarray(prompt), NANO)
    np.testing.assert_array_equal(np.asarray(r1.tokens), np.asarray(r2.tokens))


def test_batch_matches_single(nano_params, rng):
    """batch-of-2 decode must equal each single decode (no cross-talk)."""
    mel2 = _mel(rng, b=2)
    prompt1 = np.asarray([NANO.sot_sequence("zh", "transcribe")], np.int32)
    prompt2 = np.tile(prompt1, (2, 1))
    both = greedy_decode(nano_params, mel2, jnp.asarray(prompt2), NANO)
    solo0 = greedy_decode(nano_params, mel2[:1], jnp.asarray(prompt1), NANO)
    solo1 = greedy_decode(nano_params, mel2[1:], jnp.asarray(prompt1), NANO)
    np.testing.assert_array_equal(np.asarray(both.tokens)[0], np.asarray(solo0.tokens)[0])
    np.testing.assert_array_equal(np.asarray(both.tokens)[1], np.asarray(solo1.tokens)[0])


def test_detect_language_output(nano_params, rng):
    mel = _mel(rng, b=2)
    idx, probs = detect_language(nano_params, mel, NANO)
    assert idx.shape == (2,)
    p = np.asarray(probs)
    assert p.shape == (2, NANO.num_languages)
    np.testing.assert_allclose(p.sum(axis=-1), 1.0, rtol=1e-5)


def test_extract_texts_stops_at_eot(nano_params, rng):
    class FakeTok:
        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    mel = _mel(rng)
    prompt = np.asarray([NANO.sot_sequence("zh", "transcribe")], np.int32)
    res = greedy_decode(nano_params, mel, jnp.asarray(prompt), NANO)
    texts = extract_texts(res, 4, FakeTok())
    assert len(texts) == 1
    ids = [int(s) for s in texts[0].split()] if texts[0] else []
    assert NANO.eot not in ids


def test_demo_wav_through_nano(demo_wav_path, nano_params):
    """Full path: real WAV -> mel -> decode on real audio (random weights)."""
    from whisper_tpu.ops.audio import load_audio

    wav = load_audio(demo_wav_path)
    mel = log_mel_spectrogram(jnp.asarray(wav))
    assert mel.shape == (1, 80, 3000)
    # nano ctx is 64 -> slice the mel to keep the test fast
    mel_small = mel[:, :, : 2 * NANO.n_audio_ctx]
    prompt = np.asarray([NANO.sot_sequence("zh", "transcribe")], np.int32)
    res = greedy_decode(nano_params, mel_small, jnp.asarray(prompt), NANO)
    assert np.asarray(res.tokens).shape == (1, NANO.n_text_ctx)


@pytest.mark.slow
def test_temperature_sampling_varies(nano_params, rng):
    """temperature>0 samples stochastically (different seeds differ),
    temperature=0 stays deterministic; avg_logprob populated."""
    mel = _mel(rng)
    prompt = np.asarray([NANO.sot_sequence("en", "transcribe")], np.int32)
    g0a = greedy_decode(nano_params, mel, jnp.asarray(prompt), NANO, max_tokens=10)
    g0b = greedy_decode(nano_params, mel, jnp.asarray(prompt), NANO, max_tokens=10)
    np.testing.assert_array_equal(np.asarray(g0a.tokens), np.asarray(g0b.tokens))
    assert np.isfinite(np.asarray(g0a.avg_logprob)).all()
    assert (np.asarray(g0a.avg_logprob) <= 0).all()

    t1 = greedy_decode(nano_params, mel, jnp.asarray(prompt), NANO,
                       max_tokens=10, temperature=1.0, seed=1)
    t2 = greedy_decode(nano_params, mel, jnp.asarray(prompt), NANO,
                       max_tokens=10, temperature=1.0, seed=2)
    assert not np.array_equal(np.asarray(t1.tokens), np.asarray(t2.tokens))


@pytest.mark.slow
def test_avg_logprob_matches_teacher_forced(nano_params, rng):
    """Greedy avg_logprob equals mean of per-token logprobs (no filters)."""
    import jax

    from whisper_tpu.models.model import (
        KVCache, compute_cross_kv, decoder_forward, encoder_forward)

    mel = _mel(rng)
    prompt = np.asarray([NANO.sot_sequence("zh", "transcribe")], np.int32)
    res = greedy_decode(nano_params, mel, jnp.asarray(prompt), NANO, max_tokens=8)
    toks = np.asarray(res.tokens)[0]
    P = 4
    # random weights never sample eot: exactly max_tokens=8 sampled tokens;
    # the buffer's trailing eots were never sampled and carry no logprob
    n_sampled = 8
    seq = toks[: P + n_sampled]

    audio = encoder_forward(nano_params, mel, NANO)
    ckv = compute_cross_kv(nano_params, audio, NANO)
    kv = KVCache.create(NANO, 1)
    logits, _ = decoder_forward(nano_params, jnp.asarray(seq[None, :-1]), 0, kv, ckv, NANO)
    lp = np.asarray(jax.nn.log_softmax(np.asarray(logits)[0], axis=-1))
    picked = lp[np.arange(P - 1, P + n_sampled - 1), seq[P:]]
    expect = picked.mean()
    got = float(np.asarray(res.avg_logprob)[0])
    assert abs(got - expect) < 1e-3
