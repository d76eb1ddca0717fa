"""Numerical parity: our JAX model vs torch (transformers) Whisper.

The reference validates numerics only via end-to-end WER; with no pretrained
weights available offline we instead prove architecture equivalence directly:
random-init a torch Whisper, convert its weights with the HF loader, and
compare activations layer-for-layer. Any future checkpoint load then
inherits this parity.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from whisper_tpu.config import WhisperConfig
from whisper_tpu.models.checkpoint import from_hf_state_dict
from whisper_tpu.models.model import (
    KVCache,
    compute_cross_kv,
    decoder_forward,
    encoder_forward,
    init_params,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

CFG = WhisperConfig(
    name="parity-nano",
    n_mels=80,
    n_audio_ctx=48,
    n_audio_state=64,
    n_audio_head=2,
    n_audio_layer=2,
    n_vocab=128,
    n_text_ctx=32,
    n_text_state=64,
    n_text_head=2,
    n_text_layer=2,
)


@pytest.fixture(scope="module")
def torch_model():
    hf_cfg = transformers.WhisperConfig(
        vocab_size=CFG.n_vocab,
        num_mel_bins=CFG.n_mels,
        encoder_layers=CFG.n_audio_layer,
        encoder_attention_heads=CFG.n_audio_head,
        decoder_layers=CFG.n_text_layer,
        decoder_attention_heads=CFG.n_text_head,
        d_model=CFG.n_audio_state,
        encoder_ffn_dim=4 * CFG.n_audio_state,
        decoder_ffn_dim=4 * CFG.n_text_state,
        max_source_positions=CFG.n_audio_ctx,
        max_target_positions=CFG.n_text_ctx,
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=2,
        decoder_start_token_id=3,
        suppress_tokens=[],
        begin_suppress_tokens=[],
    )
    torch.manual_seed(7)
    m = transformers.WhisperModel(hf_cfg)
    m.eval()
    return m


@pytest.fixture(scope="module")
def params(torch_model):
    sd = {k: v.detach().float().numpy() for k, v in torch_model.state_dict().items()}
    return from_hf_state_dict(sd, CFG)


def test_encoder_parity(torch_model, params, rng):
    mel = rng.standard_normal((2, CFG.n_mels, 2 * CFG.n_audio_ctx)).astype(np.float32)
    with torch.no_grad():
        ref = torch_model.encoder(torch.from_numpy(mel)).last_hidden_state.numpy()
    got = np.asarray(encoder_forward(params, jnp.asarray(mel), CFG))
    assert got.shape == ref.shape == (2, CFG.n_audio_ctx, CFG.n_audio_state)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_decoder_prefill_parity(torch_model, params, rng):
    mel = rng.standard_normal((2, CFG.n_mels, 2 * CFG.n_audio_ctx)).astype(np.float32)
    ids = rng.integers(0, CFG.n_vocab, size=(2, 7)).astype(np.int64)
    with torch.no_grad():
        enc = torch_model.encoder(torch.from_numpy(mel)).last_hidden_state
        dec = torch_model.decoder(
            input_ids=torch.from_numpy(ids), encoder_hidden_states=enc
        ).last_hidden_state
        ref_logits = (dec @ torch_model.decoder.embed_tokens.weight.T).numpy()

    audio = encoder_forward(params, jnp.asarray(mel), CFG)
    ckv = compute_cross_kv(params, audio, CFG)
    kv = KVCache.create(CFG, 2)
    logits, kv = decoder_forward(
        params, jnp.asarray(ids.astype(np.int32)), 0, kv, ckv, CFG
    )
    got = np.asarray(logits)
    assert got.shape == ref_logits.shape
    np.testing.assert_allclose(got, ref_logits, rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_incremental_matches_prefill(params, rng):
    """KV-cached single-token steps must equal one multi-token prefill."""
    mel = rng.standard_normal((1, CFG.n_mels, 2 * CFG.n_audio_ctx)).astype(np.float32)
    ids = rng.integers(0, CFG.n_vocab, size=(1, 6)).astype(np.int32)

    audio = encoder_forward(params, jnp.asarray(mel), CFG)
    ckv = compute_cross_kv(params, audio, CFG)

    kv = KVCache.create(CFG, 1)
    full_logits, _ = decoder_forward(params, jnp.asarray(ids), 0, kv, ckv, CFG)

    kv = KVCache.create(CFG, 1)
    step_logits = []
    for s in range(ids.shape[1]):
        lg, kv = decoder_forward(params, jnp.asarray(ids[:, s : s + 1]), s, kv, ckv, CFG)
        step_logits.append(np.asarray(lg)[:, 0])
    step_logits = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(step_logits, np.asarray(full_logits), rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_chunked_prefill_matches(params, rng):
    """Prefill in two chunks at the right offsets == one-shot prefill."""
    mel = rng.standard_normal((1, CFG.n_mels, 2 * CFG.n_audio_ctx)).astype(np.float32)
    ids = rng.integers(0, CFG.n_vocab, size=(1, 8)).astype(np.int32)
    audio = encoder_forward(params, jnp.asarray(mel), CFG)
    ckv = compute_cross_kv(params, audio, CFG)

    kv = KVCache.create(CFG, 1)
    full, _ = decoder_forward(params, jnp.asarray(ids), 0, kv, ckv, CFG)

    kv = KVCache.create(CFG, 1)
    a, kv = decoder_forward(params, jnp.asarray(ids[:, :5]), 0, kv, ckv, CFG)
    b, kv = decoder_forward(params, jnp.asarray(ids[:, 5:]), 5, kv, ckv, CFG)
    got = np.concatenate([np.asarray(a), np.asarray(b)], axis=1)
    np.testing.assert_allclose(got, np.asarray(full), rtol=1e-4, atol=1e-4)


def test_bf16_islands_stay_close(params, rng):
    """bf16 compute with fp32 islands tracks the fp32 path."""
    mel = rng.standard_normal((1, CFG.n_mels, 2 * CFG.n_audio_ctx)).astype(np.float32)
    f32 = np.asarray(encoder_forward(params, jnp.asarray(mel), CFG, jnp.float32))
    bf16 = np.asarray(encoder_forward(params, jnp.asarray(mel), CFG, jnp.bfloat16))
    # relative error should be bf16-level, not catastrophic
    denom = np.maximum(np.abs(f32), 1e-2)
    assert np.median(np.abs(bf16 - f32) / denom) < 0.05


def test_init_params_shapes():
    p = init_params(CFG)
    assert p["encoder"]["blocks"]["attn"]["wq"].shape == (2, 64, 64)
    assert p["decoder"]["tok_emb"].shape == (CFG.n_vocab, 64)
    assert p["decoder"]["blocks"]["cross"]["wk"].shape == (2, 64, 64)


def test_gelu_tanh_knob_stays_close(params, rng, monkeypatch):
    """WHISPER_TPU_GELU=tanh is an opt-in approximation: output stays close
    to the exact-erf default (which must be byte-identical when unset)."""
    mel = rng.standard_normal((1, CFG.n_mels, 2 * CFG.n_audio_ctx)).astype(np.float32)
    exact = np.asarray(encoder_forward(params, jnp.asarray(mel), CFG, jnp.float32))
    monkeypatch.setenv("WHISPER_TPU_GELU", "tanh")
    approx = np.asarray(encoder_forward(params, jnp.asarray(mel), CFG, jnp.float32))
    denom = np.maximum(np.abs(exact), 1e-2)
    assert np.median(np.abs(approx - exact) / denom) < 0.02
    assert not np.array_equal(approx, exact)  # the knob actually switched paths
