"""Pallas kernel golden tests (interpret mode on CPU; the same kernels
compile for TPU — exercised by bench.py / entry points on hardware)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_tpu.config import HOP_LENGTH, N_FFT
from whisper_tpu.models.model import attention
from whisper_tpu.ops.flash_attention import flash_attention
from whisper_tpu.ops.mel import _power_spectrum, mel_filterbank
from whisper_tpu.ops.mel_pallas import log10_mel_pallas


def test_flash_attention_matches_reference(rng):
    B, H, T, dh = 2, 3, 200, 64
    q = jnp.asarray(rng.standard_normal((B, H, T, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, T, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, T, dh)).astype(np.float32))
    ref = np.asarray(attention(q, k, v))
    got = np.asarray(flash_attention(q, k, v, interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_flash_attention_cross_shape(rng):
    """Tq != Tk (cross-attention layout)."""
    B, H, dh = 1, 2, 64
    q = jnp.asarray(rng.standard_normal((B, H, 64, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, 300, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, 300, dh)).astype(np.float32))
    ref = np.asarray(attention(q, k, v))
    got = np.asarray(flash_attention(q, k, v, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_flash_attention_bf16(rng):
    B, H, T, dh = 1, 2, 128, 64
    mk = lambda: jnp.asarray(
        rng.standard_normal((B, H, T, dh)).astype(np.float32)).astype(jnp.bfloat16)
    q, k, v = mk(), mk(), mk()
    ref = np.asarray(attention(q, k, v)).astype(np.float32)
    got = np.asarray(flash_attention(q, k, v, interpret=True)).astype(np.float32)
    denom = np.maximum(np.abs(ref), 1e-1)
    assert np.median(np.abs(got - ref) / denom) < 0.05


def test_cross_attention_decode_matches_int8kv(rng):
    from whisper_tpu.models.model import attention_int8kv, quantize_cross_kv
    from whisper_tpu.ops.decode_attention import cross_attention_decode

    B, H, T, dh = 2, 3, 300, 64
    q = jnp.asarray(rng.standard_normal((B, H, 1, dh)).astype(np.float32))
    ck = jnp.asarray(rng.standard_normal((1, B, H, T, dh)).astype(np.float32))
    cv = jnp.asarray(rng.standard_normal((1, B, H, T, dh)).astype(np.float32))
    k_q, k_s, v_q, v_s = quantize_cross_kv((ck, cv))
    args = (q, k_q[0], k_s[0], v_q[0], v_s[0])
    ref = np.asarray(attention_int8kv(*args))
    got = np.asarray(cross_attention_decode(*args, interpret=True))
    assert got.shape == ref.shape == (B, H, 1, dh)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_cross_attention_decode_bf16_query(rng):
    from whisper_tpu.models.model import attention_int8kv, quantize_cross_kv
    from whisper_tpu.ops.decode_attention import cross_attention_decode

    B, H, T, dh = 1, 2, 128, 64
    q = jnp.asarray(rng.standard_normal((B, H, 1, dh)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    ck = jnp.asarray(rng.standard_normal((1, B, H, T, dh)).astype(np.float32))
    cv = jnp.asarray(rng.standard_normal((1, B, H, T, dh)).astype(np.float32))
    k_q, k_s, v_q, v_s = quantize_cross_kv((ck, cv))
    args = (q, k_q[0], k_s[0], v_q[0], v_s[0])
    ref = np.asarray(attention_int8kv(*args)).astype(np.float32)
    got = np.asarray(cross_attention_decode(*args, interpret=True)).astype(np.float32)
    assert got.dtype == ref.dtype
    denom = np.maximum(np.abs(ref), 1e-1)
    assert np.median(np.abs(got - ref) / denom) < 0.05


def test_self_attention_decode_matches_masked_attention(rng):
    from whisper_tpu.ops.decode_attention import self_attention_decode

    B, H, T, dh = 3, 2, 64, 64
    q = jnp.asarray(rng.standard_normal((B, H, 1, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, T, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, T, dh)).astype(np.float32))
    offsets = jnp.asarray([0, 13, T - 1], jnp.int32)
    vis = (jnp.arange(T)[None, :] <= offsets[:, None])[:, None, None, :]
    ref = np.asarray(attention(q, k, v, mask=vis))
    got = np.asarray(self_attention_decode(q, k, v, offsets, interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_self_attention_decode_scalar_offset(rng):
    from whisper_tpu.ops.decode_attention import self_attention_decode

    B, H, T, dh = 2, 2, 32, 64
    mk = lambda s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    q, k, v = mk((B, H, 1, dh)), mk((B, H, T, dh)), mk((B, H, T, dh))
    vis = (jnp.arange(T) <= 7)[None, None, None, :]
    ref = np.asarray(attention(q, k, v, mask=vis))
    got = np.asarray(self_attention_decode(q, k, v, 7, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_fused_mel_matches_jnp(rng):
    n = 16000 * 2
    x = (rng.standard_normal(n) * 0.2).astype(np.float32)
    xp = jnp.pad(jnp.asarray(x)[None], ((0, 0), (N_FFT // 2, N_FFT // 2)),
                 mode="reflect")
    n_frames = 1 + n // HOP_LENGTH

    power = _power_spectrum(xp, N_FFT, HOP_LENGTH, n_frames=n_frames)
    fb = jnp.asarray(mel_filterbank(80, N_FFT))
    ref = np.asarray(jnp.log10(jnp.maximum(
        jnp.einsum("mf,bft->bmt", fb, power), 1e-10)))

    got = np.asarray(log10_mel_pallas(xp, n_mels=80, n_frames=n_frames,
                                      interpret=True))
    assert got.shape == ref.shape == (1, 80, n_frames)
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)


def test_fused_mel_batched(rng):
    xs = (rng.standard_normal((3, 16000)) * 0.2).astype(np.float32)
    xp = jnp.pad(jnp.asarray(xs), ((0, 0), (N_FFT // 2, N_FFT // 2)), mode="reflect")
    n_frames = 1 + 16000 // HOP_LENGTH
    got = np.asarray(log10_mel_pallas(xp, n_mels=80, n_frames=n_frames, interpret=True))
    assert got.shape == (3, 80, n_frames)
    # per-batch rows differ (no cross-batch contamination)
    assert not np.allclose(got[0], got[1])


def test_cross_attention_decode_vpu_matches_int8kv(rng):
    """VPU-reduction variant of the decode kernel matches the XLA int8 path."""
    import jax.numpy as jnp

    from whisper_tpu.models.model import attention_int8kv, quantize_cross_kv
    from whisper_tpu.ops.decode_attention import cross_attention_decode

    B, H, T, dh = 2, 4, 96, 64
    q = jnp.asarray(rng.standard_normal((B, H, 1, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, B, H, T, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, B, H, T, dh)).astype(np.float32))
    kq, ks, vq, vs = quantize_cross_kv((k, v))
    args = (q, kq[0], ks[0], vq[0], vs[0])
    ref = np.asarray(attention_int8kv(*args))
    got = np.asarray(cross_attention_decode(*args, interpret=True, use_vpu=True))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_flash_attention_btd_matches_reference(rng):
    """Layout-direct kernel (B, T, D) must match jnp attention on split heads,
    including a ragged last q tile (T not a multiple of q_tile)."""
    import jax.numpy as jnp

    from whisper_tpu.models.model import _merge_heads, _split_heads, attention
    from whisper_tpu.ops.flash_attention import flash_attention_btd

    B, T, D, H = 2, 150, 128, 2
    q = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    ref = np.asarray(_merge_heads(attention(
        _split_heads(q, H), _split_heads(k, H), _split_heads(v, H))))
    got = np.asarray(flash_attention_btd(q, k, v, H, interpret=True, q_tile=64))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_cross_attention_decode_fd_matches_int8kv(rng):
    """Flash-decode kernel (tiled online softmax, ragged last tile) must
    match the XLA int8-KV attention."""
    from whisper_tpu.models.model import attention_int8kv, quantize_cross_kv
    from whisper_tpu.ops.decode_attention import cross_attention_decode_fd

    B, H, T, dh = 2, 3, 300, 64  # T=300 with t_tile=128 -> ragged tail of 44
    q = jnp.asarray(rng.standard_normal((B, H, 1, dh)).astype(np.float32))
    ck = jnp.asarray(rng.standard_normal((1, B, H, T, dh)).astype(np.float32))
    cv = jnp.asarray(rng.standard_normal((1, B, H, T, dh)).astype(np.float32))
    k_q, k_s, v_q, v_s = quantize_cross_kv((ck, cv))
    args = (q, k_q[0], k_s[0], v_q[0], v_s[0])
    ref = np.asarray(attention_int8kv(*args))
    got = np.asarray(cross_attention_decode_fd(*args, interpret=True,
                                               t_tile=128))
    assert got.shape == ref.shape == (B, H, 1, dh)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_cross_attention_decode_fd_bf16(rng):
    from whisper_tpu.models.model import attention_int8kv, quantize_cross_kv
    from whisper_tpu.ops.decode_attention import cross_attention_decode_fd

    B, H, T, dh = 1, 2, 256, 64
    q = jnp.asarray(rng.standard_normal((B, H, 1, dh)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    ck = jnp.asarray(rng.standard_normal((1, B, H, T, dh)).astype(np.float32))
    cv = jnp.asarray(rng.standard_normal((1, B, H, T, dh)).astype(np.float32))
    k_q, k_s, v_q, v_s = quantize_cross_kv((ck, cv))
    args = (q, k_q[0], k_s[0], v_q[0], v_s[0])
    ref = np.asarray(attention_int8kv(*args)).astype(np.float32)
    got = np.asarray(cross_attention_decode_fd(*args, interpret=True,
                                               t_tile=128)).astype(np.float32)
    assert got.dtype == ref.dtype
    denom = np.maximum(np.abs(ref), 1e-1)
    assert np.median(np.abs(got - ref) / denom) < 0.05


def test_cross_attention_decode_dense_matches_int8kv(rng):
    """Block-diagonal dense-Q MXU variant must extract each head's own
    column (no cross-head leakage) and match the XLA path."""
    from whisper_tpu.models.model import attention_int8kv, quantize_cross_kv
    from whisper_tpu.ops.decode_attention import cross_attention_decode_dense

    B, H, T, dh = 2, 3, 300, 64
    q = jnp.asarray(rng.standard_normal((B, H, 1, dh)).astype(np.float32))
    ck = jnp.asarray(rng.standard_normal((1, B, H, T, dh)).astype(np.float32))
    cv = jnp.asarray(rng.standard_normal((1, B, H, T, dh)).astype(np.float32))
    k_q, k_s, v_q, v_s = quantize_cross_kv((ck, cv))
    args = (q, k_q[0], k_s[0], v_q[0], v_s[0])
    ref = np.asarray(attention_int8kv(*args)).astype(np.float32)
    got = np.asarray(cross_attention_decode_dense(*args, interpret=True)
                     ).astype(np.float32)
    assert got.shape == ref.shape
    denom = np.maximum(np.abs(ref), 1e-1)
    assert np.median(np.abs(got - ref) / denom) < 0.05


def test_flash_attention_btd_sharded_matches_reference(rng):
    """BTD kernel under shard_map on a (data, model) mesh: batch over data,
    head-major D columns over model — per-shard head tiling must reproduce
    the unsharded attention exactly (dh=64, the real Whisper head dim)."""
    from whisper_tpu.models.model import _merge_heads, _split_heads
    from whisper_tpu.ops.flash_attention import flash_attention_btd_sharded
    from whisper_tpu.parallel.sharding import make_mesh

    B, T, H, dh = 4, 96, 8, 64
    D = H * dh
    mesh = make_mesh(2, 4)  # 8 CPU devices: data=2 x model=4 -> 2 local heads
    mk = lambda: jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    q, k, v = mk(), mk(), mk()
    ref = np.asarray(_merge_heads(attention(
        _split_heads(q, H), _split_heads(k, H), _split_heads(v, H))))
    got = np.asarray(flash_attention_btd_sharded(q, k, v, H, mesh,
                                                 interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_encoder_forward_btd_sharded_matches_unsharded(rng):
    """encoder_forward with the active mesh set dispatches the BTD kernel
    through shard_map and must match the plain XLA path."""
    import os

    import whisper_tpu.ops.flash_attention as fa
    from whisper_tpu.config import WhisperConfig
    from whisper_tpu.models.model import encoder_forward, init_params
    from whisper_tpu.parallel.sharding import (
        make_mesh,
        set_active_mesh,
        shard_params,
    )

    cfg = WhisperConfig(
        name="btd-shard", n_mels=80, n_audio_ctx=32, n_audio_state=256,
        n_audio_head=4, n_audio_layer=2, n_vocab=1024, n_text_ctx=16,
        n_text_state=256, n_text_head=4, n_text_layer=2)
    params = init_params(cfg, jax.random.PRNGKey(0))
    mel = jnp.asarray(
        rng.standard_normal((2, cfg.n_mels, 2 * cfg.n_audio_ctx)).astype(np.float32))
    ref = np.asarray(encoder_forward(params, mel, cfg, jnp.float32))

    mesh = make_mesh(4, 2)
    old_flash, old_interp = os.environ.get("WHISPER_TPU_FLASH"), fa.INTERPRET
    os.environ["WHISPER_TPU_FLASH"] = "btd"
    fa.INTERPRET = True
    set_active_mesh(mesh)
    try:
        sp = shard_params(params, mesh, cfg)
        got = np.asarray(encoder_forward(sp, mel, cfg, jnp.float32))
    finally:
        set_active_mesh(None)
        fa.INTERPRET = old_interp
        if old_flash is None:
            os.environ.pop("WHISPER_TPU_FLASH", None)
        else:
            os.environ["WHISPER_TPU_FLASH"] = old_flash
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)
