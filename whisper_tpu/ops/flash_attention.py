"""Pallas TPU kernel: encoder self/cross attention without HBM score
materialization.

XLA's stock attention writes the (T, T) score matrix to HBM twice (softmax
in, weights out) — at Whisper's 1500-frame audio context that is ~9 MB per
(batch, head) per direction, pure bandwidth waste. Every Whisper size has
head_dim = 64 and audio ctx 1500, so one query tile (128, 64), the full K/V
(1536, 64) and the full score tile all fit in VMEM together: this kernel
computes q·Kᵀ -> masked fp32 softmax -> ·V entirely on-chip, one pass, no
online-softmax bookkeeping needed.

Used for the encoder's bidirectional self-attention (models.model.
encoder_forward) and applicable to decoder cross-attention; falls back to the
jnp path off-TPU (tests run both and compare, plus interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU too; guard for safety
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

Q_TILE = 512  # measured on v5e: 512 is ~11% faster than 128 at turbo size
_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, kv_len: int, kv_pad: int, scale: float):
    """One (batch*head, q-tile) program: full-softmax attention in VMEM."""
    q = q_ref[0].astype(jnp.float32) * scale              # (TQ, dh)
    k = k_ref[0].astype(jnp.float32)                      # (Tk_pad, dh)
    v = v_ref[0]                                          # (Tk_pad, dh)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)               # (TQ, Tk_pad)
    if kv_pad > kv_len:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, jnp.float32(-1e30))

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    w = (p / denom).astype(v.dtype)
    o = jax.lax.dot_general(
        w, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "q_tile"))
def flash_attention(
    q: jnp.ndarray,  # (B, H, Tq, dh)
    k: jnp.ndarray,  # (B, H, Tk, dh)
    v: jnp.ndarray,  # (B, H, Tk, dh)
    interpret: bool = False,
    q_tile: int = Q_TILE,
) -> jnp.ndarray:
    """Bidirectional (no causal mask) attention; softmax in fp32.

    Matches models.model.attention numerics: q scaled by dh^-0.5, fp32
    softmax, output in v.dtype.
    """
    B, H, Tq, dh = q.shape
    Tk = k.shape[2]
    scale = dh ** -0.5

    tq_pad = _round_up(max(Tq, 8), q_tile if Tq >= q_tile else 8)
    tk_pad = _round_up(max(Tk, 8), _LANE)
    q_tile = min(q_tile, tq_pad)

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, tq_pad - Tq), (0, 0))).reshape(B * H, tq_pad, dh)
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, tk_pad - Tk), (0, 0))).reshape(B * H, tk_pad, dh)
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, tk_pad - Tk), (0, 0))).reshape(B * H, tk_pad, dh)

    grid = (B * H, tq_pad // q_tile)
    kernel = functools.partial(_attn_kernel, kv_len=Tk, kv_pad=tk_pad, scale=scale)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_tile, dh), lambda b, i: (b, i, 0), memory_space=_VMEM),
            pl.BlockSpec((1, tk_pad, dh), lambda b, i: (b, 0, 0), memory_space=_VMEM),
            pl.BlockSpec((1, tk_pad, dh), lambda b, i: (b, 0, 0), memory_space=_VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_tile, dh), lambda b, i: (b, i, 0), memory_space=_VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, tq_pad, dh), v.dtype),
        interpret=interpret,
    )(qp, kp, vp)
    return out.reshape(B, H, tq_pad, dh)[:, :, :Tq, :]


def use_flash() -> bool:
    """Flash path is for real TPU backends (incl. the axon tunnel)."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False
