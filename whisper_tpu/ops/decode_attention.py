"""Pallas TPU kernel: fused cross-attention for the decode step (int8 KV).

The decode loop reads the entire int8 cross-KV every token — at Turbo
batch 64 that is ~1 GB/step, the single largest HBM stream (BENCH_NOTES.md).
XLA's lowering of the M=1 attention einsums pays extra passes for the
dequant/score/softmax/weighted-sum chain; this kernel does the whole chain
in one VMEM-resident pass per (batch, head): load K/V int8 once, fold the
per-channel scales into q (K) and the output (V), full fp32 softmax over the
1500 audio positions, write back a single (1, dh) vector.

The reference has no analog — its cross-attention runs inside the opaque
quantized decoder graph one token at a time (model_convert/
export_onnx.py:302-387). Numerics match models.model.attention_int8kv
(the XLA path) and are covered by tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU too; guard for safety
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None


def _kernel(q_ref, ks_ref, vs_ref, kq_ref, vq_ref, o_ref, *, scale: float):
    """One (batch*head) program: int8-KV attention for a single query."""
    # fold K's per-channel scales into the query (exact: symmetric
    # per-(head, channel) quantization, same trick as attention_int8kv)
    qs = (q_ref[0].astype(jnp.float32) * ks_ref[0] * scale).astype(jnp.bfloat16)
    k = kq_ref[0].astype(jnp.bfloat16)                     # (T, dh)
    s = jax.lax.dot_general(
        k, qs, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                # (T, 1)

    m = jnp.max(s, axis=0, keepdims=True)
    p = jnp.exp(s - m)
    w = p / jnp.sum(p, axis=0, keepdims=True)              # (T, 1) fp32

    v = vq_ref[0].astype(jnp.float32)                      # (T, dh)
    o = jnp.sum(w * v, axis=0, keepdims=True)              # (1, dh)
    o_ref[0] = (o * vs_ref[0]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def cross_attention_decode(
    q: jnp.ndarray,    # (B, H, 1, dh) compute dtype
    k_q: jnp.ndarray,  # (B, H, T, dh) int8
    k_s: jnp.ndarray,  # (B, H, 1, dh) fp32
    v_q: jnp.ndarray,  # (B, H, T, dh) int8
    v_s: jnp.ndarray,  # (B, H, 1, dh) fp32
    interpret: bool = False,
) -> jnp.ndarray:
    """Single-query attention against int8 cross-KV; returns (B, H, 1, dh).

    Matches models.model.attention_int8kv numerics (no mask — cross
    attention is over the full audio context).
    """
    B, H, _, dh = q.shape
    T = k_q.shape[2]
    scale = dh ** -0.5

    qf = q.reshape(B * H, 1, dh)
    ksf = k_s.astype(jnp.float32).reshape(B * H, 1, dh)
    vsf = v_s.astype(jnp.float32).reshape(B * H, 1, dh)
    kqf = k_q.reshape(B * H, T, dh)
    vqf = v_q.reshape(B * H, T, dh)

    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=(B * H,),
        in_specs=[
            pl.BlockSpec((1, 1, dh), lambda b: (b, 0, 0), memory_space=_VMEM),
            pl.BlockSpec((1, 1, dh), lambda b: (b, 0, 0), memory_space=_VMEM),
            pl.BlockSpec((1, 1, dh), lambda b: (b, 0, 0), memory_space=_VMEM),
            pl.BlockSpec((1, T, dh), lambda b: (b, 0, 0), memory_space=_VMEM),
            pl.BlockSpec((1, T, dh), lambda b: (b, 0, 0), memory_space=_VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, dh), lambda b: (b, 0, 0), memory_space=_VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, 1, dh), q.dtype),
        interpret=interpret,
    )(qf, ksf, vsf, kqf, vqf)
    return out.reshape(B, H, 1, dh)
