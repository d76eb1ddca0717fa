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


def _self_kernel(off_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float, n_head: int):
    """One (batch*head) program: masked self-attention for a single query.

    ``off_ref`` (SMEM, scalar-prefetched) holds each stream's current write
    position; cache slots beyond it are masked (matches the visibility rule
    key_pos <= offset in models.model.decoder_forward)."""
    b = pl.program_id(0)
    off = off_ref[b // n_head]
    q = q_ref[0].astype(jnp.float32) * scale               # (1, dh)
    k = k_ref[0].astype(jnp.float32)                       # (T, dh)
    s = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                # (T, 1)
    pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    s = jnp.where(pos <= off, s, jnp.float32(-1e30))

    m = jnp.max(s, axis=0, keepdims=True)
    p = jnp.exp(s - m)
    w = p / jnp.sum(p, axis=0, keepdims=True)              # (T, 1) fp32

    v = v_ref[0].astype(jnp.float32)                       # (T, dh)
    o = jnp.sum(w * v, axis=0, keepdims=True)              # (1, dh)
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def self_attention_decode(
    q: jnp.ndarray,        # (B, H, 1, dh) compute dtype
    k: jnp.ndarray,        # (B, H, T, dh) cache dtype (bf16/fp32)
    v: jnp.ndarray,        # (B, H, T, dh)
    offsets: jnp.ndarray,  # (B,) or scalar int32: per-stream attend position
    interpret: bool = False,
) -> jnp.ndarray:
    """Single-query masked self-attention over the KV cache.

    Equivalent to models.model.attention(q, k, v, mask=key_pos <= offset)
    for S=1 queries; reads the cache once in VMEM instead of XLA's
    mask-materialize + M=1 einsum chain. Returns (B, H, 1, dh) in q.dtype.
    """
    B, H, _, dh = q.shape
    T = k.shape[2]
    scale = dh ** -0.5
    offs = jnp.broadcast_to(jnp.asarray(offsets, jnp.int32), (B,))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * H,),
        in_specs=[
            pl.BlockSpec((1, 1, dh), lambda b, offs: (b, 0, 0)),
            pl.BlockSpec((1, T, dh), lambda b, offs: (b, 0, 0)),
            pl.BlockSpec((1, T, dh), lambda b, offs: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, dh), lambda b, offs: (b, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_self_kernel, scale=scale, n_head=H),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * H, 1, dh), q.dtype),
        interpret=interpret,
    )(offs, q.reshape(B * H, 1, dh), k.reshape(B * H, T, dh),
      v.reshape(B * H, T, dh))
    return out.reshape(B, H, 1, dh)


def _kernel(q_ref, ks_ref, vs_ref, kq_ref, vq_ref, o_ref, *,
            scale: float, n_head: int, dh: int):
    """One program = all ``n_head`` heads of one (batch, head-group) slice.

    K/V arrive TRANSPOSED (H*dh, T): the audio axis is minor, so each VMEM
    row is T contiguous bytes (1500) — the (T, dh) layout's 64-byte rows made
    the HBM reads 1.7x slower than XLA's stock lowering. Heads are batched
    into one grid cell (static in-kernel loop) because a per-(batch, head)
    grid is 5120 steps/token at Turbo B64 and step overhead dominated. Both
    reductions per head are MXU dots. All-f32: Mosaic's M=1 matmul lowering
    rejects mixed bf16->f32.
    """
    # fold K's per-channel scales into the query (exact: symmetric
    # per-(head, channel) quantization, same trick as attention_int8kv).
    # Dots run in the query's compute dtype with fp32 accumulation —
    # casting operands up to fp32 first forces multi-pass MXU emulation
    # (see flash_attention); bf16 rounding here is below the int8
    # quantization error.
    cdt = q_ref.dtype
    qs = (q_ref[0].astype(jnp.float32) * ks_ref[0] * scale).astype(cdt)
    outs = []
    for g in range(n_head):
        k = kq_ref[0, g * dh:(g + 1) * dh, :].astype(cdt)  # (dh, T)
        s = jax.lax.dot_general(
            qs[g:g + 1], k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (1, T) f32
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        w = (p / jnp.sum(p, axis=1, keepdims=True)).astype(cdt)

        v = vq_ref[0, g * dh:(g + 1) * dh, :].astype(cdt)  # (dh, T)
        outs.append(jax.lax.dot_general(
            w, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32))           # (1, dh)
    o = jnp.concatenate(outs, axis=0)                      # (H, dh)
    o_ref[0] = (o * vs_ref[0]).astype(o_ref.dtype)


def _kernel_vpu(q_ref, ks_ref, vs_ref, kq_ref, vq_ref, o_ref, *,
                scale: float, n_head: int, dh: int):
    """VPU variant of ``_kernel``: the M=1 MXU dots waste 127/128 of the
    systolic array per pass, so scores and the weighted sum are computed as
    broadcast-multiply + axis reductions on the vector unit instead. The op
    is HBM-bound (streaming the int8 K/V); the point is to keep compute off
    the critical path so the DMA pipeline runs at full bandwidth."""
    qs = q_ref[0].astype(jnp.float32) * ks_ref[0] * scale  # (H, dh)
    outs = []
    for g in range(n_head):
        k = kq_ref[0, g * dh:(g + 1) * dh, :].astype(jnp.float32)  # (dh, T)
        # scores: reduce over dh (sublane axis) — pure VPU
        s = jnp.sum(k * qs[g][:, None], axis=0, keepdims=True)     # (1, T)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        w = p / jnp.sum(p, axis=1, keepdims=True)                  # (1, T)
        v = vq_ref[0, g * dh:(g + 1) * dh, :].astype(jnp.float32)  # (dh, T)
        outs.append(jnp.sum(v * w, axis=1, keepdims=True).T)       # (1, dh)
    o = jnp.concatenate(outs, axis=0)                              # (H, dh)
    o_ref[0] = (o * vs_ref[0]).astype(o_ref.dtype)


def _fd_kernel(q_ref, vs_ref, k_ref, v_ref, o_ref,
               m_ref, d_ref, acc_ref, *,
               n_head: int, dh: int, t_valid: int, t_tile: int):
    """Flash-decode tile: online-softmax cross-attention for one batch row.

    Grid is (B, nT) with the T axis innermost; the kernel sees one
    (H*dh, t_tile) int8 slab of K and V per step and keeps running
    max/denominator/output in VMEM scratch across the T tiles of a row.

    All reductions are VPU (grouped sublane adds for scores, lane reduction
    for the weighted sum): the M=1-per-head matvecs that XLA and the legacy
    kernels push through the MXU are ingest-bound at the MXU's streaming
    rate (~0.5 elem/lane/cycle), below HBM bandwidth — the VPU's 8x128 ALUs
    are the only unit wide enough to keep the int8 KV stream DMA-bound.
    """
    t = pl.program_id(1)
    nT = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        d_ref[:] = jnp.zeros_like(d_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # scores: each head's dh K rows scaled by the (scale-folded) query and
    # group-reduced over the sublane axis -> (H, t_tile). One convert + one
    # multiply + one add per K byte.
    k3 = k_ref[0].reshape(n_head, dh, t_tile).astype(jnp.float32)
    s = jnp.sum(k3 * q_ref[0][:, :, None], axis=1)       # (H, Tt)

    # mask the ragged tail of the last tile (T=1500 is not tile-aligned)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + t * t_tile
    s = jnp.where(col < t_valid, s, jnp.float32(-1e30))

    m_prev = m_ref[:]                                    # (H, 1)
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    corr = jnp.exp(m_prev - m_new)                       # (H, 1)
    p = jnp.exp(s - m_new)                               # (H, Tt)
    d_ref[:] = d_ref[:] * corr + jnp.sum(p, axis=1, keepdims=True)
    m_ref[:] = m_new

    # weighted V sum: broadcast p over each head's dh rows, multiply,
    # reduce over the lane (T) axis -> (H, dh)
    v3 = v_ref[0].reshape(n_head, dh, t_tile).astype(jnp.float32)
    ov = jnp.sum(v3 * p[:, None, :], axis=2)             # (H, dh)
    acc_ref[:] = acc_ref[:] * corr + ov

    @pl.when(t == nT - 1)
    def _():
        o = acc_ref[:] / jnp.maximum(d_ref[:], 1e-30)    # (H, dh)
        o_ref[0] = (o * vs_ref[0]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "t_tile"))
def cross_attention_decode_fd(
    q: jnp.ndarray,    # (B, H, 1, dh) compute dtype
    k_q: jnp.ndarray,  # (B, H, dh, T) int8 (transposed, quantize_cross_kv)
    k_s: jnp.ndarray,  # (B, H, 1, dh) fp32
    v_q: jnp.ndarray,  # (B, H, dh, T) int8 (transposed)
    v_s: jnp.ndarray,  # (B, H, 1, dh) fp32
    interpret: bool = False,
    t_tile: int = 512,
) -> jnp.ndarray:
    """Flash-decode single-query attention against int8 cross-KV.

    Numerics match models.model.attention_int8kv (exact scale folding; the
    online softmax recombination is fp32). Returns (B, H, 1, dh) in q.dtype.
    """
    B, H, _, dh = q.shape
    T = k_q.shape[-1]
    scale = dh ** -0.5
    nT = -(-T // t_tile)

    # fold K scales + 1/sqrt(dh) into the query once, on the XLA side
    qs = (q[:, :, 0].astype(jnp.float32) * k_s[:, :, 0] * scale)  # (B, H, dh)
    vs = v_s[:, :, 0].astype(jnp.float32)                          # (B, H, dh)
    kqf = k_q.reshape(B, H * dh, T)
    vqf = v_q.reshape(B, H * dh, T)

    out = pl.pallas_call(
        functools.partial(_fd_kernel, n_head=H, dh=dh, t_valid=T,
                          t_tile=t_tile),
        grid=(B, nT),
        in_specs=[
            pl.BlockSpec((1, H, dh), lambda b, t: (b, 0, 0),
                         memory_space=_VMEM),
            pl.BlockSpec((1, H, dh), lambda b, t: (b, 0, 0),
                         memory_space=_VMEM),
            pl.BlockSpec((1, H * dh, t_tile), lambda b, t: (b, 0, t),
                         memory_space=_VMEM),
            pl.BlockSpec((1, H * dh, t_tile), lambda b, t: (b, 0, t),
                         memory_space=_VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, dh), lambda b, t: (b, 0, 0),
                               memory_space=_VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, dh), q.dtype),
        scratch_shapes=([
            pltpu.VMEM((H, 1), jnp.float32),     # running max
            pltpu.VMEM((H, 1), jnp.float32),     # running denominator
            pltpu.VMEM((H, dh), jnp.float32),    # running output
        ] if pltpu is not None else []),
        interpret=interpret,
    )(qs.reshape(B, H, dh), vs.reshape(B, H, dh), kqf, vqf)
    return out.reshape(B, H, 1, dh)


def _dense_kernel(qd_ref, vs_ref, k_ref, v_ref, o_ref, *,
                  n_head: int, dh: int):
    """Dense block-diagonal MXU variant: one batch row per grid cell.

    The per-head (1, dh) @ (dh, T) matvecs become ONE (H, H*dh) @ (H*dh, T)
    matmul against a block-diagonal query matrix (zeros off each head's dh
    columns) — 20x redundant MACs, but the MXU is FLOP-rich and this turns
    240 M=1 passes into 120 M=20 passes. Measures whether MXU pass count or
    streamed elements dominate; the VPU flash-decode kernel is the
    theoretically DMA-bound design."""
    cdt = jnp.bfloat16
    s = jax.lax.dot_general(
        qd_ref[0].astype(cdt), k_ref[0].astype(cdt),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (H, T)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    w = (p / jnp.sum(p, axis=1, keepdims=True)).astype(cdt)
    ovt = jax.lax.dot_general(
        v_ref[0].astype(cdt), w,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (H*dh, H)
    # extract each head's own column: o[h, d] = ovt[h*dh + d, h]
    ov = ovt.reshape(n_head, dh, n_head)
    hsel = (jax.lax.broadcasted_iota(jnp.int32, ov.shape, 0)
            == jax.lax.broadcasted_iota(jnp.int32, ov.shape, 2))
    o = jnp.sum(jnp.where(hsel, ov, 0.0), axis=2)        # (H, dh)
    o_ref[0] = (o * vs_ref[0]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def cross_attention_decode_dense(
    q: jnp.ndarray,    # (B, H, 1, dh) compute dtype
    k_q: jnp.ndarray,  # (B, H, dh, T) int8
    k_s: jnp.ndarray,  # (B, H, 1, dh) fp32
    v_q: jnp.ndarray,  # (B, H, dh, T) int8
    v_s: jnp.ndarray,  # (B, H, 1, dh) fp32
    interpret: bool = False,
) -> jnp.ndarray:
    """Block-diagonal dense-Q MXU variant of the decode cross-attention."""
    B, H, _, dh = q.shape
    T = k_q.shape[-1]
    scale = dh ** -0.5

    qs = q[:, :, 0].astype(jnp.float32) * k_s[:, :, 0] * scale  # (B, H, dh)
    # dense block-diagonal query: qd[b, h, h*dh + d] = qs[b, h, d]
    qt = jnp.tile(qs, (1, 1, H))                                # (B, H, H*dh)
    col_head = jnp.arange(H * dh) // dh
    qd = jnp.where(col_head[None, None, :] == jnp.arange(H)[None, :, None],
                   qt, 0.0)
    vs = v_s[:, :, 0].astype(jnp.float32)
    kqf = k_q.reshape(B, H * dh, T)
    vqf = v_q.reshape(B, H * dh, T)

    out = pl.pallas_call(
        functools.partial(_dense_kernel, n_head=H, dh=dh),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, H * dh), lambda b: (b, 0, 0),
                         memory_space=_VMEM),
            pl.BlockSpec((1, H, dh), lambda b: (b, 0, 0), memory_space=_VMEM),
            pl.BlockSpec((1, H * dh, T), lambda b: (b, 0, 0),
                         memory_space=_VMEM),
            pl.BlockSpec((1, H * dh, T), lambda b: (b, 0, 0),
                         memory_space=_VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, dh), lambda b: (b, 0, 0),
                               memory_space=_VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, dh), q.dtype),
        interpret=interpret,
    )(qd, vs.reshape(B, H, dh), kqf, vqf)
    return out.reshape(B, H, 1, dh)


@functools.partial(jax.jit, static_argnames=("interpret", "use_vpu"))
def cross_attention_decode(
    q: jnp.ndarray,    # (B, H, 1, dh) compute dtype
    k_q: jnp.ndarray,  # (B, H, dh, T) int8 (transposed, quantize_cross_kv)
    k_s: jnp.ndarray,  # (B, H, 1, dh) fp32
    v_q: jnp.ndarray,  # (B, H, dh, T) int8 (transposed)
    v_s: jnp.ndarray,  # (B, H, 1, dh) fp32
    interpret: bool = False,
    use_vpu: bool = False,
) -> jnp.ndarray:
    """Single-query attention against int8 cross-KV; returns (B, H, 1, dh).

    Matches models.model.attention_int8kv numerics (no mask — cross
    attention is over the full audio context). ``use_vpu`` switches the
    in-kernel reductions from M=1 MXU dots to vector-unit ops.
    """
    B, H, _, dh = q.shape
    T = k_q.shape[-1]
    scale = dh ** -0.5

    # head group size: all heads of a stream per cell while the K+V blocks
    # (2 * G * dh * T int8, double-buffered) stay well inside VMEM
    G = H
    while 4 * G * dh * T > 8 * 1024 * 1024 and G % 2 == 0:
        G //= 2
    n_cells = B * H // G

    qf = q.reshape(n_cells, G, dh)
    ksf = k_s.astype(jnp.float32).reshape(n_cells, G, dh)
    vsf = v_s.astype(jnp.float32).reshape(n_cells, G, dh)
    kqf = k_q.reshape(n_cells, G * dh, T)
    vqf = v_q.reshape(n_cells, G * dh, T)

    out = pl.pallas_call(
        functools.partial(_kernel_vpu if use_vpu else _kernel,
                          scale=scale, n_head=G, dh=dh),
        grid=(n_cells,),
        in_specs=[
            pl.BlockSpec((1, G, dh), lambda b: (b, 0, 0), memory_space=_VMEM),
            pl.BlockSpec((1, G, dh), lambda b: (b, 0, 0), memory_space=_VMEM),
            pl.BlockSpec((1, G, dh), lambda b: (b, 0, 0), memory_space=_VMEM),
            pl.BlockSpec((1, G * dh, T), lambda b: (b, 0, 0), memory_space=_VMEM),
            pl.BlockSpec((1, G * dh, T), lambda b: (b, 0, 0), memory_space=_VMEM),
        ],
        out_specs=pl.BlockSpec((1, G, dh), lambda b: (b, 0, 0), memory_space=_VMEM),
        out_shape=jax.ShapeDtypeStruct((n_cells, G, dh), q.dtype),
        interpret=interpret,
    )(qf, ksf, vsf, kqf, vqf)
    return out.reshape(B, H, 1, dh)
