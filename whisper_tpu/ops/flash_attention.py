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

import os

# v5e sweep at turbo B64 (tanh GELU, full encoder): 256 -> 1122 ms,
# 512 -> 1091, 768 -> 1084 (best; 1500 ctx = 2 ragged tiles), 1024 -> 1201
Q_TILE = int(os.environ.get("WHISPER_TPU_QTILE", "768"))
# Run kernels in Pallas interpret mode (CPU dryruns/tests of sharded paths).
# Resolved once at import — a process-start-only knob, like Q_TILE.
INTERPRET = os.environ.get("WHISPER_TPU_PALLAS_INTERPRET", "0") == "1"
_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, kv_len: int, kv_pad: int, scale: float):
    """One (batch*head, q-tile) program: full-softmax attention in VMEM.

    Dots run on the inputs' NATIVE dtype with fp32 accumulation: casting
    bf16 operands up to fp32 first forces the MXU into multi-pass fp32
    emulation (~3x slower — measured 10.4 vs 4.5 ms/layer at turbo B64);
    scaling happens on the fp32 scores instead of on q."""
    q = q_ref[0]                                          # (TQ, dh)
    k = k_ref[0]                                          # (Tk_pad, dh)
    v = v_ref[0]                                          # (Tk_pad, dh)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)               # (TQ, Tk_pad) f32
    s = s * scale
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


def _btd_kernel(q_ref, k_ref, v_ref, o_ref, *, n_heads_blk: int, dh: int,
                scale: float):
    """One (batch, head-pair, q-tile) program over the native (B, T, D)
    layout. The block carries ``n_heads_blk`` adjacent heads (the TPU
    lowering needs the last block dim to be a multiple of 128 = 2*dh);
    each head attends only within its own 64-column slice."""
    outs = []
    for g in range(n_heads_blk):
        # native-dtype dots, fp32 accumulation (see _attn_kernel note)
        q = q_ref[0, :, g * dh:(g + 1) * dh]
        k = k_ref[0, :, g * dh:(g + 1) * dh]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale    # (TQ, Tk) f32
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        w = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v_ref.dtype)
        v = v_ref[0, :, g * dh:(g + 1) * dh]
        outs.append(jax.lax.dot_general(
            w, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))           # (TQ, dh)
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_head", "interpret", "q_tile"))
def flash_attention_btd(
    q: jnp.ndarray,  # (B, T, D) — heads NOT split
    k: jnp.ndarray,  # (B, T, D)
    v: jnp.ndarray,  # (B, T, D)
    n_head: int,
    interpret: bool = False,
    q_tile: int = Q_TILE,
) -> jnp.ndarray:
    """flash_attention reading/writing the model's native (B, T, D) layout.

    The split-heads transposes, the pad-to-tile copies and the output
    slice-back around the (B, H, T, dh) kernel measured ~410 ms per turbo-B64
    encoder pass (xprof: copy.3x + pad.1x + slice.8) — pure HBM traffic.
    Here the head axis is carved out by the BlockSpec index maps instead
    (blocks of two adjacent heads, 128 columns), so the kernel consumes the
    projection outputs directly and writes attention output the wo matmul
    can consume, with zero relayouts. The ragged last q tile (1500 % 512)
    relies on Pallas' non-divisible grid handling: OOB rows are dropped on
    write and never mix into valid rows (row-wise softmax).
    """
    B, T, D = q.shape
    dh = D // n_head
    scale = dh ** -0.5
    # heads per block: last block dim must be a multiple of 128 (dh=64 for
    # every Whisper size, head counts all even -> 2 heads = 128 columns)
    hb = max(1, _LANE // dh)
    if n_head % hb or (dh * hb) % _LANE:
        # odd layouts: callers should use the split-head flash_attention
        raise ValueError(f"flash_attention_btd needs n_head % {hb} == 0")
    q_tile = min(q_tile, _round_up(T, 8))
    n_tiles = -(-T // q_tile)
    blk = dh * hb

    kernel = functools.partial(_btd_kernel, n_heads_blk=hb, dh=dh, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(B, n_head // hb, n_tiles),
        in_specs=[
            pl.BlockSpec((1, q_tile, blk), lambda b, h, i: (b, i, h),
                         memory_space=_VMEM),
            pl.BlockSpec((1, T, blk), lambda b, h, i: (b, 0, h),
                         memory_space=_VMEM),
            pl.BlockSpec((1, T, blk), lambda b, h, i: (b, 0, h),
                         memory_space=_VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_tile, blk), lambda b, h, i: (b, i, h),
                               memory_space=_VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, D), v.dtype),
        interpret=interpret,
    )(q, k, v)
    return out


def flash_attention_btd_sharded(
    q: jnp.ndarray,  # (B, T, D), D = n_head * dh, head-sharded over MODEL
    k: jnp.ndarray,
    v: jnp.ndarray,
    n_head: int,
    mesh,
    interpret: bool = False,
    q_tile: int = Q_TILE,
) -> jnp.ndarray:
    """flash_attention_btd under tensor parallelism.

    GSPMD partitions einsums but cannot split a pallas_call, so under a
    (data, model) mesh the kernel runs inside shard_map: batch over DATA,
    the head-major D columns over MODEL. Each shard sees its local head
    count — the 128-column head-pair tiling constraint therefore applies to
    ``n_head // tp`` (callers must check btd_heads_ok against the LOCAL
    count). Attention is per-head, so no collective is needed inside; the
    downstream wo matmul's psum is inserted by GSPMD as usual."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.sharding import DATA_AXIS, MODEL_AXIS

    tp = mesh.shape[MODEL_AXIS]
    if n_head % tp:
        raise ValueError(f"n_head={n_head} not divisible by TP={tp}")
    data_ax = DATA_AXIS if q.shape[0] % mesh.shape[DATA_AXIS] == 0 else None
    spec = P(data_ax, None, MODEL_AXIS if tp > 1 else None)
    # check_vma=False: pallas_call's out_shape carries no varying-mesh-axes
    # annotation, and the kernel is elementwise in the sharded axes anyway
    fn = jax.shard_map(
        functools.partial(flash_attention_btd, n_head=n_head // tp,
                          interpret=interpret, q_tile=q_tile),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False)
    return fn(q, k, v)


def btd_heads_ok(n_head: int, dh: int) -> bool:
    """True if (n_head, dh) tiles into the BTD kernel's 128-column blocks."""
    hb = max(1, _LANE // dh)
    return n_head % hb == 0 and (dh * hb) % _LANE == 0


def use_flash() -> bool:
    """Flash path is for real TPU backends (incl. the axon tunnel)."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False
