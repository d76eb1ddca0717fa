"""Whisper encoder/decoder as pure JAX functions over param pytrees.

Architecture is OpenAI Whisper (conv stem + pre-LN transformer encoder;
decoder with self + cross attention, tied embedding logits). The reference
ships this split across two opaque quantized graphs
(model_convert/export_onnx.py:187-213 encoder, :302-387 decoder step); here it
is a single functional model:

- per-layer params are STACKED along a leading layer axis and iterated with
  ``lax.scan`` — one compiled block body regardless of depth;
- cross-attention K/V are computed once per utterance from the encoder output
  (the reference bakes these projections into its encoder graph,
  export_onnx.py:205-213) and stay in HBM;
- the decoder processes any number of positions per call against a
  fixed-shape KV cache updated in place via ``dynamic_update_slice`` — the
  reference instead round-trips the whole 448-slot cache through the host
  every token (python/whisper.py:230-231, cpp/src/Whisper.cpp:307-342);
- matmuls run in a configurable compute dtype (bf16 on TPU) while layernorm,
  softmax and the final logits stay fp32 — the same "high-precision islands"
  policy the reference's quantizer needed for WER parity
  (model_convert/config_whisper_decoder_u16.json:47-63).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import WhisperConfig

Params = Dict[str, Any]


# ------------------------------------------------------------------ helpers
def sinusoids(length: int, channels: int, max_timescale: float = 10000.0) -> np.ndarray:
    """OpenAI Whisper's sinusoidal positional embedding for the encoder."""
    assert channels % 2 == 0
    log_timescale_increment = np.log(max_timescale) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment * np.arange(channels // 2))
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled_time), np.cos(scaled_time)], axis=1).astype(np.float32)


def layer_norm(x: jnp.ndarray, g: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """fp32 LayerNorm island; returns x's original dtype."""
    orig = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * g.astype(jnp.float32) + b.astype(jnp.float32)).astype(orig)


def _gelu(x: jnp.ndarray) -> jnp.ndarray:
    """GELU with an opt-in tanh approximation (``WHISPER_TPU_GELU=tanh``).

    Whisper uses exact (erf) GELU — that stays the default for checkpoint
    parity. The tanh form avoids the erf transcendental on the VPU over the
    (B, 1500, 4D) MLP hidden tensor, a bandwidth/VPU-bound chunk of encoder
    time at turbo B64; max deviation is ~1e-3 absolute in bf16 range.
    """
    import os

    return jax.nn.gelu(x, approximate=os.environ.get("WHISPER_TPU_GELU") == "tanh")


def _linear(x: jnp.ndarray, w, b: Optional[jnp.ndarray], dtype) -> jnp.ndarray:
    from ..ops.quant import QTensor

    if isinstance(w, QTensor):
        # int8 weight read, cast fused into the matmul; per-out-channel scale
        # applied to the (small) product — weight-only quantization
        y = jnp.einsum("...d,de->...e", x.astype(dtype), w.q.astype(dtype),
                       preferred_element_type=dtype)
        y = y * w.s.astype(dtype).reshape(-1)
    else:
        y = jnp.einsum("...d,de->...e", x.astype(dtype), w.astype(dtype),
                       preferred_element_type=dtype)
    if b is not None:
        y = y + b.astype(dtype)
    return y


def _linear_a8(x: jnp.ndarray, w, b: Optional[jnp.ndarray], dtype) -> jnp.ndarray:
    """W8A8 matmul: dynamic per-token symmetric int8 activations against the
    int8 weight payload — an int8xint8->int32 MXU dot runs at 2x the bf16
    peak (v5e: 394 TOPS vs 197 TFLOP/s), which is the only lever below the
    encoder's bf16 FLOP bound. Scales (activation row x weight out-channel)
    apply to the int32 product. Used by encoder_forward when
    ``WHISPER_TPU_W8A8=1`` (trace-time knob, like WHISPER_TPU_GELU); falls
    back to the weight-only path for non-quantized weights. Accuracy is
    gated by eval.quant_gate variant ``w8a8`` — the reference's own recipe
    is full-graph U16 PTQ via Pulsar2 (model_convert/config_whisper_
    encoder_u16.json), so quantized encoder compute has a direct analog."""
    from ..ops.quant import QTensor

    if not isinstance(w, QTensor):
        return _linear(x, w, b, dtype)
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8) / 127.0
    x8 = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    y = jnp.einsum("...d,de->...e", x8, w.q,
                   preferred_element_type=jnp.int32)
    y = ((y.astype(jnp.float32) * sx) * w.s.astype(jnp.float32).reshape(-1)
         ).astype(dtype)
    if b is not None:
        y = y + b.astype(dtype)
    return y


def cast_floating(params, dtype):
    """Cast floating-point leaves to `dtype`; leave int8 QTensor payloads and
    their fp32 scales untouched.

    A no-op tree (every leaf already a device array of the right dtype)
    returns the INPUT unchanged — engines sharing one param tree keep
    sharing its buffers. A tree that does need work runs as ONE jitted
    program instead of a device op per leaf (~150 round trips on a
    tunneled device, part of the r4 cold start — VERDICT r4 #7)."""
    from ..ops.quant import QTensor

    isqt = lambda x: isinstance(x, QTensor)  # noqa: E731

    def cast(x):
        if isinstance(x, QTensor):
            return x
        x = jnp.asarray(x)
        return x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x

    def needs_work(x) -> bool:
        if isinstance(x, QTensor):
            return False
        if not isinstance(x, jax.Array):
            return True
        return (jnp.issubdtype(x.dtype, jnp.floating)
                and x.dtype != jnp.dtype(dtype))

    leaves = jax.tree.leaves(params, is_leaf=isqt)
    if not any(needs_work(x) for x in leaves):
        return params
    return jax.jit(
        lambda p: jax.tree.map(cast, p, is_leaf=isqt))(params)


def _split_heads(x: jnp.ndarray, n_head: int) -> jnp.ndarray:
    """(B, T, D) -> (B, H, T, dh)"""
    B, T, D = x.shape
    return x.reshape(B, T, n_head, D // n_head).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, T, dh) -> (B, T, D)"""
    B, H, T, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, T, H * dh)


def attention(
    q: jnp.ndarray,  # (B, H, Tq, dh)
    k: jnp.ndarray,  # (B, H, Tk, dh)
    v: jnp.ndarray,  # (B, H, Tk, dh)
    mask: Optional[jnp.ndarray] = None,  # broadcastable to (B, H, Tq, Tk); True = visible
) -> jnp.ndarray:
    """Scaled dot-product attention; fp32 softmax island."""
    dh = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores.astype(jnp.float32) * (dh ** -0.5)
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.float32(-1e30))
    w = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", w.astype(v.dtype), v, preferred_element_type=v.dtype)
    return out


def attention_kvt(
    q: jnp.ndarray,    # (B, H, Tq, dh)
    k_t: jnp.ndarray,  # (B, H, dh, Tk) — transposed, position-minor
    v_t: jnp.ndarray,  # (B, H, dh, Tk)
    mask: Optional[jnp.ndarray] = None,  # broadcastable to (B, H, Tq, Tk)
) -> jnp.ndarray:
    """attention() over position-minor (transposed) K/V.

    The decode KV caches are stored (..., dh, T) so every per-token read
    streams T-contiguous rows instead of dh(=64)-byte ones — the layout
    change alone made the cache reads ~2x faster on v5e (BENCH_NOTES.md).
    """
    dh = q.shape[-1]
    scores = jnp.einsum("bhqd,bhdk->bhqk", q, k_t, preferred_element_type=jnp.float32)
    scores = scores.astype(jnp.float32) * (dh ** -0.5)
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.float32(-1e30))
    w = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhdk->bhqd", w.astype(v_t.dtype), v_t,
                     preferred_element_type=v_t.dtype)
    return out


# ------------------------------------------------------------------ encoder
def encoder_stem(
    params: Params,
    mel: jnp.ndarray,  # (B, n_mels, 3000)
    cfg: WhisperConfig,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Conv stem + positional embedding -> (B, Ta, D) in compute dtype."""
    enc = params["encoder"]
    dt = compute_dtype
    x = mel.astype(dt).transpose(0, 2, 1)  # (B, 3000, n_mels) NWC

    def conv1d(x, w, b, stride):
        y = jax.lax.conv_general_dilated(
            x, w.astype(dt), window_strides=(stride,), padding=[(1, 1)],
            dimension_numbers=("NWC", "WIO", "NWC"), preferred_element_type=dt,
        )
        return y + b.astype(dt)

    x = _gelu(conv1d(x, enc["conv1"]["w"], enc["conv1"]["b"], 1))
    x = _gelu(conv1d(x, enc["conv2"]["w"], enc["conv2"]["b"], 2))
    return x + enc["pos_emb"][: x.shape[1]].astype(dt)


def encoder_post(
    params: Params,
    x: jnp.ndarray,
    cfg: WhisperConfig,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    enc = params["encoder"]
    x = layer_norm(x, enc["ln_post"]["g"], enc["ln_post"]["b"])
    return x.astype(jnp.float32)


def encoder_forward(
    params: Params,
    mel: jnp.ndarray,  # (B, n_mels, 3000)
    cfg: WhisperConfig,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Conv stem + transformer encoder -> audio features (B, 1500, D) fp32."""
    x = encoder_stem(params, mel, cfg, compute_dtype)
    x = encoder_blocks(params, x, cfg, compute_dtype)
    return encoder_post(params, x, cfg, compute_dtype)


def encoder_blocks(
    params: Params,
    x: jnp.ndarray,  # (B, Ta, D) stem output / previous segment
    cfg: WhisperConfig,
    compute_dtype=jnp.float32,
    lo: int = 0,
    hi: Optional[int] = None,
) -> jnp.ndarray:
    """Transformer blocks [lo, hi) over the stem output.

    Segmentable on purpose: the serving engine can run layer GROUPS as
    separate device programs (engine.encode_chunks) so decode rounds
    enqueue between an admission encode's segments instead of stalling
    behind one monolithic encoder program (VERDICT r4 #2)."""
    enc = params["encoder"]
    dt = compute_dtype
    n_head = cfg.n_audio_head

    import os

    from ..ops.flash_attention import (
        INTERPRET,
        btd_heads_ok,
        flash_attention,
        flash_attention_btd,
        flash_attention_btd_sharded,
        use_flash,
    )
    from ..parallel.sharding import MODEL_AXIS, active_mesh

    # "auto" (default on TPU) = the layout-direct BTD kernel: attention
    # straight off the projection outputs, no split-heads/pad/slice copies
    # (those relayouts measured ~410 ms per turbo-B64 encoder pass, xprof).
    # "bhtd" keeps the split-head kernel; "0" = pure-XLA attention.
    flash = os.environ.get("WHISPER_TPU_FLASH", "auto")
    on_tpu = use_flash() or INTERPRET
    use_btd = flash in ("auto", "btd") and on_tpu or flash == "btd"
    # tensor parallelism: pallas_calls cannot be split by GSPMD — the BTD
    # kernel runs under shard_map over the active mesh (heads over MODEL),
    # and its head-pair tiling constraint applies to the LOCAL head count
    mesh = active_mesh()
    tp = mesh.shape[MODEL_AXIS] if mesh is not None else 1
    dh_enc = cfg.n_audio_state // n_head
    if use_btd and (n_head % tp or not btd_heads_ok(n_head // tp, dh_enc)):
        use_btd = False
    use_pallas = (use_flash() if flash == "auto" else flash in ("1", "bhtd"))
    if tp > 1:
        use_pallas = False  # split-head kernel has no shard_map wrapper
    # W8A8: int8 activations x int8 weights for the projection/MLP matmuls
    # (attention dots + conv stem + LN stay bf16 islands)
    lin = _linear_a8 if os.environ.get("WHISPER_TPU_W8A8") == "1" else _linear

    def block(x, p):
        h = layer_norm(x, p["attn_ln"]["g"], p["attn_ln"]["b"])
        q = lin(h, p["attn"]["wq"], p["attn"]["bq"], dt)
        k = lin(h, p["attn"]["wk"], None, dt)
        v = lin(h, p["attn"]["wv"], p["attn"]["bv"], dt)
        if use_btd:
            # VMEM-resident kernel over the native (B, T, D) layout
            if tp > 1:
                om = flash_attention_btd_sharded(q, k, v, n_head, mesh,
                                                 interpret=INTERPRET)
            else:
                om = flash_attention_btd(q, k, v, n_head, interpret=INTERPRET)
        else:
            qh, kh, vh = (_split_heads(t, n_head) for t in (q, k, v))
            if use_pallas:
                # VMEM-resident Pallas kernel: no HBM score materialization
                om = _merge_heads(flash_attention(qh, kh, vh))
            else:
                om = _merge_heads(attention(qh, kh, vh))
        x = x + lin(om, p["attn"]["wo"], p["attn"]["bo"], dt)

        h = layer_norm(x, p["mlp_ln"]["g"], p["mlp_ln"]["b"])
        h = _gelu(lin(h, p["mlp"]["w1"], p["mlp"]["b1"], dt))
        x = x + lin(h, p["mlp"]["w2"], p["mlp"]["b2"], dt)
        return x, None

    blocks = enc["blocks"]
    if lo != 0 or hi is not None:
        blocks = jax.tree.map(lambda a: a[lo:hi], blocks)
    x, _ = jax.lax.scan(block, x, blocks)
    return x


def compute_cross_kv(
    params: Params,
    audio_features: jnp.ndarray,  # (B, Ta, D)
    cfg: WhisperConfig,
    compute_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-decoder-layer cross-attention K/V: each (L, B, Ta, D).

    The reference computes these inside its encoder graph so they are done
    once per utterance (export_onnx.py:205-213); we keep the same contract.
    """
    from ..ops.quant import QTensor

    dec = params["decoder"]
    dt = compute_dtype
    x = audio_features.astype(dt)

    def proj(w):
        if isinstance(w, QTensor):
            y = jnp.einsum("btd,lde->lbte", x, w.q.astype(dt),
                           preferred_element_type=dt)
            return y * w.s.astype(dt)[:, None, :, :]  # (L,1,d)->(L,1,1,d)
        return jnp.einsum("btd,lde->lbte", x, w.astype(dt),
                          preferred_element_type=dt)

    ck = proj(dec["blocks"]["cross"]["wk"])
    cv = proj(dec["blocks"]["cross"]["wv"])
    cv = cv + dec["blocks"]["cross"]["bv"][:, None, None, :].astype(dt)
    # store head-major (L, B, H, Ta, dh): the decode loop reads this every
    # token — pay the relayout once here, never per step
    L, B, Ta, D = ck.shape
    H = cfg.n_text_head
    ck = ck.reshape(L, B, Ta, H, D // H).transpose(0, 1, 3, 2, 4)
    cv = cv.reshape(L, B, Ta, H, D // H).transpose(0, 1, 3, 2, 4)
    return ck, cv


def quantize_cross_kv(
    cross_kv: Tuple[jnp.ndarray, jnp.ndarray]
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Dynamic int8 quantization of the cross-attention K/V (per utterance).

    The decode loop reads the full cross-KV every token — at Turbo batch 64
    that is ~1.9 GB/step in bf16, the single largest HBM stream. Symmetric
    per-(layer, batch, head, channel) int8 halves it; the scales fold into
    the query (for K) and the attention output (for V), so the inner matmuls
    stay exact up to the 8-bit rounding.

    The quantized arrays are stored TRANSPOSED — (L, B, H, dh, Ta) — so the
    audio axis is minor: per-(b, h) rows are then Ta contiguous bytes (1500)
    instead of dh (64), which is what makes the per-step reads DMA-efficient
    (64-byte rows measured 1.7x slower end-to-end). Returns
    (k_q, k_s, v_q, v_s): q int8 (L,B,H,dh,Ta), s fp32 (L,B,H,1,dh).
    """
    def quant(x):
        x32 = x.astype(jnp.float32)  # (L, B, H, Ta, dh)
        s = jnp.max(jnp.abs(x32), axis=3, keepdims=True) / 127.0  # (L,B,H,1,dh)
        s = jnp.maximum(s, 1e-12)
        q = jnp.clip(jnp.round(x32 / s), -127, 127).astype(jnp.int8)
        return q.transpose(0, 1, 2, 4, 3), s  # (L,B,H,dh,Ta)

    ck, cv = cross_kv
    k_q, k_s = quant(ck)
    v_q, v_s = quant(cv)
    return k_q, k_s, v_q, v_s


def attention_int8kv(
    q: jnp.ndarray,    # (B, H, Tq, dh) compute dtype
    k_q: jnp.ndarray,  # (B, H, dh, Tk) int8 (transposed, quantize_cross_kv)
    k_s: jnp.ndarray,  # (B, H, 1, dh) fp32
    v_q: jnp.ndarray,  # (B, H, dh, Tk) int8 (transposed)
    v_s: jnp.ndarray,  # (B, H, 1, dh) fp32
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Attention against transposed int8 K/V with exact per-channel scaling."""
    dt = q.dtype
    dh = q.shape[-1]
    q_scaled = (q.astype(jnp.float32) * k_s).astype(dt)  # fold K scales into q
    scores = jnp.einsum("bhqd,bhdk->bhqk", q_scaled, k_q.astype(dt),
                        preferred_element_type=jnp.float32)
    scores = scores.astype(jnp.float32) * (dh ** -0.5)
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.float32(-1e30))
    w = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhdk->bhqd", w.astype(dt), v_q.astype(dt),
                     preferred_element_type=dt)
    return (out.astype(jnp.float32) * v_s).astype(dt)  # fold V scales out


def _use_decode_flash():
    """Gate for the fused Pallas cross-attention decode kernels
    (ops.decode_attention). WHISPER_TPU_DECODE_FLASH selects the kernel:

      0 (default)  XLA lowering of attention_int8kv
      1 / legacy   round-2 head-batched kernel (measured 7.4 ms, kept as
                   the baseline for kernel work — BENCH_NOTES.md)
      fd           round-3 flash-decode kernel: T-tiled online softmax with
                   VPU grouped reductions (the DMA-bound design)
      dense        block-diagonal dense-Q MXU variant

    Process-start-only knob (frozen at import, like _FUSED_QKV): returns the
    kernel kind string or None."""
    return _DECODE_FLASH_KIND


def _pallas_cross_decode(qh, cross):
    """Dispatch the S=1 cross-attention to the selected Pallas kernel."""
    from ..ops import decode_attention as da

    if _DECODE_FLASH_KIND == "fd":
        return da.cross_attention_decode_fd(qh, *cross, t_tile=_FD_TILE)
    if _DECODE_FLASH_KIND == "dense":
        return da.cross_attention_decode_dense(qh, *cross)
    return da.cross_attention_decode(qh, *cross)


# ------------------------------------------------------------------ decoder
class KVCache(NamedTuple):
    """Self-attention KV cache, device-resident, head-major and
    position-minor: k/v (L, B, H, dh, n_text_ctx). Position-minor means each
    per-(batch, head) read streams n_text_ctx-contiguous rows — with dh(=64)
    minor the 64-byte rows halved the effective HBM bandwidth of the decode
    step's dominant reads (measured on v5e, BENCH_NOTES.md)."""

    k: jnp.ndarray
    v: jnp.ndarray

    @classmethod
    def create(cls, cfg: WhisperConfig, batch: int, dtype=jnp.float32,
               ctx: Optional[int] = None) -> "KVCache":
        """``ctx`` caps the cache's position axis (defaults to n_text_ctx).
        Decodes with a static token budget pass the 128-rounded budget so
        every step streams only the reachable cache prefix — at the flagship
        config (turbo B64, 64 tokens) that is 128 of 448 positions, 3.5x less
        self-KV HBM read per step."""
        shape = (cfg.n_text_layer, batch, cfg.n_text_head, cfg.head_dim_text,
                 ctx or cfg.n_text_ctx)
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


class QKVCache(NamedTuple):
    """Int8 self-attention KV cache. K and V are PACKED into one array so the
    decode loop's carry arity matches the bf16 cache (2 leaves — carry arity
    is the AOT TPU compiler's compile-time killer, BENCH_NOTES.md):

    q: (L, B, H, 2, dh, T) int8 — [..., 0, :, :] = Kᵀ, [..., 1, :, :] = Vᵀ
       (position-minor, same DMA-efficiency rationale as KVCache)
    s: (L, B, H, 2, T) fp32 — symmetric per-(position, head) scales over dh

    The scales apply exactly outside the MXU matmuls: score rows scale by
    s_k AFTER q·k_q, attention weights scale by s_v BEFORE w·v_q — no
    dequantized copy of the cache ever hits HBM."""

    q: jnp.ndarray
    s: jnp.ndarray

    @classmethod
    def create(cls, cfg: WhisperConfig, batch: int,
               ctx: Optional[int] = None) -> "QKVCache":
        L, H, dh = cfg.n_text_layer, cfg.n_text_head, cfg.head_dim_text
        T = ctx or cfg.n_text_ctx  # see KVCache.create on bucketed ctx
        return cls(jnp.zeros((L, batch, H, 2, dh, T), jnp.int8),
                   jnp.ones((L, batch, H, 2, T), jnp.float32))


def quantize_kv_heads(kh: jnp.ndarray, vh: jnp.ndarray):
    """(B, H, S, dh) k/v -> packed transposed int8 (B, H, 2, dh, S)
    + scales (B, H, 2, S)."""
    x = jnp.stack([kh, vh], axis=2).astype(jnp.float32)  # (B, H, 2, S, dh)
    s = jnp.maximum(jnp.max(jnp.abs(x), axis=-1), 1e-12) / 127.0  # (B, H, 2, S)
    q = jnp.clip(jnp.round(x / s[..., None]), -127, 127).astype(jnp.int8)
    return q.swapaxes(-1, -2), s  # (B, H, 2, dh, S)


def attention_int8kv_perpos(
    q: jnp.ndarray,     # (B, H, Tq, dh) compute dtype
    kv_q: jnp.ndarray,  # (B, H, 2, dh, Tk) int8 packed transposed
    kv_s: jnp.ndarray,  # (B, H, 2, Tk) fp32
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Attention against a packed per-position int8 KV cache (exact scaling)."""
    dt = q.dtype
    dh = q.shape[-1]
    k_q, v_q = kv_q[:, :, 0], kv_q[:, :, 1]  # (B, H, dh, Tk)
    scores = jnp.einsum("bhqd,bhdk->bhqk", q, k_q.astype(dt),
                        preferred_element_type=jnp.float32)
    scores = scores * kv_s[:, :, 0][:, :, None, :] * (dh ** -0.5)
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.float32(-1e30))
    w = jax.nn.softmax(scores, axis=-1)
    w = (w * kv_s[:, :, 1][:, :, None, :]).astype(dt)  # fold V scales into weights
    return jnp.einsum("bhqk,bhdk->bhqd", w, v_q.astype(dt),
                      preferred_element_type=dt)


def _fused_qkv(h: jnp.ndarray, pa: Params, dt):
    """q/k/v projections as ONE matmul over concatenated weights.

    The decode step at M=64 is launch-overhead-bound, not FLOP-bound: three
    (D, D) matmuls become one (D, 3D). The weight concat is loop-invariant,
    so XLA hoists it out of the decode while_loop (one-time cost, not
    per-token). Enabled by WHISPER_TPU_FUSED_QKV=1 (default on for the
    decoder step paths)."""
    from ..ops.quant import QTensor

    wq, wk, wv = pa["wq"], pa["wk"], pa["wv"]
    if isinstance(wq, QTensor):
        w = QTensor(jnp.concatenate([wq.q, wk.q, wv.q], axis=-1),
                    jnp.concatenate([wq.s, wk.s, wv.s], axis=-1))
    else:
        w = jnp.concatenate([wq, wk, wv], axis=-1)
    qkv = _linear(h, w, None, dt)
    D = h.shape[-1]
    q = qkv[..., :D] + pa["bq"].astype(dt)
    k = qkv[..., D:2 * D]
    v = qkv[..., 2 * D:] + pa["bv"].astype(dt)
    return q, k, v


# Process-start-only knobs: resolved ONCE at import. They are read at trace
# time inside jitted callers but are not part of any jit cache key, so a
# mid-process toggle would silently not apply to already-compiled configs —
# freezing them at import makes that contract explicit (ADVICE round 2).
import os as _os

_FUSED_QKV = _os.environ.get("WHISPER_TPU_FUSED_QKV", "0") == "1"
# Decoder layer-scan unroll factor (default 1). Turbo has only 4 decoder
# layers; unrolling lets XLA overlap HBM streams across layer boundaries in
# the latency-bound decode step at the cost of a bigger program (longer
# compiles through the axon tunnel).
_DECODE_UNROLL = int(_os.environ.get("WHISPER_TPU_DECODE_UNROLL", "1"))
# Pallas decode cross-attention kernel selection (see _use_decode_flash)
_DECODE_FLASH_KIND = {"1": "legacy", "legacy": "legacy", "fd": "fd",
                      "dense": "dense"}.get(
    _os.environ.get("WHISPER_TPU_DECODE_FLASH", "0"))
_FD_TILE = int(_os.environ.get("WHISPER_TPU_FD_TILE", "512"))


def _use_fused_qkv() -> bool:
    return _FUSED_QKV


def _decode_unroll() -> int:
    return _DECODE_UNROLL


def _logits(x: jnp.ndarray, dec: Params, dt) -> jnp.ndarray:
    """Tied-embedding logits (export_onnx.py:377-386): compute-dtype inputs,
    fp32 accumulation — a full-precision cast would stream a fp32 copy of
    the (V, D) embedding through HBM every decode step. With
    ops.quant.quantize_logits_emb applied, the matmul reads an int8 copy
    (halving the dominant logits read) with exact per-vocab-row rescale on
    the fp32 output; the embedding GATHER keeps the high-precision table.
    """
    if "tok_emb_q8" in dec:
        q8 = dec["tok_emb_q8"]
        logits = jnp.einsum("bsd,vd->bsv", x.astype(dt), q8.q.astype(dt),
                            preferred_element_type=jnp.float32)
        return logits * q8.s.astype(jnp.float32).reshape(1, 1, -1)
    return jnp.einsum("bsd,vd->bsv", x.astype(dt), dec["tok_emb"].astype(dt),
                      preferred_element_type=jnp.float32)


def decoder_forward(
    params: Params,
    tokens: jnp.ndarray,  # (B, S) int32
    offset,  # scalar int: write/attend position of tokens[:, 0]
    kv: KVCache,
    cross_kv: Tuple[jnp.ndarray, jnp.ndarray],  # (L, B, Ta, D) each
    cfg: WhisperConfig,
    compute_dtype=jnp.float32,
    pad: Optional[jnp.ndarray] = None,  # (B,) int32: masked left-pad length
    beam_k: Optional[int] = None,  # cross_kv batch is B // beam_k (shared)
) -> Tuple[jnp.ndarray, KVCache]:
    """Run S decoder positions starting at ``offset`` against the KV cache.

    Covers both prefill (S = prompt length) and incremental decode (S = 1)
    with one compiled body. Returns (logits (B, S, n_vocab) fp32, updated kv).

    ``pad`` supports per-stream variable-length prompts in one fixed-shape
    batch (condition-on-previous-text): stream b's real prompt is
    right-aligned with ``pad[b]`` dummy tokens in front, which are excluded
    from self-attention, and positional embeddings are indexed ``pos - pad[b]``
    so real tokens get the canonical positions 0, 1, 2, ...

    ``beam_k``: the K beams of one utterance share its cross-KV exactly (the
    audio never changes under beam reordering), so beam search passes
    UNEXPANDED cross_kv (leading batch B // beam_k) and S=1 queries fold into
    the cross-attention query-length axis instead — the dominant decode-step
    HBM stream (the full cross-KV read) is paid once per utterance, not once
    per beam, and the M=K matmul fills the MXU better than K M=1 ones.
    Self-attention state stays per-beam (batch B).
    """
    dec = params["decoder"]
    dt = compute_dtype
    B, S = tokens.shape
    T = kv[0].shape[-1]  # cache position axis; may be bucketed < n_text_ctx
    n_head = cfg.n_text_head

    tok_emb = jnp.take(dec["tok_emb"], tokens, axis=0).astype(dt)  # (B, S, D)
    if pad is None:
        pos = jax.lax.dynamic_slice_in_dim(dec["pos_emb"], offset, S, axis=0).astype(dt)
        x = tok_emb + pos[None]
    else:
        # per-stream positional index: absolute position minus left-pad
        idx = jnp.clip(offset + jnp.arange(S)[None, :] - pad[:, None], 0,
                       dec["pos_emb"].shape[0] - 1)  # (B, S)
        x = tok_emb + jnp.take(dec["pos_emb"], idx, axis=0).astype(dt)

    # visibility mask over the full cache: key position t visible to query s
    # iff t <= offset + s  (matches the reference's 1-D int mask semantics,
    # python/whisper.py:202-211, extended to multi-position chunks)
    key_pos = jnp.arange(T)[None, :]
    q_pos = offset + jnp.arange(S)[:, None]
    vis = key_pos <= q_pos  # (S, T) True = visible
    vis = vis[None, None]  # (1, 1, S, T)
    if pad is not None:
        # padded prefix positions are never valid keys
        vis = jnp.logical_and(vis, key_pos[None, None] >= pad[:, None, None, None])

    kv_quant = len(cross_kv) == 4  # (k_q, k_s, v_q, v_s) from quantize_cross_kv
    self_quant = isinstance(kv, QKVCache)
    decode_flash = kv_quant and S == 1 and _use_decode_flash()

    # scan over layers; cross-kv per layer rides along as scanned inputs
    def scan_block(carry, inp):
        p, cross = inp[0], inp[1:]
        x, kcache, vcache, layer = carry  # for QKVCache: (x, q, s, layer)
        h = layer_norm(x, p["attn_ln"]["g"], p["attn_ln"]["b"])
        if _use_fused_qkv():
            q, k_new, v_new = _fused_qkv(h, p["attn"], dt)
        else:
            q = _linear(h, p["attn"]["wq"], p["attn"]["bq"], dt)
            k_new = _linear(h, p["attn"]["wk"], None, dt)
            v_new = _linear(h, p["attn"]["wv"], p["attn"]["bv"], dt)
        if self_quant:
            qn, sn = quantize_kv_heads(_split_heads(k_new, n_head),
                                       _split_heads(v_new, n_head))
            kcache = jax.lax.dynamic_update_slice(
                kcache, qn[None], (layer, 0, 0, 0, 0, offset))
            vcache = jax.lax.dynamic_update_slice(
                vcache, sn[None], (layer, 0, 0, 0, offset))
            o = attention_int8kv_perpos(
                _split_heads(q, n_head),
                jax.lax.dynamic_index_in_dim(kcache, layer, 0, keepdims=False),
                jax.lax.dynamic_index_in_dim(vcache, layer, 0, keepdims=False),
                mask=vis)
        else:
            # position-minor write: (B, S, D) -> (1, B, H, dh, S) at
            # [layer, :, :, :, offset]
            kcache = jax.lax.dynamic_update_slice(
                kcache,
                _split_heads(k_new, n_head).swapaxes(-1, -2).astype(kcache.dtype)[None],
                (layer, 0, 0, 0, offset))
            vcache = jax.lax.dynamic_update_slice(
                vcache,
                _split_heads(v_new, n_head).swapaxes(-1, -2).astype(vcache.dtype)[None],
                (layer, 0, 0, 0, offset))
            k_full = jax.lax.dynamic_index_in_dim(kcache, layer, 0, keepdims=False).astype(dt)
            v_full = jax.lax.dynamic_index_in_dim(vcache, layer, 0, keepdims=False).astype(dt)
            o = attention_kvt(_split_heads(q, n_head), k_full, v_full, mask=vis)
        x = x + _linear(_merge_heads(o), p["attn"]["wo"], p["attn"]["bo"], dt)

        h = layer_norm(x, p["cross_ln"]["g"], p["cross_ln"]["b"])
        q = _linear(h, p["cross"]["wq"], p["cross"]["bq"], dt)
        qh = _split_heads(q, n_head)  # (B, H, S, dh)
        if beam_k is not None:
            # fold each utterance's K beams into the query-length axis:
            # (Bu*K, H, S, dh) -> (Bu, H, K*S, dh) against Bu-batch cross —
            # the full cross-KV read is paid once per utterance, not per beam
            dh = cfg.head_dim_text
            Bu = B // beam_k
            qh = (qh.reshape(Bu, beam_k, n_head, S, dh)
                  .transpose(0, 2, 1, 3, 4).reshape(Bu, n_head, beam_k * S, dh))
        if decode_flash and beam_k is None:
            o = _pallas_cross_decode(qh, cross)
        elif kv_quant:
            o = attention_int8kv(qh, cross[0], cross[1], cross[2], cross[3])
        else:
            o = attention(qh, cross[0].astype(dt), cross[1].astype(dt))
        if beam_k is not None:
            o = (o.reshape(Bu, n_head, beam_k, S, dh)
                 .transpose(0, 2, 1, 3, 4).reshape(B, n_head, S, dh))
        x = x + _linear(_merge_heads(o), p["cross"]["wo"], p["cross"]["bo"], dt)

        h = layer_norm(x, p["mlp_ln"]["g"], p["mlp_ln"]["b"])
        h = _gelu(_linear(h, p["mlp"]["w1"], p["mlp"]["b1"], dt))
        x = x + _linear(h, p["mlp"]["w2"], p["mlp"]["b2"], dt)
        return (x, kcache, vcache, layer + 1), None

    (x, kc, vc, _), _ = jax.lax.scan(
        scan_block, (x, kv[0], kv[1], 0), (dec["blocks"],) + tuple(cross_kv),
        unroll=_decode_unroll())

    x = layer_norm(x, dec["ln"]["g"], dec["ln"]["b"])
    logits = _logits(x, dec, dt)
    return logits, type(kv)(kc, vc)


def decoder_step_multipos(
    params: Params,
    tokens: jnp.ndarray,   # (B,) int32 — one token per stream
    offsets: jnp.ndarray,  # (B,) int32 — per-stream write/attend position
    kv: KVCache,
    cross_kv: Tuple[jnp.ndarray, jnp.ndarray],
    cfg: WhisperConfig,
    compute_dtype=jnp.float32,
    pads: Optional[jnp.ndarray] = None,  # (B,) int32 masked left-pad length
) -> Tuple[jnp.ndarray, KVCache]:
    """One decode step where every stream sits at its own position.

    This is the continuous-batching primitive: slots admitted at different
    times decode together in a single program (the reference serializes whole
    requests on the NPU instead — python/whisper_svr.py:87-88). Returns
    (logits (B, n_vocab) fp32, updated kv).

    ``pads`` extends the decoder_forward left-pad convention to the step:
    stream b's prompt was right-aligned with ``pads[b]`` masked positions in
    front (initial_prompt context), which stay excluded from self-attention
    and are skipped in positional indexing.
    """
    dec = params["decoder"]
    dt = compute_dtype
    B = tokens.shape[0]
    T = kv[0].shape[-1]  # cache position axis; may be bucketed < n_text_ctx
    n_head = cfg.n_text_head
    barange = jnp.arange(B)

    tok_emb = jnp.take(dec["tok_emb"], tokens, axis=0).astype(dt)     # (B, D)
    pos_idx = (offsets if pads is None
               else jnp.clip(offsets - pads, 0, dec["pos_emb"].shape[0] - 1))
    pos = jnp.take(dec["pos_emb"], pos_idx, axis=0).astype(dt)        # (B, D)
    x = (tok_emb + pos)[:, None, :]                                   # (B, 1, D)

    key_pos = jnp.arange(T)[None, :]
    vis = (key_pos <= offsets[:, None])[:, None, None, :]             # (B,1,1,T)
    if pads is not None:
        # padded prefix positions are never valid keys
        vis = jnp.logical_and(vis,
                              (key_pos >= pads[:, None])[:, None, None, :])

    kv_quant = len(cross_kv) == 4
    self_quant = isinstance(kv, QKVCache)
    decode_flash = kv_quant and _use_decode_flash()

    def scan_block(carry, inp):
        p, cross = inp[0], inp[1:]
        x, kcache, vcache, layer = carry  # for QKVCache: (x, q, s, layer)
        h = layer_norm(x, p["attn_ln"]["g"], p["attn_ln"]["b"])
        if _use_fused_qkv():
            q, k_new, v_new = _fused_qkv(h, p["attn"], dt)
        else:
            q = _linear(h, p["attn"]["wq"], p["attn"]["bq"], dt)
            k_new = _linear(h, p["attn"]["wk"], None, dt)
            v_new = _linear(h, p["attn"]["wv"], p["attn"]["bv"], dt)
        # per-stream scatter: cache[l, b, :, :, offsets[b]] = new (position-minor)
        dh = cfg.head_dim_text
        kh = k_new[:, 0, :].reshape(B, n_head, dh)
        vh = v_new[:, 0, :].reshape(B, n_head, dh)
        if self_quant:
            qn, sn = quantize_kv_heads(kh[:, :, None], vh[:, :, None])
            # advanced-index scatter: (B,) batch + (B,) offsets ->
            # target (B, H, 2, dh) / (B, H, 2)
            kcache = kcache.at[layer, barange, :, :, :, offsets].set(qn[..., 0])
            vcache = vcache.at[layer, barange, :, :, offsets].set(sn[..., 0])
            o = attention_int8kv_perpos(
                _split_heads(q, n_head),
                jax.lax.dynamic_index_in_dim(kcache, layer, 0, keepdims=False),
                jax.lax.dynamic_index_in_dim(vcache, layer, 0, keepdims=False),
                mask=vis)
        else:
            kcache = kcache.at[layer, barange, :, :, offsets].set(
                kh.astype(kcache.dtype))
            vcache = vcache.at[layer, barange, :, :, offsets].set(
                vh.astype(vcache.dtype))
            k_full = jax.lax.dynamic_index_in_dim(kcache, layer, 0, keepdims=False).astype(dt)
            v_full = jax.lax.dynamic_index_in_dim(vcache, layer, 0, keepdims=False).astype(dt)
            o = attention_kvt(_split_heads(q, n_head), k_full, v_full, mask=vis)
        x = x + _linear(_merge_heads(o), p["attn"]["wo"], p["attn"]["bo"], dt)

        h = layer_norm(x, p["cross_ln"]["g"], p["cross_ln"]["b"])
        q = _linear(h, p["cross"]["wq"], p["cross"]["bq"], dt)
        if decode_flash:
            o = _pallas_cross_decode(_split_heads(q, n_head), cross)
        elif kv_quant:
            o = attention_int8kv(_split_heads(q, n_head), cross[0], cross[1],
                                 cross[2], cross[3])
        else:
            o = attention(_split_heads(q, n_head), cross[0].astype(dt),
                          cross[1].astype(dt))
        x = x + _linear(_merge_heads(o), p["cross"]["wo"], p["cross"]["bo"], dt)

        h = layer_norm(x, p["mlp_ln"]["g"], p["mlp_ln"]["b"])
        h = _gelu(_linear(h, p["mlp"]["w1"], p["mlp"]["b1"], dt))
        x = x + _linear(h, p["mlp"]["w2"], p["mlp"]["b2"], dt)
        return (x, kcache, vcache, layer + 1), None

    (x, kc, vc, _), _ = jax.lax.scan(
        scan_block, (x, kv[0], kv[1], 0), (dec["blocks"],) + tuple(cross_kv),
        unroll=_decode_unroll())

    x = layer_norm(x, dec["ln"]["g"], dec["ln"]["b"])
    logits = _logits(x, dec, dt)
    return logits[:, 0], type(kv)(kc, vc)


def decoder_window_multipos(
    params: Params,
    tokens: jnp.ndarray,   # (B, W) int32 — a token window per stream
    offsets: jnp.ndarray,  # (B,) int32 — per-stream first write/attend position
    kv: KVCache,
    cross_kv: Tuple[jnp.ndarray, jnp.ndarray],
    cfg: WhisperConfig,
    compute_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, KVCache]:
    """W tokens per stream, each stream at its OWN position — the
    speculative-decoding verify primitive (spec_decode.py).

    Generalizes ``decoder_step_multipos`` from one token to a width-W
    window: stream b's tokens occupy absolute positions
    ``offsets[b] .. offsets[b]+W-1``; the KV cache is scattered at those
    per-row positions and self-attention sees the validated cache prefix
    plus the causal part of the window (key_pos <= query_pos). Stale cache
    entries past the window (a previous round's rejected draft KV) are
    masked out by the same comparison. Returns (logits (B, W, n_vocab),
    updated kv) — logits[:, j] predicts the token at position
    offsets+j+1. No reference analog: the reference decodes strictly one
    token per NPU call (python/whisper.py:241-253).

    Deliberately a structural twin of ``decoder_step_multipos`` — edit
    the block bodies together. Two intentional divergences: the pallas
    decode-flash cross path is not taken (it was measured SLOWER than
    XLA's lowering even at Tq=1, BENCH_NOTES r3, and the window runs at
    Tq=W), and ``pads`` is unsupported (spec decode shares one prompt
    prefix per batch)."""
    dec = params["decoder"]
    dt = compute_dtype
    B, W = tokens.shape
    T = kv[0].shape[-1]
    n_head = cfg.n_text_head
    barange = jnp.arange(B)

    tok_emb = jnp.take(dec["tok_emb"], tokens, axis=0).astype(dt)  # (B, W, D)
    pos_idx = jnp.clip(offsets[:, None] + jnp.arange(W)[None, :], 0,
                       dec["pos_emb"].shape[0] - 1)                # (B, W)
    x = tok_emb + jnp.take(dec["pos_emb"], pos_idx, axis=0).astype(dt)

    # visibility: cache prefix + causal window, per row
    q_abs = offsets[:, None] + jnp.arange(W)[None, :]              # (B, W)
    key_pos = jnp.arange(T)[None, None, :]                         # (1, 1, T)
    vis = (key_pos <= q_abs[:, :, None])[:, None, :, :]            # (B,1,W,T)

    kv_quant = len(cross_kv) == 4
    self_quant = isinstance(kv, QKVCache)
    # out-of-bounds window positions (a row near the cache edge) DROP:
    # clipping would duplicate-write position T-1 and XLA's scatter picks
    # an arbitrary duplicate — the real entry could lose to stale junk
    write_pos = q_abs                                              # (B, W)

    def scan_block(carry, inp):
        p, cross = inp[0], inp[1:]
        x, kcache, vcache, layer = carry
        h = layer_norm(x, p["attn_ln"]["g"], p["attn_ln"]["b"])
        if _use_fused_qkv():
            q, k_new, v_new = _fused_qkv(h, p["attn"], dt)
        else:
            q = _linear(h, p["attn"]["wq"], p["attn"]["bq"], dt)
            k_new = _linear(h, p["attn"]["wk"], None, dt)
            v_new = _linear(h, p["attn"]["wv"], p["attn"]["bv"], dt)
        dh = cfg.head_dim_text
        kh = k_new.reshape(B, W, n_head, dh)
        vh = v_new.reshape(B, W, n_head, dh)
        if self_quant:
            # quantize per (row, position): (B, H, W, dh) -> packed
            qn, sn = quantize_kv_heads(kh.transpose(0, 2, 1, 3),
                                       vh.transpose(0, 2, 1, 3))
            # qn (B, H, 2, dh, W) / sn (B, H, 2, W); scatter W positions at
            # per-row write_pos: advanced indices (B,1)+(B,W) -> (B, W, ...)
            kcache = kcache.at[layer, barange[:, None], :, :, :,
                               write_pos].set(qn.transpose(0, 4, 1, 2, 3),
                                              mode="drop")
            vcache = vcache.at[layer, barange[:, None], :, :,
                               write_pos].set(sn.transpose(0, 3, 1, 2),
                                              mode="drop")
            o = attention_int8kv_perpos(
                _split_heads(q, n_head),
                jax.lax.dynamic_index_in_dim(kcache, layer, 0, keepdims=False),
                jax.lax.dynamic_index_in_dim(vcache, layer, 0, keepdims=False),
                mask=vis)
        else:
            # cache (L, B, H, dh, T): scatter (B, W, H, dh) at write_pos
            kcache = kcache.at[layer, barange[:, None], :, :, write_pos].set(
                kh.astype(kcache.dtype), mode="drop")
            vcache = vcache.at[layer, barange[:, None], :, :, write_pos].set(
                vh.astype(vcache.dtype), mode="drop")
            k_full = jax.lax.dynamic_index_in_dim(
                kcache, layer, 0, keepdims=False).astype(dt)
            v_full = jax.lax.dynamic_index_in_dim(
                vcache, layer, 0, keepdims=False).astype(dt)
            o = attention_kvt(_split_heads(q, n_head), k_full, v_full, mask=vis)
        x = x + _linear(_merge_heads(o), p["attn"]["wo"], p["attn"]["bo"], dt)

        h = layer_norm(x, p["cross_ln"]["g"], p["cross_ln"]["b"])
        q = _linear(h, p["cross"]["wq"], p["cross"]["bq"], dt)
        if kv_quant:
            o = attention_int8kv(_split_heads(q, n_head), cross[0], cross[1],
                                 cross[2], cross[3])
        else:
            o = attention(_split_heads(q, n_head), cross[0].astype(dt),
                          cross[1].astype(dt))
        x = x + _linear(_merge_heads(o), p["cross"]["wo"], p["cross"]["bo"], dt)

        h = layer_norm(x, p["mlp_ln"]["g"], p["mlp_ln"]["b"])
        h = _gelu(_linear(h, p["mlp"]["w1"], p["mlp"]["b1"], dt))
        x = x + _linear(h, p["mlp"]["w2"], p["mlp"]["b2"], dt)
        return (x, kcache, vcache, layer + 1), None

    (x, kc, vc, _), _ = jax.lax.scan(
        scan_block, (x, kv[0], kv[1], 0), (dec["blocks"],) + tuple(cross_kv),
        unroll=_decode_unroll())

    x = layer_norm(x, dec["ln"]["g"], dec["ln"]["b"])
    logits = _logits(x, dec, dt)
    return logits, type(kv)(kc, vc)


# ------------------------------------------------------------------ init
def _dense_init(key, d_in, d_out, scale=None):
    scale = scale if scale is not None else d_in ** -0.5
    return jax.random.normal(key, (d_in, d_out), jnp.float32) * scale


def init_params(cfg: WhisperConfig, key: Optional[jax.Array] = None) -> Params:
    """Random-init params with the real layout (tests/bench; real weights come
    from whisper_tpu.models.checkpoint loaders). One jitted program — the
    eager version issued ~70 separate device ops, each a round trip on a
    tunneled device (part of the r4 bench's cold start, VERDICT r4 #7)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    return _init_params_jit(cfg, key)


@functools.partial(jax.jit, static_argnums=(0,))
def _init_params_jit(cfg: WhisperConfig, key: jax.Array) -> Params:
    ks = iter(jax.random.split(key, 64))
    D, Dt = cfg.n_audio_state, cfg.n_text_state
    La, Lt = cfg.n_audio_layer, cfg.n_text_layer

    def ln():
        return {"g": jnp.ones((D,)), "b": jnp.zeros((D,))}

    def ln_t():
        return {"g": jnp.ones((Dt,)), "b": jnp.zeros((Dt,))}

    def attn_params(k, L, d):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        return {
            "wq": jax.random.normal(k1, (L, d, d)) * d ** -0.5,
            "bq": jnp.zeros((L, d)),
            "wk": jax.random.normal(k2, (L, d, d)) * d ** -0.5,
            "wv": jax.random.normal(k3, (L, d, d)) * d ** -0.5,
            "bv": jnp.zeros((L, d)),
            "wo": jax.random.normal(k4, (L, d, d)) * d ** -0.5,
            "bo": jnp.zeros((L, d)),
        }

    def mlp_params(k, L, d):
        k1, k2 = jax.random.split(k)
        return {
            "w1": jax.random.normal(k1, (L, d, 4 * d)) * d ** -0.5,
            "b1": jnp.zeros((L, 4 * d)),
            "w2": jax.random.normal(k2, (L, 4 * d, d)) * (4 * d) ** -0.5,
            "b2": jnp.zeros((L, d)),
        }

    def stacked_ln(L, d):
        return {"g": jnp.ones((L, d)), "b": jnp.zeros((L, d))}

    encoder = {
        "conv1": {"w": jax.random.normal(next(ks), (3, cfg.n_mels, D)) * (3 * cfg.n_mels) ** -0.5,
                  "b": jnp.zeros((D,))},
        "conv2": {"w": jax.random.normal(next(ks), (3, D, D)) * (3 * D) ** -0.5,
                  "b": jnp.zeros((D,))},
        "pos_emb": jnp.asarray(sinusoids(cfg.n_audio_ctx, D)),
        "blocks": {
            "attn_ln": stacked_ln(La, D),
            "attn": attn_params(next(ks), La, D),
            "mlp_ln": stacked_ln(La, D),
            "mlp": mlp_params(next(ks), La, D),
        },
        "ln_post": ln(),
    }
    decoder = {
        "tok_emb": jax.random.normal(next(ks), (cfg.n_vocab, Dt)) * Dt ** -0.5,
        "pos_emb": jax.random.normal(next(ks), (cfg.n_text_ctx, Dt)) * 0.01,
        "blocks": {
            "attn_ln": stacked_ln(Lt, Dt),
            "attn": attn_params(next(ks), Lt, Dt),
            "cross_ln": stacked_ln(Lt, Dt),
            "cross": attn_params(next(ks), Lt, Dt),
            "mlp_ln": stacked_ln(Lt, Dt),
            "mlp": mlp_params(next(ks), Lt, Dt),
        },
        "ln": ln_t(),
    }
    return {"encoder": encoder, "decoder": decoder}
