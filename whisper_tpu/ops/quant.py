"""Weight quantization: int8 per-channel weights with high-precision islands.

The reference ships U16 PTQ models built offline by Pulsar2, with FP32
islands pinned for Gather/residual-Add/Softmax (model_convert/
config_whisper_decoder_u16.json:47-63) — a calibration pipeline + external
compiler. The TPU-native equivalent is load-time weight-only quantization:

- attention and MLP matmul weights -> symmetric int8 per output channel
  (halves HBM traffic, the decode-step bottleneck);
- embeddings, layernorms, biases, conv stem stay high precision — the same
  islands the reference's recipe needed for WER parity;
- dequantization fuses into the matmul at compile time (int8 read, cast,
  scale), no separate calibration dataset or export step.

``QTensor`` is a registered pytree node so quantized params flow through
jit/scan/sharding like plain arrays.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclass
class QTensor:
    """Symmetric per-output-channel int8 weight: w ≈ q * s."""

    q: jnp.ndarray  # int8, same shape as original weight
    s: jnp.ndarray  # fp32 scale, shape = w.shape with contraction dims = 1

    def tree_flatten(self):
        return (self.q, self.s), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return self.q.shape

    @property
    def dtype(self):  # for jnp.issubdtype checks in dtype-cast tree_maps
        return self.s.dtype

    def astype(self, dt):
        # keep int8 payload; scales track the requested compute dtype policy
        return QTensor(self.q, self.s)

    def dequant(self, dt=jnp.float32) -> jnp.ndarray:
        return self.q.astype(dt) * self.s.astype(dt)


import functools


@functools.partial(jax.jit, static_argnames=("red",))
def _quantize_jit(w, red):
    w = w.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(w), axis=red, keepdims=True), 1e-8)
    s = (amax / 127.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return q, s


def quantize_weight(w, axis: int = -1, batch_axes=()) -> QTensor:
    """Symmetric int8 reducing over all dims except `axis` (output channel)
    and `batch_axes` (e.g. the stacked layer axis).

    Runs as a jitted device computation: params already on device are
    quantized IN PLACE on the chip — no host round trip. (The first numpy
    version pulled every leaf through the axon tunnel: 203 s of the W8A8
    flagship's startup; device-side it's a handful of cached compiles.)
    Accepts numpy or jax arrays; jnp.round matches np.round half-to-even.
    """
    ndim = np.ndim(w)
    keep = {axis % ndim} | {a % ndim for a in batch_axes}
    red = tuple(i for i in range(ndim) if i not in keep)
    q, s = _quantize_jit(jnp.asarray(w), red)
    return QTensor(q, s)


_QUANT_LEAVES = {
    # path suffixes to quantize: all big matmul weights
    ("attn", "wq"), ("attn", "wk"), ("attn", "wv"), ("attn", "wo"),
    ("cross", "wq"), ("cross", "wk"), ("cross", "wv"), ("cross", "wo"),
    ("mlp", "w1"), ("mlp", "w2"),
}


def quantize_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize attention/MLP weights in a param pytree; leave islands alone.

    Works on the stacked-layer layout from models.model.init_params /
    models.checkpoint loaders: weights are (L, d_in, d_out) -> per (L, out)
    channel scales.
    """

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        if len(path) >= 2 and (path[-2], path[-1]) in _QUANT_LEAVES:
            # stacked (L, d_in, d_out) weights: per (layer, out-channel)
            # scale. Pass the leaf straight to the jitted device quantizer —
            # an np.asarray here pulled every quant leaf through the device
            # tunnel and re-uploaded it (~3.4 GB round trip at turbo, the
            # bulk of the r4 bench's 395 s "params ready" — VERDICT r4 #7)
            return quantize_weight(node, axis=-1, batch_axes=(0,))
        return node

    return walk(params, ())


def quantize_logits_emb(params: Dict[str, Any]) -> Dict[str, Any]:
    """Add an int8 copy of the tied embedding for the LOGITS matmul only.

    The decode step streams the whole (V, D) embedding from HBM every token
    (133 MB bf16 at turbo) to compute logits; an int8 per-vocab-row copy
    halves that. The embedding GATHER keeps the original high-precision
    table (the same FP32-island policy the reference pins for Gather ops,
    model_convert/config_whisper_decoder_u16.json:47-63). Gate accuracy with
    whisper_tpu.eval.quant_gate (variant ``int8_logits``).
    """
    out = dict(params)
    dec = dict(out["decoder"])
    dec["tok_emb_q8"] = quantize_weight(
        np.asarray(dec["tok_emb"]), axis=0)  # per-vocab-row scales (V, 1)
    out["decoder"] = dec
    return out


def quantized_bytes(params) -> int:
    """Total parameter bytes after quantization (for memory reporting)."""
    total = 0
    for leaf in jax.tree.leaves(params, is_leaf=lambda x: isinstance(x, QTensor)):
        if isinstance(leaf, QTensor):
            total += leaf.q.size + leaf.s.size * 4
        else:
            total += leaf.size * np.dtype(leaf.dtype).itemsize
    return total
