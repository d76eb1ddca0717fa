"""Multi-chip sharding: mesh construction + partition specs for DP/TP.

The reference is strictly single-NPU batch-1 (SURVEY.md §2.4;
AX_ENGINE_RunSync at cpp/src/ax_model_runner/ax_model_runner.cpp:102). Here
scaling is first-class and TPU-idiomatic: a ``(data, model)``
``jax.sharding.Mesh``, utterance batches sharded over ``data`` (DP across
hosts/chips), and Whisper-Turbo weights tensor-sharded over ``model``
(attention heads + MLP hidden + embedding width), with XLA's SPMD partitioner
inserting the ICI collectives (psum for the contracted dims of ``wo``/``w2``
and the tied-embedding logits).

Cross-KV and the decode KV cache stay in HBM sharded the same way — the
reference's AX_DMA_MemCopy plumbing (cpp/src/Whisper.cpp:260-288) dissolves
into sharding annotations.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import WhisperConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"

# The mesh the serving/offline path is currently running under, if any.
# Pallas kernels cannot be auto-partitioned by GSPMD the way einsums are —
# call sites consult this to wrap kernels in shard_map (or fall back to the
# XLA lowering) when tensor parallelism is active.
_ACTIVE_MESH: Optional[Mesh] = None


def set_active_mesh(mesh: Optional[Mesh]) -> None:
    """Declare the mesh jitted model code will run under (None to clear)."""
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def active_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices=None,
) -> Mesh:
    """Build a (data, model) mesh. Defaults: all devices on the data axis."""
    explicit = devices is not None
    devices = devices if explicit else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    want = n_data * n_model
    if not explicit and want < n:
        devices = devices[:want]  # explicit shape: use the first N devices
        n = want
    assert want == n, f"{n_data}x{n_model} != {n} devices"
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def _attn_specs() -> Dict[str, P]:
    """Head-sharded attention: out-dims of q/k/v over MODEL, in-dim of o."""
    return {
        "wq": P(None, None, MODEL_AXIS),
        "bq": P(None, MODEL_AXIS),
        "wk": P(None, None, MODEL_AXIS),
        "wv": P(None, None, MODEL_AXIS),
        "bv": P(None, MODEL_AXIS),
        "wo": P(None, MODEL_AXIS, None),
        "bo": P(None, None),
    }


def _mlp_specs() -> Dict[str, P]:
    return {
        "w1": P(None, None, MODEL_AXIS),
        "b1": P(None, MODEL_AXIS),
        "w2": P(None, MODEL_AXIS, None),
        "b2": P(None, None),
    }


def _ln_specs() -> Dict[str, P]:
    return {"g": P(None, None), "b": P(None, None)}


def param_specs(cfg: WhisperConfig) -> Dict[str, Any]:
    """PartitionSpec pytree matching models.model.init_params structure."""
    return {
        "encoder": {
            "conv1": {"w": P(), "b": P()},
            "conv2": {"w": P(), "b": P()},
            "pos_emb": P(),
            "blocks": {
                "attn_ln": _ln_specs(),
                "attn": _attn_specs(),
                "mlp_ln": _ln_specs(),
                "mlp": _mlp_specs(),
            },
            "ln_post": {"g": P(), "b": P()},
        },
        "decoder": {
            # vocab-dim sharding keeps the (V, D) embedding distributed and
            # turns the tied-logits matmul into an all-gather-free psum
            "tok_emb": P(MODEL_AXIS, None),
            "pos_emb": P(),
            "blocks": {
                "attn_ln": _ln_specs(),
                "attn": _attn_specs(),
                "cross_ln": _ln_specs(),
                "cross": _attn_specs(),
                "mlp_ln": _ln_specs(),
                "mlp": _mlp_specs(),
            },
            "ln": {"g": P(), "b": P()},
        },
    }


def data_specs() -> Dict[str, P]:
    """Activation specs: batch over DATA, width over MODEL where it helps."""
    return {
        "mel": P(DATA_AXIS, None, None),
        "tokens": P(DATA_AXIS, None),
        "audio": P(DATA_AXIS, None, None),
        # head-major caches (L, B, H, T, dh): batch over data, heads over model
        "kv": P(None, DATA_AXIS, MODEL_AXIS, None, None),
        "cross_kv": P(None, DATA_AXIS, MODEL_AXIS, None, None),
        "logits": P(DATA_AXIS, None, None),
    }


def _fit_spec(spec: P, shape, mesh: Mesh) -> P:
    """Drop spec axes that don't evenly divide the dim (replicate instead) —
    e.g. tok_emb's vocab dim 51865 = 5x11x23x41 rarely divides the TP degree."""
    out = []
    for i, ax in enumerate(spec):
        if ax is not None and i < len(shape) and shape[i] % mesh.shape[ax] != 0:
            out.append(None)
        else:
            out.append(ax)
    return P(*out)


def shard_params(params, mesh: Mesh, cfg: WhisperConfig):
    """Place a param pytree onto the mesh per param_specs."""
    from ..ops.quant import QTensor

    specs = param_specs(cfg)
    if "tok_emb_q8" in params.get("decoder", {}):
        # the int8 logits copy (ops.quant.quantize_logits_emb) shards like
        # the embedding it mirrors
        specs = dict(specs)
        specs["decoder"] = dict(specs["decoder"])
        specs["decoder"]["tok_emb_q8"] = specs["decoder"]["tok_emb"]

    def put(x, s):
        if isinstance(x, QTensor):
            return QTensor(
                jax.device_put(x.q, NamedSharding(mesh, _fit_spec(s, x.q.shape, mesh))),
                jax.device_put(x.s, NamedSharding(mesh, _fit_spec(s, x.s.shape, mesh))),
            )
        return jax.device_put(x, NamedSharding(mesh, _fit_spec(s, x.shape, mesh)))

    return jax.tree.map(put, params, specs,
                        is_leaf=lambda x: isinstance(x, QTensor))


def shard_batch(mesh: Mesh, mel, tokens=None):
    ds = data_specs()
    mel = jax.device_put(mel, NamedSharding(mesh, ds["mel"]))
    if tokens is None:
        return mel
    tokens = jax.device_put(tokens, NamedSharding(mesh, ds["tokens"]))
    return mel, tokens
