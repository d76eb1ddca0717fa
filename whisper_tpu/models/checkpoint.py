"""Checkpoint loading: OpenAI Whisper ``.pt`` and HF Transformers weights.

Replaces the reference's offline conversion toolchain (model_convert/
export_onnx.py: PyTorch -> ONNX -> Pulsar2 .axmodel) with direct weight
ingestion: torch/HF state dicts are remapped into this package's stacked
param pytree at load time — no export step, no external compiler.
"""

from __future__ import annotations

import json
import os
import struct
from typing import Any, Dict, Optional, Tuple

import numpy as np

from ..config import WhisperConfig, get_config
from .model import Params, sinusoids


# ------------------------------------------------------------- file readers
def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Minimal safetensors reader (header JSON + raw buffer); no deps."""
    _DTYPES = {
        "F64": np.float64, "F32": np.float32, "F16": np.float16,
        "I64": np.int64, "I32": np.int32, "I16": np.int16, "I8": np.int8,
        "U8": np.uint8, "BOOL": np.bool_,
    }
    out: Dict[str, np.ndarray] = {}
    with open(path, "rb") as f:
        raw = f.read(8)
        if len(raw) < 8:
            raise ValueError(f"{path}: not a safetensors file (truncated header)")
        (hlen,) = struct.unpack("<Q", raw)
        if hlen > os.path.getsize(path):
            raise ValueError(f"{path}: not a safetensors file (bad header length)")
        header = json.loads(f.read(hlen))
        body = f.read()
    for name, meta in header.items():
        if name == "__metadata__":
            continue
        dt = meta["dtype"]
        s, e = meta["data_offsets"]
        raw = body[s:e]
        if dt == "BF16":
            u16 = np.frombuffer(raw, dtype=np.uint16)
            arr = (u16.astype(np.uint32) << 16).view(np.float32)
        else:
            arr = np.frombuffer(raw, dtype=_DTYPES[dt])
        out[name] = arr.reshape(meta["shape"]).copy()
    return out


def load_torch_pt(path: str) -> Tuple[Dict[str, np.ndarray], Optional[dict]]:
    """Load an OpenAI whisper ``.pt`` checkpoint -> (state dict, dims dict)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    dims = None
    if isinstance(ckpt, dict) and "model_state_dict" in ckpt:
        dims = ckpt.get("dims")
        sd = ckpt["model_state_dict"]
    else:
        sd = ckpt
    return {k: v.float().numpy() for k, v in sd.items()}, dims


def save_safetensors(path: str, tensors: Dict[str, np.ndarray],
                     metadata: Optional[Dict[str, str]] = None) -> None:
    """Minimal safetensors writer (inverse of load_safetensors)."""
    _NAMES = {
        np.dtype(np.float64): "F64", np.dtype(np.float32): "F32",
        np.dtype(np.float16): "F16", np.dtype(np.int64): "I64",
        np.dtype(np.int32): "I32", np.dtype(np.int16): "I16",
        np.dtype(np.int8): "I8", np.dtype(np.uint8): "U8",
        np.dtype(np.bool_): "BOOL",
    }
    header: Dict[str, Any] = {}
    if metadata:
        header["__metadata__"] = metadata
    offset = 0
    blobs = []
    for name in sorted(tensors):
        arr = np.ascontiguousarray(tensors[name])
        if arr.dtype not in _NAMES:  # e.g. bfloat16 -> store raw as uint16? keep f32
            arr = arr.astype(np.float32)
        blob = arr.tobytes()
        header[name] = {
            "dtype": _NAMES[arr.dtype],
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + len(blob)],
        }
        offset += len(blob)
        blobs.append(blob)
    hjson = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        for b in blobs:
            f.write(b)


def save_params(path: str, params, cfg: Optional[WhisperConfig] = None) -> None:
    """Serialize a param pytree (incl. quantized QTensor leaves) to one
    safetensors file — this stack's own snapshot format for fast reload
    (the reference's equivalent artifact is the compiled .axmodel pair)."""
    from ..ops.quant import QTensor

    flat: Dict[str, np.ndarray] = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}{k}.")
        elif isinstance(node, QTensor):
            flat[prefix + "__q"] = np.asarray(node.q)
            flat[prefix + "__s"] = np.asarray(node.s)
        else:
            flat[prefix.rstrip(".")] = np.asarray(node)

    walk(params, "")
    meta = {"format": "whisper_tpu.v1"}
    if cfg is not None:
        meta["config"] = cfg.to_json()
    save_safetensors(path, flat, metadata=meta)


def load_params(path: str):
    """Load a save_params snapshot -> (params pytree, WhisperConfig or None)."""
    from ..ops.quant import QTensor

    with open(path, "rb") as f:
        raw = f.read(8)
        if len(raw) < 8:
            raise ValueError(f"{path}: not a safetensors file (truncated header)")
        (hlen,) = struct.unpack("<Q", raw)
        if hlen > os.path.getsize(path):
            raise ValueError(f"{path}: not a safetensors file (bad header length)")
        header = json.loads(f.read(hlen))
    meta = header.get("__metadata__", {})
    flat = load_safetensors(path)

    params: Dict[str, Any] = {}
    qparts: Dict[str, Dict[str, np.ndarray]] = {}
    for name, arr in flat.items():
        if name.endswith("__q") or name.endswith("__s"):
            base, kind = name.rsplit(".", 1)
            qparts.setdefault(base, {})[kind] = arr
            continue
        node = params
        parts = name.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    import jax.numpy as jnp

    for base, kv in qparts.items():
        node = params
        parts = base.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = QTensor(jnp.asarray(kv["__q"]), jnp.asarray(kv["__s"]))

    cfg = WhisperConfig.from_json(meta["config"]) if "config" in meta else None
    return params, cfg


# ------------------------------------------------------------- converters
def _stack(arrs) -> np.ndarray:
    return np.stack([np.asarray(a, dtype=np.float32) for a in arrs], axis=0)


def from_openai_state_dict(sd: Dict[str, np.ndarray], cfg: WhisperConfig) -> Params:
    """OpenAI whisper naming (encoder.blocks.N.attn.query.weight, ...)."""

    def lin_w(name):  # torch Linear stores (out, in); we use (in, out)
        return np.asarray(sd[name], dtype=np.float32).T

    def get(name):
        return np.asarray(sd[name], dtype=np.float32)

    def attn(prefix, L, cross=False):
        stem = "cross_attn" if cross else "attn"
        return {
            "wq": _stack(lin_w(f"{prefix}.{i}.{stem}.query.weight") for i in range(L)),
            "bq": _stack(get(f"{prefix}.{i}.{stem}.query.bias") for i in range(L)),
            "wk": _stack(lin_w(f"{prefix}.{i}.{stem}.key.weight") for i in range(L)),
            "wv": _stack(lin_w(f"{prefix}.{i}.{stem}.value.weight") for i in range(L)),
            "bv": _stack(get(f"{prefix}.{i}.{stem}.value.bias") for i in range(L)),
            "wo": _stack(lin_w(f"{prefix}.{i}.{stem}.out.weight") for i in range(L)),
            "bo": _stack(get(f"{prefix}.{i}.{stem}.out.bias") for i in range(L)),
        }

    def stacked_ln(prefix, L, name):
        return {
            "g": _stack(get(f"{prefix}.{i}.{name}.weight") for i in range(L)),
            "b": _stack(get(f"{prefix}.{i}.{name}.bias") for i in range(L)),
        }

    def mlp(prefix, L):
        return {
            "w1": _stack(lin_w(f"{prefix}.{i}.mlp.0.weight") for i in range(L)),
            "b1": _stack(get(f"{prefix}.{i}.mlp.0.bias") for i in range(L)),
            "w2": _stack(lin_w(f"{prefix}.{i}.mlp.2.weight") for i in range(L)),
            "b2": _stack(get(f"{prefix}.{i}.mlp.2.bias") for i in range(L)),
        }

    La, Lt = cfg.n_audio_layer, cfg.n_text_layer
    pos_enc = (
        get("encoder.positional_embedding")
        if "encoder.positional_embedding" in sd
        else sinusoids(cfg.n_audio_ctx, cfg.n_audio_state)
    )
    encoder = {
        # torch Conv1d weight (out, in, k) -> (k, in, out) WIO
        "conv1": {"w": get("encoder.conv1.weight").transpose(2, 1, 0),
                  "b": get("encoder.conv1.bias")},
        "conv2": {"w": get("encoder.conv2.weight").transpose(2, 1, 0),
                  "b": get("encoder.conv2.bias")},
        "pos_emb": pos_enc,
        "blocks": {
            "attn_ln": stacked_ln("encoder.blocks", La, "attn_ln"),
            "attn": attn("encoder.blocks", La),
            "mlp_ln": stacked_ln("encoder.blocks", La, "mlp_ln"),
            "mlp": mlp("encoder.blocks", La),
        },
        "ln_post": {"g": get("encoder.ln_post.weight"), "b": get("encoder.ln_post.bias")},
    }
    decoder = {
        "tok_emb": get("decoder.token_embedding.weight"),
        "pos_emb": get("decoder.positional_embedding"),
        "blocks": {
            "attn_ln": stacked_ln("decoder.blocks", Lt, "attn_ln"),
            "attn": attn("decoder.blocks", Lt),
            "cross_ln": stacked_ln("decoder.blocks", Lt, "cross_attn_ln"),
            "cross": attn("decoder.blocks", Lt, cross=True),
            "mlp_ln": stacked_ln("decoder.blocks", Lt, "mlp_ln"),
            "mlp": mlp("decoder.blocks", Lt),
        },
        "ln": {"g": get("decoder.ln.weight"), "b": get("decoder.ln.bias")},
    }
    return {"encoder": encoder, "decoder": decoder}


def from_hf_state_dict(sd: Dict[str, np.ndarray], cfg: WhisperConfig) -> Params:
    """HF Transformers naming (model.encoder.layers.N.self_attn.q_proj...)."""
    # tolerate both "model.encoder..." and "encoder..." prefixes
    if not any(k.startswith("model.") for k in sd) and "encoder.conv1.weight" in sd:
        sd = {f"model.{k}": v for k, v in sd.items()}

    def lin_w(name):
        return np.asarray(sd[name], dtype=np.float32).T

    def get(name):
        return np.asarray(sd[name], dtype=np.float32)

    def attn(prefix, L, stem):
        return {
            "wq": _stack(lin_w(f"{prefix}.{i}.{stem}.q_proj.weight") for i in range(L)),
            "bq": _stack(get(f"{prefix}.{i}.{stem}.q_proj.bias") for i in range(L)),
            "wk": _stack(lin_w(f"{prefix}.{i}.{stem}.k_proj.weight") for i in range(L)),
            "wv": _stack(lin_w(f"{prefix}.{i}.{stem}.v_proj.weight") for i in range(L)),
            "bv": _stack(get(f"{prefix}.{i}.{stem}.v_proj.bias") for i in range(L)),
            "wo": _stack(lin_w(f"{prefix}.{i}.{stem}.out_proj.weight") for i in range(L)),
            "bo": _stack(get(f"{prefix}.{i}.{stem}.out_proj.bias") for i in range(L)),
        }

    def stacked_ln(prefix, L, name):
        return {
            "g": _stack(get(f"{prefix}.{i}.{name}.weight") for i in range(L)),
            "b": _stack(get(f"{prefix}.{i}.{name}.bias") for i in range(L)),
        }

    def mlp(prefix, L):
        return {
            "w1": _stack(lin_w(f"{prefix}.{i}.fc1.weight") for i in range(L)),
            "b1": _stack(get(f"{prefix}.{i}.fc1.bias") for i in range(L)),
            "w2": _stack(lin_w(f"{prefix}.{i}.fc2.weight") for i in range(L)),
            "b2": _stack(get(f"{prefix}.{i}.fc2.bias") for i in range(L)),
        }

    La, Lt = cfg.n_audio_layer, cfg.n_text_layer
    ep = "model.encoder.layers"
    dp = "model.decoder.layers"
    encoder = {
        "conv1": {"w": get("model.encoder.conv1.weight").transpose(2, 1, 0),
                  "b": get("model.encoder.conv1.bias")},
        "conv2": {"w": get("model.encoder.conv2.weight").transpose(2, 1, 0),
                  "b": get("model.encoder.conv2.bias")},
        "pos_emb": get("model.encoder.embed_positions.weight")
        if "model.encoder.embed_positions.weight" in sd
        else sinusoids(cfg.n_audio_ctx, cfg.n_audio_state),
        "blocks": {
            "attn_ln": stacked_ln(ep, La, "self_attn_layer_norm"),
            "attn": attn(ep, La, "self_attn"),
            "mlp_ln": stacked_ln(ep, La, "final_layer_norm"),
            "mlp": mlp(ep, La),
        },
        "ln_post": {"g": get("model.encoder.layer_norm.weight"),
                    "b": get("model.encoder.layer_norm.bias")},
    }
    decoder = {
        "tok_emb": get("model.decoder.embed_tokens.weight"),
        "pos_emb": get("model.decoder.embed_positions.weight"),
        "blocks": {
            "attn_ln": stacked_ln(dp, Lt, "self_attn_layer_norm"),
            "attn": attn(dp, Lt, "self_attn"),
            "cross_ln": stacked_ln(dp, Lt, "encoder_attn_layer_norm"),
            "cross": attn(dp, Lt, "encoder_attn"),
            "mlp_ln": stacked_ln(dp, Lt, "final_layer_norm"),
            "mlp": mlp(dp, Lt),
        },
        "ln": {"g": get("model.decoder.layer_norm.weight"),
               "b": get("model.decoder.layer_norm.bias")},
    }
    return {"encoder": encoder, "decoder": decoder}


# ------------------------------------------------------------- entry point
def _dims_to_config(dims: dict, name: str = "custom") -> WhisperConfig:
    num_languages = dims.get("n_vocab", 51865) - 51765  # 51865->99, 51866->100
    return WhisperConfig(
        name=name,
        n_mels=dims["n_mels"],
        n_audio_ctx=dims["n_audio_ctx"],
        n_audio_state=dims["n_audio_state"],
        n_audio_head=dims["n_audio_head"],
        n_audio_layer=dims["n_audio_layer"],
        n_vocab=dims["n_vocab"],
        n_text_ctx=dims["n_text_ctx"],
        n_text_state=dims["n_text_state"],
        n_text_head=dims["n_text_head"],
        n_text_layer=dims["n_text_layer"],
        num_languages=num_languages,
    )


def load_checkpoint(path: str, size: Optional[str] = None) -> Tuple[Params, WhisperConfig]:
    """Load weights from a file or directory.

    Accepts: OpenAI ``{size}.pt``; an HF model dir (config.json +
    model.safetensors / pytorch_model.bin); a bare ``.safetensors`` file
    (requires ``size``).
    """
    if os.path.isdir(path):
        cfg_file = os.path.join(path, "config.json")
        hf_cfg = json.load(open(cfg_file)) if os.path.exists(cfg_file) else {}
        cfg = WhisperConfig(
            name=size or os.path.basename(path.rstrip("/")),
            n_mels=hf_cfg.get("num_mel_bins", 80),
            n_audio_state=hf_cfg.get("d_model", 384),
            n_audio_head=hf_cfg.get("encoder_attention_heads", 6),
            n_audio_layer=hf_cfg.get("encoder_layers", 4),
            n_vocab=hf_cfg.get("vocab_size", 51865),
            n_text_ctx=hf_cfg.get("max_target_positions", 448),
            n_text_state=hf_cfg.get("d_model", 384),
            n_text_head=hf_cfg.get("decoder_attention_heads", 6),
            n_text_layer=hf_cfg.get("decoder_layers", 4),
            num_languages=hf_cfg.get("vocab_size", 51865) - 51765,
        )
        st = os.path.join(path, "model.safetensors")
        pt = os.path.join(path, "pytorch_model.bin")
        if os.path.exists(st):
            sd = load_safetensors(st)
        elif os.path.exists(pt):
            import torch

            sd = {k: v.float().numpy() for k, v in torch.load(pt, map_location="cpu").items()}
        else:
            raise FileNotFoundError(f"no weights found in {path}")
        return from_hf_state_dict(sd, cfg), cfg

    if path.endswith(".safetensors"):
        if size is None:
            raise ValueError("bare .safetensors needs size=")
        cfg = get_config(size)
        sd = load_safetensors(path)
        is_hf = any("q_proj" in k for k in sd)
        return (from_hf_state_dict if is_hf else from_openai_state_dict)(sd, cfg), cfg

    sd, dims = load_torch_pt(path)
    if dims is not None:
        cfg = _dims_to_config(dict(dims.__dict__) if hasattr(dims, "__dict__") else dict(dims),
                              name=size or os.path.basename(path).split(".")[0])
    else:
        if size is None:
            raise ValueError("checkpoint has no dims; pass size=")
        cfg = get_config(size)
    is_hf = any("q_proj" in k for k in sd)
    return (from_hf_state_dict if is_hf else from_openai_state_dict)(sd, cfg), cfg
