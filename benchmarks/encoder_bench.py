"""Encoder stage microbenchmark: where does turbo-B64's encoder time go?

Times isolated pieces of the encoder on-device (fori_loop with a data
dependency so steps serialize; result forced to host — on the axon tunnel
platform ``block_until_ready`` does not block, BENCH_NOTES.md).

    python benchmarks/encoder_bench.py --variant full --model turbo --batch 64

Variants:
  full        encoder_forward as shipped (flash per WHISPER_TPU_FLASH)
  full_xla    encoder_forward with the jnp attention path
  full_w8a8   encoder_forward with int8 weights + dynamic int8 activations
              (WHISPER_TPU_W8A8=1; the 2x-MXU mode, gate with quant_gate)
  stem        conv1 + conv2 + pos-emb only
  blocks      transformer stack only, (B, 1500, D) input
  attn        blocks with the MLP removed
  attn_proj   attn variant with the attention op itself skipped (o = q):
              isolates the qkvo projections + LN + residual
  attn_fused_qkv  attn with q,k,v computed as ONE concatenated matmul
  mlp         blocks with attention removed
  unroll4     blocks with lax.scan(unroll=4)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def build(variant: str, cfg, dt):
    import jax
    import jax.numpy as jnp

    from whisper_tpu.models.model import (
        _linear,
        _merge_heads,
        _split_heads,
        attention,
        encoder_forward,
        layer_norm,
    )
    from whisper_tpu.ops.flash_attention import flash_attention, use_flash

    n_head = cfg.n_audio_head
    flash = os.environ.get("WHISPER_TPU_FLASH", "auto")
    use_pallas = use_flash() if flash == "auto" else flash == "1"

    def stem(enc, mel):
        x = mel.astype(dt).transpose(0, 2, 1)

        def conv1d(x, w, b, stride):
            y = jax.lax.conv_general_dilated(
                x, w.astype(dt), window_strides=(stride,), padding=[(1, 1)],
                dimension_numbers=("NWC", "WIO", "NWC"),
                preferred_element_type=dt)
            return y + b.astype(dt)

        x = jax.nn.gelu(conv1d(x, enc["conv1"]["w"], enc["conv1"]["b"], 1),
                        approximate=False)
        x = jax.nn.gelu(conv1d(x, enc["conv2"]["w"], enc["conv2"]["b"], 2),
                        approximate=False)
        return x + enc["pos_emb"][: x.shape[1]].astype(dt)

    def block(x, p, do_attn=True, do_mlp=True, skip_attn_op=False,
              fused_qkv=False):  # p = per-layer params
        if do_attn:
            h = layer_norm(x, p["attn_ln"]["g"], p["attn_ln"]["b"])
            if fused_qkv:
                w = jnp.concatenate([p["attn"]["wq"], p["attn"]["wk"],
                                     p["attn"]["wv"]], axis=-1)
                qkv = _linear(h, w, None, dt)
                D = h.shape[-1]
                q = qkv[..., :D] + p["attn"]["bq"].astype(dt)
                k = qkv[..., D:2 * D]
                v = qkv[..., 2 * D:] + p["attn"]["bv"].astype(dt)
            else:
                q = _linear(h, p["attn"]["wq"], p["attn"]["bq"], dt)
                k = _linear(h, p["attn"]["wk"], None, dt)
                v = _linear(h, p["attn"]["wv"], p["attn"]["bv"], dt)
            qh, kh, vh = (_split_heads(t, n_head) for t in (q, k, v))
            if skip_attn_op:
                o = qh + kh * 0 + vh * 0  # keep q/k/v live, skip the op
            else:
                o = flash_attention(qh, kh, vh) if use_pallas else attention(qh, kh, vh)
            x = x + _linear(_merge_heads(o), p["attn"]["wo"], p["attn"]["bo"], dt)
        if do_mlp:
            h = layer_norm(x, p["mlp_ln"]["g"], p["mlp_ln"]["b"])
            h = jax.nn.gelu(_linear(h, p["mlp"]["w1"], p["mlp"]["b1"], dt),
                            approximate=False)
            x = x + _linear(h, p["mlp"]["w2"], p["mlp"]["b2"], dt)
        return x

    def blocks_fn(enc, x, do_attn=True, do_mlp=True, unroll=1,
                  skip_attn_op=False, fused_qkv=False):
        def body(x, p):
            return block(x, p, do_attn, do_mlp, skip_attn_op, fused_qkv), None

        x, _ = jax.lax.scan(body, x, enc["blocks"], unroll=unroll)
        return layer_norm(x, enc["ln_post"]["g"], enc["ln_post"]["b"]).astype(jnp.float32)

    # every fn takes (params, x): params must be a jit ARGUMENT — closing
    # over them bakes the weights into the HLO as constants, which the
    # remote compile service rejects (HTTP 413) at turbo size
    if variant in ("full", "full_xla", "full_w8a8"):
        return "mel", lambda params, mel: encoder_forward(params, mel, cfg, dt)
    if variant == "stem":
        return "mel", lambda params, mel: stem(params["encoder"], mel).astype(jnp.float32)
    if variant == "blocks":
        return "x", lambda params, x: blocks_fn(params["encoder"], x)
    if variant == "attn":
        return "x", lambda params, x: blocks_fn(params["encoder"], x, do_mlp=False)
    if variant == "attn_proj":
        return "x", lambda params, x: blocks_fn(params["encoder"], x,
                                                do_mlp=False, skip_attn_op=True)
    if variant == "attn_fused_qkv":
        return "x", lambda params, x: blocks_fn(params["encoder"], x,
                                                do_mlp=False, fused_qkv=True)
    if variant == "mlp":
        return "x", lambda params, x: blocks_fn(params["encoder"], x, do_attn=False)
    if variant == "unroll4":
        return "x", lambda params, x: blocks_fn(params["encoder"], x, unroll=4)
    raise SystemExit(f"unknown variant {variant}")


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--variant", default="full")
    p.add_argument("--model", default="turbo")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--iters", type=int, default=3, help="loop steps per timing")
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()
    if args.variant == "full_xla":
        os.environ["WHISPER_TPU_FLASH"] = "0"
    if args.variant == "full_w8a8":
        os.environ["WHISPER_TPU_W8A8"] = "1"

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from whisper_tpu.config import get_config
    from whisper_tpu.models.model import cast_floating, init_params
    from whisper_tpu.utils import compilation_cache

    compilation_cache.enable()
    cfg = get_config(args.model)
    dt = jnp.dtype(args.dtype)
    params = init_params(cfg, jax.random.PRNGKey(0))
    if args.variant == "full_w8a8":
        from whisper_tpu.ops.quant import quantize_params

        params = quantize_params(params)
    params = jax.device_put(cast_floating(params, dt))

    kind, fn = build(args.variant, cfg, dt)
    rng = np.random.default_rng(0)
    if kind == "mel":
        x0 = jnp.asarray(rng.standard_normal(
            (args.batch, cfg.n_mels, 2 * cfg.n_audio_ctx)).astype(np.float32) * 0.1)
    else:
        x0 = jnp.asarray(rng.standard_normal(
            (args.batch, cfg.n_audio_ctx, cfg.n_audio_state)).astype(np.float32) * 0.1)
    x0 = jax.device_put(x0.astype(dt) if kind == "x" else x0)

    iters = args.iters

    @jax.jit
    def loop(params, x, seed):
        def body(i, acc):
            # perturb the input by the carry so iterations can't be CSE'd/reordered
            y = fn(params, x * (1.0 + 0.0 * acc) if kind == "mel" else x + acc.astype(x.dtype) * 0)
            return acc + y[0, 0, 0].astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, seed)

    t0 = time.perf_counter()
    float(np.asarray(loop(params, x0, jnp.float32(0.0))))  # compile + warm
    print(f"[enc-bench] {args.variant} compile+warm {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

    times = []
    for r in range(args.repeats):
        t0 = time.perf_counter()
        float(np.asarray(loop(params, x0, jnp.float32(r + 1))))
        times.append((time.perf_counter() - t0) / iters)
    best = min(times)
    out = {"variant": args.variant, "model": args.model, "batch": args.batch,
           "ms_per_call": round(best * 1e3, 2),
           "all_ms": [round(t * 1e3, 2) for t in times]}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
