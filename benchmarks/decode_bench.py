"""Decode-step microbenchmark: where does turbo-B64's 8 ms/step go?

Times the S=1 decoder step in an on-device ``fori_loop`` (the next token is
the argmax of the previous logits, so steps serialize like real decoding;
the result is forced to host — ``block_until_ready`` does not block on the
axon tunnel platform, BENCH_NOTES.md).

    python benchmarks/decode_bench.py --variant full --model turbo --batch 64

Variants (cross/self KV quant spelled in the name; default bf16):
  full          shipped decoder_forward, bf16 KV
  full_xq       int8 cross-KV
  full_sq       int8 self-KV
  full_xq_sq    both int8
  int8w         int8 weights + int8 cross/self KV
  int8w_lq      int8w + int8 logits embedding (quantize_logits_emb)
  model_fwd     the shipped models.model.decoder_forward (int8 cross+self KV),
                including env-gated paths (FUSED_QKV, DECODE_UNROLL)
  full_xq_sq_lq full_xq_sq + int8 logits embedding
  no_cross      step with cross-attention removed       (ablation)
  no_self       step with self-attention removed        (ablation)
  no_mlp        step with the MLP removed               (ablation)
  no_logits     logits matmul replaced by a cheap sum   (ablation)
  pallas_cross      fused Pallas cross-attention decode kernel (int8 KV)
  pallas_cross_vpu  same kernel with VPU reductions instead of M=1 MXU dots
  pallas_cross_fd   flash-decode kernel: T-tiled online softmax, VPU grouped
                    reductions (round-3 candidate; t tile via
                    WHISPER_TPU_FD_TILE, default 512)
  pallas_cross_dense block-diagonal dense-Q MXU variant (pass-count probe)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def build_step(variant: str, cfg, dt, kv_ctx: int = 0):
    """Returns step(params, tok (B,), offset, k, v, cross) -> (next_tok, k, v).

    params/cross ride as explicit arguments — closing over them would bake
    multi-GB captured constants into the jit (10+ min compiles through the
    axon tunnel, BENCH_NOTES.md)."""
    import jax
    import jax.numpy as jnp

    if variant == "model_fwd":
        # the SHIPPED decoder_forward (S=1) — measures model.py as-is,
        # including env-gated paths (WHISPER_TPU_FUSED_QKV, DECODE_UNROLL)
        from whisper_tpu.models.model import KVCache as _KV
        from whisper_tpu.models.model import QKVCache as _QKV
        from whisper_tpu.models.model import decoder_forward as _fwd

        def step(params, tokens, offset, kcache, vcache, cross_kv):
            cls = _QKV if kcache.dtype == jnp.int8 else _KV
            logits, kv = _fwd(params, tokens[:, None], offset,
                              cls(kcache, vcache), cross_kv, cfg, dt)
            nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
            return nxt, kv[0], kv[1]

        return step

    from whisper_tpu.models.model import (
        KVCache,
        QKVCache,
        _linear,
        _merge_heads,
        _split_heads,
        attention,
        attention_int8kv,
        attention_int8kv_perpos,
        attention_kvt,
        layer_norm,
        quantize_kv_heads,
    )

    n_head = cfg.n_text_head
    T = kv_ctx or cfg.n_text_ctx
    do_cross = variant != "no_cross"
    do_self = variant != "no_self"
    do_mlp = variant != "no_mlp"
    do_logits = variant != "no_logits"
    pallas_cross = variant in ("pallas_cross", "pallas_cross_vpu",
                               "pallas_cross_fd", "pallas_cross_dense")
    pallas_vpu = variant == "pallas_cross_vpu"
    pallas_kind = variant.replace("pallas_cross_", "").replace(
        "pallas_cross", "legacy")

    def step(params, tokens, offset, kcache, vcache, cross_kv):
        dec = params["decoder"]
        B = tokens.shape[0]
        tok_emb = jnp.take(dec["tok_emb"], tokens, axis=0).astype(dt)
        pos = jax.lax.dynamic_slice_in_dim(dec["pos_emb"], offset, 1, axis=0).astype(dt)
        x = tok_emb[:, None, :] + pos[None]

        key_pos = jnp.arange(T)
        vis = (key_pos <= offset)[None, None, None, :]

        kv_quant = len(cross_kv) == 4
        self_quant = kcache.dtype == jnp.int8

        def scan_block(carry, inp):
            p, cross = inp[0], inp[1:]
            x, kcache, vcache, layer = carry
            if do_self:
                h = layer_norm(x, p["attn_ln"]["g"], p["attn_ln"]["b"])
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

            if do_cross:
                h = layer_norm(x, p["cross_ln"]["g"], p["cross_ln"]["b"])
                q = _linear(h, p["cross"]["wq"], p["cross"]["bq"], dt)
                if pallas_cross:
                    from whisper_tpu.ops import decode_attention as da

                    if pallas_kind == "fd":
                        tt = int(os.environ.get("WHISPER_TPU_FD_TILE", "512"))
                        o = da.cross_attention_decode_fd(
                            _split_heads(q, n_head), cross[0], cross[1],
                            cross[2], cross[3], t_tile=tt)
                    elif pallas_kind == "dense":
                        o = da.cross_attention_decode_dense(
                            _split_heads(q, n_head), cross[0], cross[1],
                            cross[2], cross[3])
                    else:
                        o = da.cross_attention_decode(
                            _split_heads(q, n_head), cross[0], cross[1],
                            cross[2], cross[3], use_vpu=pallas_vpu)
                elif kv_quant:
                    o = attention_int8kv(_split_heads(q, n_head), cross[0],
                                         cross[1], cross[2], cross[3])
                else:
                    o = attention(_split_heads(q, n_head), cross[0].astype(dt),
                                  cross[1].astype(dt))
                x = x + _linear(_merge_heads(o), p["cross"]["wo"], p["cross"]["bo"], dt)

            if do_mlp:
                h = layer_norm(x, p["mlp_ln"]["g"], p["mlp_ln"]["b"])
                h = jax.nn.gelu(_linear(h, p["mlp"]["w1"], p["mlp"]["b1"], dt),
                                approximate=False)
                x = x + _linear(h, p["mlp"]["w2"], p["mlp"]["b2"], dt)
            return (x, kcache, vcache, layer + 1), None

        (x, kc, vc, _), _ = jax.lax.scan(
            scan_block, (x, kcache, vcache, 0), (dec["blocks"],) + tuple(cross_kv))

        x = layer_norm(x, dec["ln"]["g"], dec["ln"]["b"])
        if do_logits:
            logits = jnp.einsum("bsd,vd->bsv", x.astype(dt),
                                dec["tok_emb"].astype(dt),
                                preferred_element_type=jnp.float32)
            nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
        else:
            nxt = (jnp.sum(x[:, 0], axis=-1) > 0).astype(jnp.int32)
        return nxt, kc, vc

    return step


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--variant", default="full")
    p.add_argument("--model", default="turbo")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--steps", type=int, default=64, help="decode steps per timing")
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--xq", action="store_true",
                   help="force int8 cross-KV (compose with ablation variants)")
    p.add_argument("--sq", action="store_true",
                   help="force int8 self-KV (compose with ablation variants)")
    p.add_argument("--kv_ctx", type=int, default=0,
                   help="self-KV cache context (0 = full n_text_ctx; the "
                        "engine/offline paths bucket to 128 multiples)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from whisper_tpu.config import get_config
    from whisper_tpu.models.model import (
        KVCache,
        QKVCache,
        cast_floating,
        init_params,
        quantize_cross_kv,
    )
    from whisper_tpu.utils import compilation_cache

    compilation_cache.enable()
    cfg = get_config(args.model)
    dt = jnp.dtype(args.dtype)
    params = init_params(cfg, jax.random.PRNGKey(0))
    if args.variant.startswith("int8w"):
        from whisper_tpu.ops.quant import quantize_params

        params = quantize_params(params)
    if args.variant.endswith("_lq"):
        from whisper_tpu.ops.quant import quantize_logits_emb

        params = quantize_logits_emb(params)
    params = jax.device_put(cast_floating(params, dt))

    B = args.batch
    rng = np.random.default_rng(0)
    # random audio features stand in for the encoder output; cross-KV layout
    # matches compute_cross_kv's head-major (L, B, H, Ta, dh)
    L, H, Ta, dh = (cfg.n_text_layer, cfg.n_text_head, cfg.n_audio_ctx,
                    cfg.head_dim_text)
    ck = jnp.asarray(rng.standard_normal((L, B, H, Ta, dh)).astype(np.float32))
    cv = jnp.asarray(rng.standard_normal((L, B, H, Ta, dh)).astype(np.float32))
    cross_quant = args.xq or args.variant in (
        "full_xq", "full_xq_sq", "int8w",
        "int8w_lq", "full_xq_sq_lq", "model_fwd",
        "pallas_cross", "pallas_cross_vpu",
        "pallas_cross_fd", "pallas_cross_dense")
    if cross_quant:
        cross_kv = tuple(jax.device_put(t) for t in quantize_cross_kv((ck, cv)))
    else:
        cross_kv = (jax.device_put(ck.astype(dt)), jax.device_put(cv.astype(dt)))
    del ck, cv

    self_quant = args.sq or args.variant in (
        "full_sq", "full_xq_sq", "int8w",
        "int8w_lq", "full_xq_sq_lq", "model_fwd",
        "pallas_cross_fd", "pallas_cross_dense")
    kv_ctx = args.kv_ctx or cfg.n_text_ctx
    if self_quant:
        kv = QKVCache.create(cfg, B, ctx=kv_ctx)
    else:
        kv = KVCache.create(cfg, B, dtype=dt, ctx=kv_ctx)

    step = build_step(args.variant, cfg, dt, kv_ctx=kv_ctx)
    steps = args.steps
    start = 4  # as if a 4-token sot prompt was prefetched

    @jax.jit
    def loop(params, tok0, k, v, cross_kv):
        def body(i, carry):
            tok, k, v = carry
            nxt, k, v = step(params, tok, start + i, k, v, cross_kv)
            return (nxt % cfg.n_vocab, k, v)

        tok, k, v = jax.lax.fori_loop(0, steps, body, (tok0, k, v))
        return tok

    tok0 = jnp.zeros((B,), jnp.int32)
    t0 = time.perf_counter()
    np.asarray(loop(params, tok0, kv[0], kv[1], cross_kv))
    print(f"[dec-bench] {args.variant} compile+warm {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

    times = []
    for r in range(args.repeats):
        t0 = time.perf_counter()
        np.asarray(loop(params, tok0 + r, kv[0], kv[1], cross_kv))
        times.append((time.perf_counter() - t0) / steps)
    best = min(times)
    out = {"variant": args.variant, "model": args.model, "batch": B,
           "ms_per_step": round(best * 1e3, 3),
           "all_ms": [round(t * 1e3, 3) for t in times],
           "xq": cross_quant, "sq": self_quant, "kv_ctx": kv_ctx}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
