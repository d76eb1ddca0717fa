"""Speculative decoding economics, measured (spec_decode.py).

Reports the three costs that decide whether a draft pays for itself —
the target's 1-wide step, the width-(gamma+1) verify window, and the
draft's step — then solves the break-even acceptance rate alpha*:

    E[tokens/round](alpha) = sum_{j=0..gamma} alpha^j   (greedy accept:
        each draft token survives independently iff it matches the
        target argmax; +1 is the bonus token)
    spec pays off iff  E[n] * c_step > gamma * c_draft + c_verify

Random weights give a real measured acceptance near zero (an unrelated
draft almost never matches a 51k-vocab argmax), so the e2e rows report
the OVERHEAD side honestly; the self-draft row (draft == target) is the
alpha ~= 1 ceiling. With real weights, weights-day can run this bench
with a distil draft and read the actual alpha.

    python benchmarks/spec_bench.py --model turbo --draft tiny --batch 16 \
        --tokens 64 --gamma 4

One JSON line per row on stdout.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser("spec_bench")
    p.add_argument("--model", default="turbo")
    p.add_argument("--draft", default="tiny")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--tokens", type=int, default=64)
    p.add_argument("--gamma", type=int, default=4)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--self_kv_quant", action="store_true")
    p.add_argument("--kv_quant", action="store_true")
    p.add_argument("--checkpoint", default=None,
                   help="target weights (.pt/safetensors); random-init "
                        "otherwise — weights-day passes both checkpoints "
                        "to measure the REAL acceptance rate")
    p.add_argument("--draft_checkpoint", default=None,
                   help="draft weights (.pt/safetensors)")
    args = p.parse_args()

    sys.path.insert(0, ".")
    from whisper_tpu.utils import compilation_cache

    compilation_cache.enable()
    import jax
    import jax.numpy as jnp

    from whisper_tpu.config import get_config
    from whisper_tpu.decode import encode_cross_kv, greedy_decode_kv
    from whisper_tpu.models.model import (
        KVCache,
        QKVCache,
        decoder_step_multipos,
        decoder_window_multipos,
        init_params,
    )
    from whisper_tpu.spec_decode import speculative_decode_kv

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    cfg = get_config(args.model)
    dcfg = get_config(args.draft)
    B, G = args.batch, args.gamma
    print(f"[spec-bench] target={args.model} draft={args.draft} B={B} "
          f"gamma={G} tokens={args.tokens} dtype={args.dtype}",
          file=sys.stderr)

    if args.checkpoint:
        from whisper_tpu.models.checkpoint import load_checkpoint

        params, cfg = load_checkpoint(args.checkpoint, size=args.model)
    else:
        params = init_params(cfg, jax.random.PRNGKey(0))
    if args.draft_checkpoint:
        from whisper_tpu.models.checkpoint import load_checkpoint

        dparams, dcfg = load_checkpoint(args.draft_checkpoint,
                                        size=args.draft)
    else:
        dparams = init_params(dcfg, jax.random.PRNGKey(1))
    from whisper_tpu.models.model import cast_floating

    params = cast_floating(params, dt)
    dparams = cast_floating(dparams, dt)

    # the draft hears the same AUDIO through its own mel bank — 80- and
    # 128-bin filterbanks are different frequency maps, so a bin-slice of
    # the target's mel would feed the draft garbage and destroy acceptance
    # (same contract as pipeline.transcribe_batch's spec path)
    audio = np.random.default_rng(0).standard_normal(
        (B, 16000 * 30)).astype(np.float32) * 0.1
    from whisper_tpu.ops.mel import log_mel_batch

    lengths = jnp.full((B,), audio.shape[1], jnp.int32)
    mel = log_mel_batch(jnp.asarray(audio), lengths, n_mels=cfg.n_mels)
    mel = mel[..., : 2 * cfg.n_audio_ctx]
    mel_d = (mel if dcfg.n_mels == cfg.n_mels
             else log_mel_batch(jnp.asarray(audio), lengths,
                                n_mels=dcfg.n_mels))
    mel_d = mel_d[..., : 2 * dcfg.n_audio_ctx]
    cross_t = encode_cross_kv(params, mel, cfg, dt, kv_quant=args.kv_quant)
    cross_d = encode_cross_kv(dparams, mel_d, dcfg, dt,
                              kv_quant=args.kv_quant)
    prompt = jnp.asarray([cfg.sot_sequence("zh", "transcribe")] * B,
                         jnp.int32)
    P = prompt.shape[1]
    limit = P + args.tokens
    kv_ctx = -(-(limit + G) // 128) * 128

    def timeit(fn, *a):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / args.iters * 1e3, out

    def mk_cache(c, quant):
        return (QKVCache.create(c, B, ctx=kv_ctx) if quant
                else KVCache.create(c, B, dtype=dt, ctx=kv_ctx))

    # ---- program costs
    toks1 = jnp.full((B,), 123, jnp.int32)
    offs = jnp.full((B,), P + 1, jnp.int32)
    kvt = mk_cache(cfg, args.self_kv_quant)
    kvd = mk_cache(dcfg, args.self_kv_quant)

    # params/cross ride as EXPLICIT jit arguments — closing over them bakes
    # multi-GB captured constants into the compile request (HTTP 413 from
    # the remote compiler; same rule as decode_bench.build_step)
    step_t = jax.jit(lambda pp, cc, tk, of, kv: decoder_step_multipos(
        pp, tk, of, type(kvt)(*kv), cc, cfg, dt))
    step_d = jax.jit(lambda pp, cc, tk, of, kv: decoder_step_multipos(
        pp, tk, of, type(kvd)(*kv), cc, dcfg, dt))
    win_t = jax.jit(lambda pp, cc, y, of, kv: decoder_window_multipos(
        pp, y, of, type(kvt)(*kv), cc, cfg, dt))

    c_step, _ = timeit(lambda: step_t(params, cross_t, toks1, offs,
                                      tuple(kvt)))
    c_draft, _ = timeit(lambda: step_d(dparams, cross_d, toks1, offs,
                                       tuple(kvd)))
    yW = jnp.full((B, G + 1), 123, jnp.int32)
    c_verify, _ = timeit(lambda: win_t(params, cross_t, yW, offs,
                                       tuple(kvt)))

    cost_round = G * c_draft + c_verify
    # E[n](alpha) = sum_{j=0..G} alpha^j ; solve E[n]*c_step = cost_round
    alphas = np.linspace(0, 1, 2001)
    en = np.array([sum(a ** j for j in range(G + 1)) for a in alphas])
    ok = en * c_step >= cost_round
    # None = no acceptance rate pays for this draft (valid JSON; inf isn't)
    alpha_star = round(float(alphas[ok][0]), 4) if ok.any() else None
    for name, v in (("target_step_ms", c_step), ("draft_step_ms", c_draft),
                    (f"verify_w{G+1}_ms", c_verify)):
        print(json.dumps({"metric": f"spec_{name}", "value": round(v, 3),
                          "unit": "ms", "batch": B}))
    print(json.dumps({
        "metric": "spec_break_even_alpha", "value": alpha_star,
        "unit": "acceptance rate (lower=easier)", "gamma": G,
        "round_cost_ms": round(cost_round, 3),
        "tokens_per_round_needed": round(cost_round / c_step, 3)}))

    # ---- e2e rows: greedy vs spec (random draft) vs spec (self draft)
    def run_greedy():
        r = greedy_decode_kv(params, cross_t, prompt, cfg, compute_dtype=dt,
                             max_tokens=args.tokens,
                             self_kv_quant=args.self_kv_quant)
        jax.block_until_ready(r.tokens)
        return r

    def run_spec(dp, dc, dcross):
        r = speculative_decode_kv(params, cross_t, dp, dcross, prompt, cfg,
                                  dc, gamma=G, compute_dtype=dt,
                                  max_tokens=args.tokens,
                                  self_kv_quant=args.self_kv_quant)
        jax.block_until_ready(r.tokens)
        return r

    run_greedy()
    t0 = time.perf_counter()
    ref = run_greedy()
    t_greedy = time.perf_counter() - t0

    for label, dp, dc, dcross in (
            ("random_draft", dparams, dcfg, cross_d),
            ("self_draft", params, cfg, cross_t)):
        run_spec(dp, dc, dcross)
        t0 = time.perf_counter()
        r = run_spec(dp, dc, dcross)
        t_spec = time.perf_counter() - t0
        drafted = max(int(r.drafted), 1)
        alpha = int(r.accepted) / drafted
        same = bool(np.array_equal(np.asarray(r.tokens),
                                   np.asarray(ref.tokens)))
        print(json.dumps({
            "metric": f"spec_e2e_{label}", "value": round(t_spec * 1e3, 1),
            "unit": "ms", "greedy_ms": round(t_greedy * 1e3, 1),
            "speedup": round(t_greedy / t_spec, 3),
            "acceptance": round(alpha, 4), "rounds": int(r.rounds),
            "exact_match_vs_greedy": same}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
