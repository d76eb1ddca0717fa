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
    # turbo/large-v3 carry n_vocab 51866 (<|yue|>): the natural draft is
    # distil-large-v3 (same tokenizer AND the same frozen encoder family);
    # tiny..large-v2 (51865) cannot draft for them
    p.add_argument("--draft", default="distil-large-v3")
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
    import os

    if os.environ.get("JAX_PLATFORMS") != "cpu":
        # persistent cache amortizes the tunnel's minutes-long compiles;
        # on CPU smoke runs it would reload TPU-host AOT artifacts
        # (machine-feature mismatch warnings, SIGILL risk)
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

    def mk_cache(c, quant):
        return (QKVCache.create(c, B, ctx=kv_ctx) if quant
                else KVCache.create(c, B, dtype=dt, ctx=kv_ctx))

    # ---- program costs. Each program runs `iters` serialized times in an
    # ON-DEVICE fori_loop (next input = argmax of the previous output, like
    # real decoding) and the result is forced to host — block_until_ready
    # does not block on the axon tunnel platform (BENCH_NOTES quirks).
    # params/cross ride as EXPLICIT jit arguments — closing over them bakes
    # multi-GB captured constants into the compile request (HTTP 413 from
    # the remote compiler; same rule as decode_bench.build_step)
    toks1 = jnp.full((B,), 123, jnp.int32)
    offs = jnp.full((B,), P + 1, jnp.int32)
    kvt = mk_cache(cfg, args.self_kv_quant)
    kvd = mk_cache(dcfg, args.self_kv_quant)
    yW = jnp.full((B, G + 1), 123, jnp.int32)

    def loop_step(c, dc):
        def run(pp, cc, tk, kv):
            def body(_, carry):
                tk, kv = carry
                logits, kv2 = decoder_step_multipos(pp, tk, offs, kv, cc,
                                                    c, dc)
                return jnp.argmax(logits, -1).astype(jnp.int32), kv2
            tk, _ = jax.lax.fori_loop(0, args.iters, body, (tk, kv))
            return tk
        return jax.jit(run)

    def loop_win(c, dc):
        def run(pp, cc, y, kv):
            def body(_, carry):
                y, kv = carry
                logits, kv2 = decoder_window_multipos(pp, y, offs, kv, cc,
                                                      c, dc)
                return jnp.argmax(logits, -1).astype(jnp.int32), kv2
            y, _ = jax.lax.fori_loop(0, args.iters, body, (y, kv))
            return y
        return jax.jit(run)

    def timeit(fn, *a):
        np.asarray(fn(*a))  # compile + warm
        t0 = time.perf_counter()
        np.asarray(fn(*a))
        return (time.perf_counter() - t0) / args.iters * 1e3

    c_step = timeit(loop_step(cfg, dt), params, cross_t, toks1, kvt)
    c_draft = timeit(loop_step(dcfg, dt), dparams, cross_d, toks1, kvd)
    c_verify = timeit(loop_win(cfg, dt), params, cross_t, yW, kvt)

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
        np.asarray(r.tokens)  # forced transfer: see block quirk above
        return r

    def run_spec(dp, dc, dcross):
        r = speculative_decode_kv(params, cross_t, dp, dcross, prompt, cfg,
                                  dc, gamma=G, compute_dtype=dt,
                                  max_tokens=args.tokens,
                                  self_kv_quant=args.self_kv_quant)
        np.asarray(r.tokens)
        return r

    run_greedy()
    t0 = time.perf_counter()
    ref = run_greedy()
    t_greedy = time.perf_counter() - t0

    draft_kind = "ckpt_draft" if args.draft_checkpoint else "random_draft"
    for label, dp, dc, dcross in (
            (draft_kind, dparams, dcfg, cross_d),
            ("self_draft", params, cfg, cross_t)):
        run_spec(dp, dc, dcross)
        t0 = time.perf_counter()
        r = run_spec(dp, dc, dcross)
        t_spec = time.perf_counter() - t0
        drafted = max(int(r.drafted), 1)
        alpha = int(r.accepted) / drafted
        ts, tr = np.asarray(r.tokens), np.asarray(ref.tokens)
        same = bool(np.array_equal(ts, tr))
        # rows that diverge do so at ONE position and then walk different
        # paths; the meaningful tie metric is how many rows split, and how
        # deep the shared prefix runs (bf16's flat random-weight logits tie
        # often; real peaked weights rarely — see exactness caveat)
        row_mismatch = int(np.sum(np.any(ts != tr, axis=1)))
        first_div = [int(np.argmax(ts[i] != tr[i])) if np.any(ts[i] != tr[i])
                     else int(ts.shape[1]) for i in range(ts.shape[0])]
        print(json.dumps({
            "metric": f"spec_e2e_{label}", "value": round(t_spec * 1e3, 1),
            "unit": "ms", "greedy_ms": round(t_greedy * 1e3, 1),
            "speedup": round(t_greedy / t_spec, 3),
            "acceptance": round(alpha, 4), "rounds": int(r.rounds),
            "exact_match_vs_greedy": same,
            "rows_diverged": row_mismatch,
            "min_shared_prefix": int(min(first_div))}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
