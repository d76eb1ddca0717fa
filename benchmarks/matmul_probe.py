"""MXU microprobes for the encoder roofline (turbo-B64 shapes).

Answers two questions that gate the round-3 encoder work:

1. int8 speedup — does an int8xint8->int32 dot run ~2x bf16 on this chip
   (v5e peak: 394 TOPS int8 vs 197 TFLOP/s bf16)? If yes, a W8A8 encoder
   mode is the honest path below the bf16 FLOP bound.
2. dh=64 fill — the attention dots contract (q.K^T) or emit (w.V) only 64
   wide, half the 128-lane MXU. If a dot with 128-deep contraction and HALF
   the output rows takes the same wall time as the 64-deep full-output dot
   (same MAC count), the array is depth-limited and block-diagonal head
   packing could win ~2x; if the 64-deep dot already runs at MAC parity,
   packing is refuted (VERDICT r2 #6 asks for exactly this measurement).

    python benchmarks/matmul_probe.py --repeats 5
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _time(fn, *args, repeats=5):
    import jax

    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])  # force (block_until_ready unreliable on axon)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        times.append(time.perf_counter() - t0)
    return min(times)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--loops", type=int, default=8,
                   help="dots per timed program (amortizes dispatch)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from whisper_tpu.utils import compilation_cache

    compilation_cache.enable()
    rng = np.random.default_rng(0)
    results = {}
    n = args.loops

    def chain(dot, a, w):
        """n dots per program so per-dot time is wall/n with dispatch
        amortized. Each iteration reads a DIFFERENT slice of an (L0+n)-row
        buffer — distinct inputs, so CSE cannot collapse the dots (the first
        version perturbed with `* (1 + 0*acc)`, which XLA folded away and
        the n dots collapsed to one: 'measured' bf16 exceeded chip peak)."""
        pad = jnp.concatenate([a, a[:n]], axis=0)
        L0 = a.shape[0]

        def f(pad, w):
            acc = jnp.float32(0)
            for i in range(n):
                y = dot(jax.lax.slice_in_dim(pad, i, i + L0, axis=0), w)
                # FULL-sum epilogue: summing a slice (y[..., :1, :1]) lets
                # XLA narrow the whole dot to the sliced output columns —
                # the r3 run 'measured' 2x the chip's bf16 peak that way.
                # The full reduce keeps every MAC live (absolute numbers
                # become epilogue-inflated; compare RATIOS of same-output
                # probes, as int8_gemm_probe.py documents).
                acc = acc + jnp.sum(y.astype(jnp.float32))
            return acc

        return jax.jit(f), pad

    # ---- 1. int8 vs bf16 at the MLP shape (the encoder's biggest matmul)
    M, K, N = 96000, 1280, 5120  # B64 x T1500 tokens
    a8 = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
    w8 = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)
    ab = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    wb = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)

    def dot_i8(a, w):
        return jax.lax.dot_general(a, w, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    def dot_bf(a, w):
        return jax.lax.dot_general(a, w, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.bfloat16)

    def note(k, v):
        results[k] = v
        print(f"[probe] {k} = {v}", file=sys.stderr, flush=True)

    f, pa = chain(dot_bf, ab, wb)
    t_bf = _time(f, pa, wb, repeats=args.repeats) / n
    flops = 2 * M * K * N
    note("mlp_bf16_ms", round(t_bf * 1e3, 3))
    note("mlp_bf16_tflops", round(flops / t_bf / 1e12, 1))
    f, pa = chain(dot_i8, a8, w8)
    t_i8 = _time(f, pa, w8, repeats=args.repeats) / n
    note("mlp_int8_ms", round(t_i8 * 1e3, 3))
    note("mlp_int8_tops", round(flops / t_i8 / 1e12, 1))
    note("int8_speedup", round(t_bf / t_i8, 2))

    # ---- 1b. int8 vs bf16 at the projection shape
    M2, K2, N2 = 96000, 1280, 1280
    a8p, w8p = a8[:, :K2], w8[:K2, :N2]
    abp, wbp = ab[:, :K2], wb[:K2, :N2]
    f, pa = chain(dot_bf, abp, wbp)
    t_bfp = _time(f, pa, wbp, repeats=args.repeats) / n
    note("proj_bf16_ms", round(t_bfp * 1e3, 3))
    f, pa = chain(dot_i8, a8p, w8p)
    t_i8p = _time(f, pa, w8p, repeats=args.repeats) / n
    note("proj_int8_ms", round(t_i8p * 1e3, 3))
    note("proj_int8_speedup", round(t_bfp / t_i8p, 2))

    # ---- 2. attention-dot depth probe (batched, turbo per-layer shape)
    # IDENTICAL output shape both ways (same epilogue), contraction depth
    # 64 vs 128 (2x the MACs). t128/t64 ~ 1.0 => the array is depth-starved
    # at dh=64 (the extra 64 lanes are free -> packing could win);
    # t128/t64 ~ 2.0 => depth-64 already fills the MXU -> packing refuted.
    BH, T = 16 * 20, 1500  # 16 batch rows keep the (BH,T,T) output in HBM
    q64 = jnp.asarray(rng.standard_normal((BH, T, 64)), jnp.bfloat16)
    k64 = jnp.asarray(rng.standard_normal((BH, 64, T)), jnp.bfloat16)
    q128 = jnp.asarray(rng.standard_normal((BH, T, 128)), jnp.bfloat16)
    k128 = jnp.asarray(rng.standard_normal((BH, 128, T)), jnp.bfloat16)

    def bdot(a, w):
        return jax.lax.dot_general(
            a, w, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.bfloat16)

    f, pa = chain(bdot, q64, k64)
    t64 = _time(f, pa, k64, repeats=args.repeats) / n
    note("score_dh64_ms", round(t64 * 1e3, 3))
    f, pa = chain(bdot, q128, k128)
    t128 = _time(f, pa, k128, repeats=args.repeats) / n
    note("score_dh128_same_out_ms", round(t128 * 1e3, 3))
    # ~1.0: depth-64 wastes half the array; ~2.0: packing refuted
    note("depth128_cost_ratio", round(t128 / t64, 2))

    # w.V side: same output (BH, T, 64); weights length 1500 both ways,
    # emit width probed via N=64 vs N=128 at 2x MACs, same-epilogue
    w_att = jnp.asarray(rng.standard_normal((BH, T, T)), jnp.bfloat16)
    v64 = jnp.asarray(rng.standard_normal((BH, T, 64)), jnp.bfloat16)
    v128 = jnp.asarray(rng.standard_normal((BH, T, 128)), jnp.bfloat16)
    f, pa = chain(bdot, w_att, v64)
    tw64 = _time(f, pa, v64, repeats=args.repeats) / n
    note("wv_n64_ms", round(tw64 * 1e3, 3))
    f, pa = chain(bdot, w_att, v128)
    tw128 = _time(f, pa, v128, repeats=args.repeats) / n
    note("wv_n128_2x_macs_ms", round(tw128 * 1e3, 3))
    note("width128_cost_ratio", round(tw128 / tw64, 2))

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
