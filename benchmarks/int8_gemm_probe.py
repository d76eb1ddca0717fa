"""Pallas int8 GEMM probe — can a hand kernel beat XLA's int8 lowering?

Context (BENCH_NOTES round 3): v5e nameplate is 394 int8 TOPS vs 197 bf16
TFLOP/s, but the measured end-to-end W8A8 encoder win is only ~1.2x. This
probe asks whether XLA's int8 *lowering* is the limiter (a Pallas kernel
issuing the int8xint8->int32 MXU dot directly should then approach 2x) or
the chip/compiler simply doesn't expose the int8 path at 2x for these
shapes (the kernel will match XLA and the W8A8 ceiling is real).

Methodology follows matmul_probe.py: n chained dots per program over
DISTINCT row slices (CSE-proof), scalar-reduced on device (the first
version copied the full 240 MB product through the axon tunnel and timed
the transfer, not the GEMM), per-dot time = wall / n.

    python benchmarks/int8_gemm_probe.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def _time(fn, *args, repeats=5):
    import jax

    out = fn(*args)
    np.asarray(out)  # scalar — forces completion without a bulk transfer
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out)
        times.append(time.perf_counter() - t0)
    return min(times)


def make_pallas_gemm(M, K, N, bm, bn):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    interpret = os.environ.get("WHISPER_TPU_PALLAS_INTERPRET", "0") == "1"

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    grid = (M // bm, N // bn)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, K), lambda i, j: (i, 0)),
            pl.BlockSpec((K, bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
        interpret=interpret,
    )


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=12288)
    p.add_argument("--k", type=int, default=1280)
    p.add_argument("--n", type=int, default=5120)
    p.add_argument("--bm", type=int, default=512)
    p.add_argument("--bn", type=int, default=512)
    p.add_argument("--loops", type=int, default=8,
                   help="dots per timed program (amortizes dispatch)")
    p.add_argument("--repeats", type=int, default=5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from whisper_tpu.utils import compilation_cache

    compilation_cache.enable()
    M, K, N = args.m, args.k, args.n
    nloops = args.loops
    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-127, 128, (M + nloops, K), dtype=np.int8))
    b8 = jnp.asarray(rng.integers(-127, 128, (K, N), dtype=np.int8))
    abf = jnp.asarray(
        rng.standard_normal((M + nloops, K)).astype(np.float32)).astype(jnp.bfloat16)
    bbf = jnp.asarray(
        rng.standard_normal((K, N)).astype(np.float32)).astype(jnp.bfloat16)

    macs = 2.0 * M * K * N

    def chain(dot):
        """n dots over distinct row slices, scalar-reduced (see module doc)."""
        def f(pad, w):
            acc = jnp.float32(0)
            for i in range(nloops):
                y = dot(jax.lax.slice_in_dim(pad, i, i + M, axis=0), w)
                # FULL sum: a [:1,:1] slice would let XLA's slice-of-dot
                # simplification narrow the GEMM itself; the full reduce
                # adds an identical ~bandwidth epilogue to every variant
                acc = acc + jnp.sum(y.astype(jnp.float32))
            return acc
        return jax.jit(f)

    def dot_bf(a, w):
        return jax.lax.dot_general(a, w, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.bfloat16)

    def dot_i8(a, w):
        return jax.lax.dot_general(a, w, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    rows = {}
    for name, dot, pad, w in (("xla_bf16", dot_bf, abf, bbf),
                              ("xla_int8", dot_i8, a8, b8)):
        t = _time(chain(dot), pad, w, repeats=args.repeats) / nloops
        rows[name] = {"ms": round(t * 1e3, 3), "tops": round(macs / t / 1e12, 1)}
        print(json.dumps({name: rows[name]}), file=sys.stderr, flush=True)

    try:
        pgemm = make_pallas_gemm(M, K, N, args.bm, args.bn)
        # correctness spot check before timing
        ref = np.asarray(dot_i8(a8[:args.bm], b8)[:8, :8])
        got = np.asarray(pgemm(a8[:M], b8)[:8, :8])
        assert np.array_equal(ref, got), "pallas int8 gemm mismatch"
        t = _time(chain(lambda a, w: pgemm(a[:M], w)), a8, b8,
                  repeats=args.repeats) / nloops
        rows["pallas_int8"] = {"ms": round(t * 1e3, 3),
                               "tops": round(macs / t / 1e12, 1)}
        print(json.dumps({"pallas_int8": rows["pallas_int8"]}),
              file=sys.stderr, flush=True)
    except Exception as e:  # noqa: BLE001 — report, don't crash the probe
        rows["pallas_int8"] = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps({"pallas_int8": rows["pallas_int8"]}),
              file=sys.stderr, flush=True)

    base = rows["xla_bf16"]["ms"]
    out = {"probe": "int8_gemm", "m": M, "k": K, "n": N,
           "bm": args.bm, "bn": args.bn, "loops": nloops, **rows}
    for k in ("xla_int8", "pallas_int8"):
        if "ms" in rows.get(k, {}):
            out[f"{k}_vs_bf16"] = round(base / rows[k]["ms"], 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
