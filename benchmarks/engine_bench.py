"""Continuous-batching engine under ragged traffic — what the offline
flagship row (bench.py / BENCH_r02.json) cannot measure: slot churn from
early-finishing requests, admission interleaving under steady arrivals, and
tail latency.

Traffic model: N requests with Poisson arrivals (``--rate`` req/s; 0 = all
submitted up front, max pressure), clip lengths uniform in
[--min_s, --max_s], and per-request token budgets sampled geometric-ish in
[4, --max_tokens] to emulate the early-eot length distribution real weights
produce (random-init weights rarely emit eot, so budgets stand in for it).

Reports audio-s/s over the whole run and p50/p95 request + per-token
latency. One prefill bucket (= admit_chunk) keeps the compile count at two
programs (decode step + one admission shape) — matching steady-state
serving, where those are the only hot programs.

    python benchmarks/engine_bench.py --model turbo --slots 64 \
        --requests 192 --rate 0 --kv_quant --self_kv_quant
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="tiny")
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--requests", type=int, default=32)
    p.add_argument("--rate", type=float, default=0.0,
                   help="Poisson arrival rate, req/s (0 = submit all up front)")
    p.add_argument("--min_s", type=float, default=5.0)
    p.add_argument("--max_s", type=float, default=30.0)
    p.add_argument("--max_tokens", type=int, default=64)
    p.add_argument("--admit_chunk", type=int, default=0,
                   help="0 = slots // 4")
    p.add_argument("--encode_chunks", type=int, default=1,
                   help=">1 = segmented admission encode (interleaves "
                        "decode rounds with encoder layer groups)")
    p.add_argument("--dtype", default="bfloat16")
    # defaults mirror the server CLI's out-of-the-box configuration
    # (serving/__main__.py): the zero-flag row IS the shipped config
    p.add_argument("--kv_quant", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--self_kv_quant", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--w8a8", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="int8 weights + dynamic-int8 encoder activations "
                        "(the flagship quant mode, quant_gate-passed)")
    # zero-flag row = the shipped server defaults (BENCH_NOTES r5 sweeps)
    p.add_argument("--steps_per_sync", type=int, default=32)
    p.add_argument("--adaptive_sync", action=argparse.BooleanOptionalAction,
                   default=False)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--beam", type=int, default=1,
                   help=">1: all requests go through the engine's beam "
                        "worker (the serving-path beam row)")
    p.add_argument("--word_ts_frac", type=float, default=0.0,
                   help="fraction of requests asking for word_timestamps "
                        "(0..1): exercises the micro-batched align worker "
                        "under load (VERDICT r4 #4)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from whisper_tpu.config import get_config
    from whisper_tpu.models.model import cast_floating, init_params
    from whisper_tpu.serving.engine import ContinuousBatchingEngine, Request
    from whisper_tpu.tokenizer import get_tokenizer
    from whisper_tpu.utils import compilation_cache

    compilation_cache.enable()
    cfg = get_config(args.model)
    dt = jnp.dtype(args.dtype)
    params = jax.device_put(
        cast_floating(init_params(cfg, jax.random.PRNGKey(0)), dt))
    if args.w8a8:
        # serving-path W8A8: admission encode is the dominant per-tick cost
        # under churn, and the W8A8 encoder is a measured -13% on it
        # (BENCH_NOTES r3); decoder runs the same int8 weights weight-only
        import os

        from whisper_tpu.ops.quant import quantize_params

        os.environ["WHISPER_TPU_W8A8"] = "1"
        params = quantize_params(params)
    tok = get_tokenizer(cfg.is_multilingual)
    chunk = args.admit_chunk or max(1, args.slots // 4)

    eng = ContinuousBatchingEngine(
        params, cfg, tok,
        max_slots=args.slots,
        compute_dtype=dt,
        steps_per_sync=args.steps_per_sync,
        adaptive_sync=args.adaptive_sync,
        max_tokens=args.max_tokens,
        kv_quant=args.kv_quant,
        self_kv_quant=args.self_kv_quant,
        admit_chunk=chunk,
        encode_chunks=args.encode_chunks,
        prefill_buckets=(chunk,),   # one admission shape -> one compile
        max_queue=4 * args.requests,
    ).start()

    rng = np.random.default_rng(args.seed)
    # word_timestamps draws come from a SEPARATE stream: consuming them
    # from the main rng shifted every audio/budget draw for a given seed,
    # silently changing the traffic vs the r4-recorded rows even at
    # word_ts_frac=0 — cross-round ladders must stay apples-to-apples
    wts_rng = np.random.default_rng(args.seed + 0x5EED)

    def make_req():
        secs = rng.uniform(args.min_s, args.max_s)
        wav = (rng.standard_normal(int(16000 * secs)) * 0.1).astype(np.float32)
        # geometric-ish early-eot stand-in, clipped to [4, max_tokens]
        budget = int(np.clip(rng.geometric(1.0 / (args.max_tokens * 0.45)),
                             4, args.max_tokens))
        return Request(audio=wav, language="zh", beam_size=args.beam,
                       max_tokens=None if args.beam > 1 else budget,
                       word_timestamps=bool(wts_rng.random()
                                            < args.word_ts_frac))

    # ---- warmup: compile the decode/admission programs off the clock
    print(f"[engine-bench] warmup (compiling decode + b{chunk} admission)...",
          file=sys.stderr)
    t0 = time.perf_counter()
    warm_reqs = [make_req() for _ in range(chunk)]
    if args.word_ts_frac:
        for r in warm_reqs:
            r.word_timestamps = True  # compile an align bucket off the clock
    warm = [eng.submit(r) for r in warm_reqs]
    for f in warm:
        f.result(timeout=3600)
    print(f"[engine-bench] warmup done in {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)
    # zero the phase counters so the printed breakdown covers the measured
    # run only (the warmup's jit compiles would otherwise dominate step_s)
    for f in ("busy_seconds_total", "admit_seconds_total",
              "step_seconds_total", "harvest_seconds_total",
              "encode_seconds_total"):
        setattr(eng.stats, f, 0.0)
    eng.stats.ticks_total = 0
    eng.stats.encode_batches_total = 0

    # ---- measured run
    reqs = [make_req() for _ in range(args.requests)]
    lat = {}
    done_evt = threading.Event()
    n_done = [0]
    lock = threading.Lock()

    def on_done(r, fut):
        lat[id(r)] = time.perf_counter() - r.enqueued_at
        with lock:
            n_done[0] += 1
            if n_done[0] == len(reqs):
                done_evt.set()

    t_start = time.perf_counter()
    for r in reqs:
        if args.rate > 0:
            time.sleep(rng.exponential(1.0 / args.rate))
        r.enqueued_at = time.perf_counter()
        import functools

        r.future.add_done_callback(functools.partial(on_done, r))
        eng.submit(r)
    done_evt.wait(timeout=3600)
    wall = time.perf_counter() - t_start
    eng.stop()

    results = [r.future.result() for r in reqs]
    assert all(x["success"] for x in results)
    audio_s = sum(x["audio_seconds"] for x in results)
    toks = np.array([max(x.get("tokens", 1), 1) for x in results], float)
    lats = np.array([lat[id(r)] for r in reqs])
    tok_lat = lats / toks

    out = {
        "metric": f"engine_ragged_{args.model}_s{args.slots}_r{args.requests}"
                  + (f"_beam{args.beam}" if args.beam > 1 else "")
                  + ("_w8a8" if args.w8a8 else "")
                  + (f"_wts{args.word_ts_frac:g}" if args.word_ts_frac
                     else "")
                  + (f"_enc{args.encode_chunks}" if args.encode_chunks > 1
                     else "")
                  + (f"_rate{args.rate:g}" if args.rate else "_burst"),
        "value": round(audio_s / wall, 1),
        "unit": "audio_s/s (ragged traffic, higher=better)",
        "wall_s": round(wall, 2),
        "audio_s": round(audio_s, 1),
        "tokens_total": int(toks.sum()),
        "req_p50_s": round(float(np.percentile(lats, 50)), 3),
        "req_p95_s": round(float(np.percentile(lats, 95)), 3),
        "tok_p50_ms": round(float(np.percentile(tok_lat, 50)) * 1e3, 2),
        "tok_p95_ms": round(float(np.percentile(tok_lat, 95)) * 1e3, 2),
        # engine's own phase breakdown (EngineStats): admit/step = host-side
        # prep+dispatch, harvest = device execution + host sync — says
        # whether churn cost is host overhead or device+sync time
        "admit_s": round(eng.stats.admit_seconds_total, 2),
        "step_s": round(eng.stats.step_seconds_total, 2),
        "harvest_s": round(eng.stats.harvest_seconds_total, 2),
        # encode worker time runs CONCURRENTLY with the decode loop (r4);
        # it overlaps busy time rather than adding to it
        "encode_s": round(eng.stats.encode_seconds_total, 2),
        "encode_batches": eng.stats.encode_batches_total,
        "ticks": eng.stats.ticks_total,
    }
    if args.word_ts_frac:
        out["align_total"] = eng.stats.align_total
        out["align_batches"] = eng.stats.align_batches_total
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
