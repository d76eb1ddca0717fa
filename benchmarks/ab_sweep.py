"""Paired A/B sweep over engine configs in ONE process (VERDICT r4 #3).

The r4 adaptive-sync decision was made on 2-3 runs/config in ~2x tunnel
noise. This harness settles such questions properly:

- all configs share one process, one params upload, and one XLA cache;
- one engine per config, constructed once and REUSED across repeats (no
  per-run compile pollution);
- repeats are interleaved round-robin (tunnel drift hits every config
  equally) and PAIRED: within a repeat every config decodes the same
  audio/budget draw, so per-repeat ratios cancel common-mode noise;
- the summary reports per-config medians and the paired win-rate matrix.

    python benchmarks/ab_sweep.py --model turbo --slots 64 --requests 192 \
        --repeats 10 --configs fixed8,fixed16,adaptive8

Config grammar: fixed<N> (steps_per_sync=N, adaptive off),
adaptive<N> (steps_per_sync=N, adaptive on), and an optional encN suffix
for segmented admission encode, e.g. fixed16enc4.
"""

from __future__ import annotations

import argparse
import functools
import json
import re
import sys
import threading
import time

import numpy as np


def parse_config(name: str):
    """fixed<N>/adaptive<N> with an optional encM suffix, e.g. fixed16enc2."""
    m = re.fullmatch(r"(fixed|adaptive)(\d+)(?:enc(\d+))?", name)
    if not m:
        raise ValueError(f"bad config {name!r}")
    return {"name": name,
            "steps_per_sync": int(m.group(2)),
            "adaptive_sync": m.group(1) == "adaptive",
            "encode_chunks": int(m.group(3) or 1)}


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="turbo")
    p.add_argument("--slots", type=int, default=64)
    p.add_argument("--requests", type=int, default=192)
    p.add_argument("--repeats", type=int, default=10)
    p.add_argument("--configs", default="fixed8,fixed16,adaptive8")
    p.add_argument("--min_s", type=float, default=5.0)
    p.add_argument("--max_s", type=float, default=30.0)
    p.add_argument("--max_tokens", type=int, default=64)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no-w8a8", dest="w8a8", action="store_false")
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
        import os

        from whisper_tpu.ops.quant import quantize_params

        os.environ["WHISPER_TPU_W8A8"] = "1"
        params = quantize_params(params)
    tok = get_tokenizer(cfg.is_multilingual)
    chunk = max(1, args.slots // 4)
    configs = [parse_config(c) for c in args.configs.split(",") if c]

    engines = {}
    for c in configs:
        print(f"[ab] building engine {c['name']}...", file=sys.stderr,
              flush=True)
        engines[c["name"]] = ContinuousBatchingEngine(
            params, cfg, tok,
            max_slots=args.slots, compute_dtype=dt,
            steps_per_sync=c["steps_per_sync"],
            adaptive_sync=c["adaptive_sync"],
            encode_chunks=c["encode_chunks"],
            max_tokens=args.max_tokens,
            kv_quant=True, self_kv_quant=True,
            admit_chunk=chunk, prefill_buckets=(chunk,),
            max_queue=4 * args.requests,
            warm_start=False,  # warmed by the throwaway run below
        ).start()

    def traffic(rep_seed: int):
        rng = np.random.default_rng(rep_seed)
        reqs = []
        for _ in range(args.requests):
            secs = rng.uniform(args.min_s, args.max_s)
            wav = (rng.standard_normal(int(16000 * secs)) * 0.1
                   ).astype(np.float32)
            budget = int(np.clip(
                rng.geometric(1.0 / (args.max_tokens * 0.45)),
                4, args.max_tokens))
            reqs.append((wav, budget))
        return reqs

    def run_one(eng, reqs):
        done_evt = threading.Event()
        n_done = [0]
        lock = threading.Lock()
        rs = []
        lat = {}

        def on_done(r, fut):
            lat[id(r)] = time.perf_counter() - r.enqueued_at
            with lock:
                n_done[0] += 1
                if n_done[0] == len(reqs):
                    done_evt.set()

        t0 = time.perf_counter()
        for wav, budget in reqs:
            r = Request(audio=wav, language="zh", max_tokens=budget)
            r.future.add_done_callback(functools.partial(on_done, r))
            rs.append(r)
            eng.submit(r)
        assert done_evt.wait(timeout=3600)
        wall = time.perf_counter() - t0
        results = [r.future.result() for r in rs]
        assert all(x["success"] for x in results)
        audio_s = sum(x["audio_seconds"] for x in results)
        lats = np.asarray([lat[id(r)] for r in rs])
        return (audio_s / wall,
                float(np.percentile(lats, 50)),
                float(np.percentile(lats, 95)))

    # throwaway warm run per engine (compiles off the clock)
    for c in configs:
        t0 = time.perf_counter()
        v, _, _ = run_one(engines[c["name"]], traffic(999))
        print(f"[ab] warm {c['name']}: {v:.0f} audio-s/s "
              f"({time.perf_counter()-t0:.0f}s)", file=sys.stderr, flush=True)

    table = {c["name"]: [] for c in configs}
    lat50 = {c["name"]: [] for c in configs}
    lat95 = {c["name"]: [] for c in configs}
    for rep in range(args.repeats):
        reqs = traffic(args.seed * 10_000 + rep)
        for c in configs:
            v, p50, p95 = run_one(engines[c["name"]], reqs)
            table[c["name"]].append(round(v, 1))
            lat50[c["name"]].append(p50)
            lat95[c["name"]].append(p95)
            print(json.dumps({"config": c["name"], "rep": rep,
                              "audio_s_per_s": round(v, 1),
                              "req_p50_s": round(p50, 2),
                              "req_p95_s": round(p95, 2)}), flush=True)

    for eng in engines.values():
        eng.stop()

    summary = {"metric": f"ab_sweep_{args.model}_s{args.slots}"
                         f"_r{args.requests}",
               "repeats": args.repeats,
               "per_config": {}}
    for name, vals in table.items():
        summary["per_config"][name] = {
            "runs": vals,
            "median": round(float(np.median(vals)), 1),
            "mean": round(float(np.mean(vals)), 1),
            "best": max(vals), "worst": min(vals),
            "req_p50_median_s": round(float(np.median(lat50[name])), 2),
            "req_p95_median_s": round(float(np.median(lat95[name])), 2),
        }
    # paired win-rate: fraction of repeats where row-config beats col-config
    names = list(table)
    wins = {}
    for a in names:
        for b in names:
            if a >= b:
                continue
            wa = sum(x > y for x, y in zip(table[a], table[b]))
            wins[f"{a}>{b}"] = f"{wa}/{args.repeats}"
    summary["paired_wins"] = wins
    best = max(names, key=lambda n_: summary["per_config"][n_]["median"])
    summary["winner_by_median"] = best
    print(json.dumps(summary), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
