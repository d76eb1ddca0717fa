"""Scaling-efficiency benchmark: audio-seconds/s/chip across mesh sizes.

BASELINE.md target: >=85% scaling efficiency from 1 host to 2 hosts,
measured as audio-seconds/s/chip at 1 chip, 1 host, N hosts. On a
single-chip box this reports the 1-chip number; on CPU it validates the
harness over virtual devices (JAX_PLATFORMS=cpu +
--xla_force_host_platform_device_count=8).

    python benchmarks/scaling.py --model tiny --per-chip-batch 8 --tokens 32
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def measure(model: str, per_chip_batch: int, n_tokens: int, tp: int,
            repeats: int, dtype: str) -> list:
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding

    sys.path.insert(0, ".")
    from whisper_tpu.config import N_SAMPLES, get_config
    from whisper_tpu.decode import greedy_decode
    from whisper_tpu.models.model import cast_floating, init_params
    from whisper_tpu.ops.mel import log_mel_batch
    from whisper_tpu.parallel.sharding import data_specs, make_mesh, shard_params

    cfg = get_config(model)
    dt = jnp.dtype(dtype)
    base_params = cast_floating(init_params(cfg, jax.random.PRNGKey(0)), dt)
    rng = np.random.default_rng(0)

    results = []
    n_all = jax.device_count()
    sizes = sorted({1, *(s for s in (2, 4, 8, n_all) if s <= n_all)})
    for n_dev in sizes:
        if n_dev % tp:
            continue
        mesh = make_mesh(n_dev // tp, tp, devices=jax.devices()[:n_dev])
        params = shard_params(base_params, mesh, cfg)
        B = per_chip_batch * (n_dev // tp)
        audio = jax.device_put(
            jnp.asarray(rng.standard_normal((B, N_SAMPLES)).astype(np.float32) * 0.1),
            NamedSharding(mesh, jax.sharding.PartitionSpec("data", None)))
        lengths = jax.device_put(
            jnp.full((B,), N_SAMPLES, jnp.int32),
            NamedSharding(mesh, jax.sharding.PartitionSpec("data")))
        prompt = jax.device_put(
            jnp.tile(jnp.asarray(
                [np.asarray(cfg.sot_sequence("zh", "transcribe"), np.int32)]), (B, 1)),
            NamedSharding(mesh, jax.sharding.PartitionSpec("data", None)))

        def run():
            mel = log_mel_batch(audio, lengths, n_mels=cfg.n_mels)
            res = greedy_decode(params, mel, prompt, cfg, compute_dtype=dt,
                                max_tokens=n_tokens)
            return np.asarray(res.lengths)

        run()  # compile
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        wall = min(times)
        audio_s = B * N_SAMPLES / 16000
        per_chip = audio_s / wall / n_dev
        results.append({
            "devices": n_dev, "tp": tp, "batch": B,
            "wall_s": round(wall, 4),
            "audio_seconds_per_second_per_chip": round(per_chip, 2),
        })
        print(f"[scaling] {n_dev} dev (tp={tp}) batch {B}: "
              f"{per_chip:.1f} audio-s/s/chip", file=sys.stderr)
    if results:
        base = results[0]["audio_seconds_per_second_per_chip"]
        for r in results:
            r["efficiency_vs_1chip"] = round(
                r["audio_seconds_per_second_per_chip"] / base, 4)
    return results


def drive_serving(url: str, concurrency: int, n_requests: int,
                  seconds_per_clip: float, language: str) -> dict:
    """Load-drive a running server or DP router at ``url``: post raw-PCM
    /asr requests at fixed concurrency, report aggregate audio-s/s and the
    per-backend request distribution from /metrics (router mode).

        python -m whisper_tpu.serving --dp 2 ... &
        python benchmarks/scaling.py --url http://127.0.0.1:8000
    """
    import urllib.request
    from concurrent.futures import ThreadPoolExecutor

    rng = np.random.default_rng(0)
    pcm = (rng.standard_normal(int(16000 * seconds_per_clip)) * 0.1
           ).astype(np.float32).tobytes()

    def one(_):
        req = urllib.request.Request(
            f"{url}/asr?language={language}", data=pcm,
            headers={"Content-Type": "application/octet-stream"})
        with urllib.request.urlopen(req, timeout=600) as r:
            return json.loads(r.read().decode()).get("success", False)

    one(0)  # warm the compile caches before timing
    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=concurrency) as ex:
        oks = list(ex.map(one, range(n_requests)))
    wall = time.perf_counter() - t0
    out = {
        "url": url,
        "requests": n_requests,
        "concurrency": concurrency,
        "ok": int(sum(oks)),
        "wall_s": round(wall, 3),
        "audio_seconds_per_second": round(
            n_requests * seconds_per_clip / wall, 2),
    }
    try:
        with urllib.request.urlopen(f"{url}/metrics", timeout=10) as r:
            m = json.loads(r.read().decode())
        if "backends" in m:  # router: record the fan-out
            out["per_backend_requests"] = [
                b.get("router_requests", 0) for b in m["backends"]]
    except OSError:
        pass
    return out


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="tiny")
    p.add_argument("--per-chip-batch", type=int, default=8)
    p.add_argument("--tokens", type=int, default=32)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--url", default=None,
                   help="serving mode: load-drive a running server/router "
                        "instead of the jit-level mesh sweep")
    p.add_argument("--concurrency", type=int, default=16)
    p.add_argument("--requests", type=int, default=64)
    p.add_argument("--clip-seconds", type=float, default=10.0)
    p.add_argument("--language", default="zh")
    args = p.parse_args()
    if args.url:
        print(json.dumps(drive_serving(args.url, args.concurrency,
                                       args.requests, args.clip_seconds,
                                       args.language)))
        return 0
    res = measure(args.model, args.per_chip_batch, args.tokens, args.tp,
                  args.repeats, args.dtype)
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
