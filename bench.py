"""Benchmark driver — prints ONE JSON line with the headline metric.

Metric: real-time factor (RTF = wall / audio-seconds) for batched greedy
decode on Whisper-tiny dims, batch 8, 30 s utterances, 64 new tokens each,
bf16, one chip. Reference baseline: C++ Whisper-Tiny RTF 0.08 on AX650N
(BASELINE.md / reference README.md:217). ``vs_baseline`` is the speedup
factor baseline_rtf / our_rtf (>1 = faster than reference).

Weights are random-init (no pretrained checkpoints reachable offline) — RTF
is decode-length-controlled so timing is representative regardless.

Env knobs: BENCH_MODEL (tiny), BENCH_BATCH (8), BENCH_TOKENS (64),
BENCH_REPEATS (3).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def run_bench(model: str, batch: int, n_tokens: int, repeats: int) -> dict:

    import jax
    import jax.numpy as jnp

    from whisper_tpu.utils import compilation_cache

    compilation_cache.enable()

    from whisper_tpu.config import N_SAMPLES, get_config
    from whisper_tpu.decode import greedy_decode
    from whisper_tpu.models.model import init_params
    from whisper_tpu.ops.mel import log_mel_batch

    cfg = get_config(model)
    print(f"[bench] devices={jax.devices()} model={model} batch={batch} "
          f"tokens={n_tokens}", file=sys.stderr)

    t0 = time.perf_counter()
    params = init_params(cfg, jax.random.PRNGKey(0))
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        params,
    )
    params = jax.device_put(params)
    jax.block_until_ready(params)
    print(f"[bench] params ready in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((batch, N_SAMPLES)).astype(np.float32) * 0.1)
    lengths = jnp.full((batch,), N_SAMPLES, jnp.int32)
    prompt = jnp.asarray(
        np.tile(np.asarray([cfg.sot_sequence("zh", "transcribe")], np.int32), (batch, 1))
    )

    kv_quant = os.environ.get("BENCH_KV_QUANT", "0") == "1"

    def run():
        mel = log_mel_batch(audio, lengths, n_mels=cfg.n_mels)
        res = greedy_decode(
            params, mel, prompt, cfg,
            compute_dtype=jnp.bfloat16,
            max_tokens=n_tokens,
            kv_quant=kv_quant,
        )
        # materialize on host: block_until_ready is unreliable on the axon
        # tunnel platform, a device->host copy is not
        return np.asarray(res.tokens), np.asarray(res.lengths)

    print("[bench] compiling decode program...", file=sys.stderr)
    t0 = time.perf_counter()
    toks, lens = run()
    compile_s = time.perf_counter() - t0
    print(f"[bench] compile+first-run: {compile_s:.1f}s "
          f"(gen lengths: {(lens - prompt.shape[1]).tolist()})", file=sys.stderr)

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    wall = min(times)

    audio_seconds = batch * (N_SAMPLES / 16000)
    rtf = wall / audio_seconds
    # reference C++ RTF per size on AX650N (BASELINE.md / README.md:217-220)
    baseline_rtf = {"tiny": 0.08, "base": 0.11, "small": 0.24,
                    "turbo": 0.48}.get(model, 0.08)
    out = {
        "metric": f"rtf_{model}_b{batch}_t{n_tokens}" + ("_kvq" if kv_quant else ""),
        "value": round(rtf, 6),
        "unit": "wall_s/audio_s (lower=better)",
        "vs_baseline": round(baseline_rtf / rtf, 3),
    }
    print(f"[bench] wall={wall:.3f}s audio={audio_seconds:.0f}s "
          f"throughput={audio_seconds/wall:.1f} audio-s/s", file=sys.stderr)
    return out


def main() -> int:
    # default = tiny b8: compiles in <1 min through the axon tunnel (turbo
    # takes 10-20 min there and risks driver timeouts; its measured numbers
    # are recorded in BENCH_NOTES.md — run BENCH_MODEL=turbo BENCH_BATCH=64
    # to reproduce)
    model = os.environ.get("BENCH_MODEL", "tiny")
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    n_tokens = int(os.environ.get("BENCH_TOKENS", "64"))
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    try:
        out = run_bench(model, batch, n_tokens, repeats)
    except Exception as e:  # noqa: BLE001
        if model == "tiny":
            raise
        print(f"[bench] {model} failed ({type(e).__name__}: {e}); "
              f"falling back to tiny b8", file=sys.stderr)
        out = run_bench("tiny", 8, n_tokens, repeats)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
