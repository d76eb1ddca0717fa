"""Beam-search decode benchmark: wall/RTF for beam-K vs greedy.

Covers the bench gap called out in round 1: the per-step KV-cache reorder
(`beam._gather_beams`) moves the full self-KV per step — this measures what
that costs end-to-end at realistic sizes.

    python benchmarks/beam_bench.py --model turbo --batch 16 --beam 5 --kv_quant

Memory note: beam tiles cross-KV per hypothesis (B*K streams). At turbo
B64xK5 the bf16 cross-KV alone is ~9.8 GB — pass --kv_quant (int8 halves it)
or drop the batch.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="tiny")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--beam", type=int, default=5)
    p.add_argument("--tokens", type=int, default=32)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--kv_quant", action="store_true")
    p.add_argument("--self_kv_quant", action="store_true")
    p.add_argument("--greedy_baseline", action="store_true",
                   help="also time greedy at the same batch for the overhead ratio")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from whisper_tpu.beam import beam_search
    from whisper_tpu.config import N_SAMPLES, get_config
    from whisper_tpu.decode import greedy_decode
    from whisper_tpu.models.model import cast_floating, init_params
    from whisper_tpu.ops.mel import log_mel_batch
    from whisper_tpu.utils import compilation_cache

    compilation_cache.enable()
    cfg = get_config(args.model)
    dt = jnp.dtype(args.dtype)
    params = jax.device_put(cast_floating(init_params(cfg, jax.random.PRNGKey(0)), dt))
    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        rng.standard_normal((args.batch, N_SAMPLES)).astype(np.float32) * 0.1)
    lengths = jnp.full((args.batch,), N_SAMPLES, jnp.int32)
    prompt = jnp.asarray(np.tile(np.asarray(
        [cfg.sot_sequence("zh", "transcribe")], np.int32), (args.batch, 1)))

    def run_beam():
        mel = log_mel_batch(audio, lengths, n_mels=cfg.n_mels)
        mel = mel[..., : 2 * cfg.n_audio_ctx]  # short-ctx test configs
        res = beam_search(params, mel, prompt, cfg, beam_size=args.beam,
                          compute_dtype=dt, max_tokens=args.tokens,
                          apply_filters=False, kv_quant=args.kv_quant,
                          self_kv_quant=args.self_kv_quant)
        return np.asarray(res.lengths)  # force host transfer

    def run_greedy():
        mel = log_mel_batch(audio, lengths, n_mels=cfg.n_mels)
        mel = mel[..., : 2 * cfg.n_audio_ctx]
        res = greedy_decode(params, mel, prompt, cfg, compute_dtype=dt,
                            max_tokens=args.tokens, kv_quant=args.kv_quant,
                            self_kv_quant=args.self_kv_quant)
        return np.asarray(res.lengths)

    def time_fn(fn, label):
        t0 = time.perf_counter()
        fn()
        print(f"[beam-bench] {label} compile+warm {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        times = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        return min(times)

    wall = time_fn(run_beam, f"beam{args.beam}")
    audio_s = args.batch * N_SAMPLES / 16000
    out = {
        "model": args.model, "batch": args.batch, "beam": args.beam,
        "tokens": args.tokens,
        "kv_quant": args.kv_quant, "self_kv_quant": args.self_kv_quant,
        "wall_s": round(wall, 3),
        "rtf_per_stream": round(wall / audio_s, 6),
        "ms_per_token": round(wall / args.tokens * 1e3, 2),
    }
    if args.greedy_baseline:
        gwall = time_fn(run_greedy, "greedy")
        out["greedy_wall_s"] = round(gwall, 3)
        out["beam_overhead_x"] = round(wall / gwall, 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
