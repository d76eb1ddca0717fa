"""Server entry point — counterpart of python/whisper_svr.py:99-108 and
cpp/whisper_srv.cpp, with continuous batching and data-parallel scale-out.

    # one engine, one server (the reference shape, but batched):
    python -m whisper_tpu.serving --model_type tiny --port 8000 --slots 8

    # N data-parallel replicas behind one router on --port
    # (single host: workers are subprocesses, chip i pinned per worker):
    python -m whisper_tpu.serving --dp 2 --model_type tiny --port 8000

    # multi-host: run one worker per host, then a router anywhere:
    python -m whisper_tpu.serving --backends http://h0:8001,http://h1:8001
"""

from __future__ import annotations

import argparse
import sys


def _wait_healthy(url: str, timeout_s: float = 120.0) -> bool:
    import http.client
    import time
    from urllib.parse import urlsplit

    u = urlsplit(url)
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        try:
            c = http.client.HTTPConnection(u.hostname, u.port, timeout=2)
            c.request("GET", "/health")
            if c.getresponse().status == 200:
                return True
        except OSError:
            pass
        time.sleep(0.25)
    return False


def _run_dp(args) -> int:
    """Spawn one single-engine worker subprocess per data replica and front
    them with the router. One replica never spans hosts/processes, so the
    decode loop stays free of cross-replica traffic (BASELINE.md scaling
    target; design note at parallel/distributed.py)."""
    import os
    import signal
    import subprocess

    from .router import make_router

    # SIGTERM must tear the worker fleet down with us: without a handler the
    # default action kills this orchestrator instantly and the `finally`
    # below never runs, leaking one serving subprocess per replica (found
    # via leaked test workers, round 4)
    def _sigterm(signum, frame):
        raise KeyboardInterrupt

    signal.signal(signal.SIGTERM, _sigterm)

    ports = [args.port + 1 + i for i in range(args.dp)]
    workers = []
    for i, port in enumerate(ports):
        cmd = [sys.executable, "-m", "whisper_tpu.serving",
               "--host", "127.0.0.1", "--port", str(port),
               "--model_type", args.model_type,
               "--slots", str(args.slots), "--dtype", args.dtype,
               "--steps_per_sync", str(args.steps_per_sync),
               "--tp", str(args.tp), "--timeout", str(args.timeout)]
        if args.checkpoint:
            cmd += ["--checkpoint", args.checkpoint]
        cmd += ["--max_tokens", str(args.max_tokens)]
        cmd += ["--no_speech_threshold", str(args.no_speech_threshold),
                "--logprob_threshold", str(args.logprob_threshold),
                "--compression_ratio_threshold",
                str(args.compression_ratio_threshold)]
        if args.admit_chunk:
            cmd += ["--admit_chunk", str(args.admit_chunk)]
        if args.encode_chunks > 1:
            cmd += ["--encode_chunks", str(args.encode_chunks)]
        cmd += ["--max_beam_size", str(args.max_beam_size),
                "--beam_batch_max", str(args.beam_batch_max),
                "--temperature_fallback", args.temperature_fallback]
        if args.length_penalty is not None:
            cmd += ["--length_penalty", str(args.length_penalty)]
        if args.timestamps:
            cmd.append("--timestamps")
        for flag in ("kv_quant", "self_kv_quant", "w8a8", "adaptive_sync",
                     "warm_start"):
            cmd.append(f"--{flag}" if getattr(args, flag)
                       else f"--no-{flag}")
        env = dict(os.environ)
        # pin a disjoint chip slice per replica (harmless on the CPU
        # backend): replica i owns chips [i*tp, (i+1)*tp). Without this,
        # dp>1 workers with tp>1 would all initialize the same chips and
        # double-book devices (ADVICE round 2).
        chips = ",".join(str(i * args.tp + j) for j in range(args.tp))
        env.setdefault("TPU_VISIBLE_CHIPS", chips)
        env.setdefault("TPU_VISIBLE_DEVICES", chips)
        workers.append(subprocess.Popen(cmd, env=env))

    urls = [f"http://127.0.0.1:{p}" for p in ports]
    try:
        for u in urls:
            if not _wait_healthy(u, timeout_s=args.worker_startup_timeout):
                raise RuntimeError(f"worker {u} failed to come up")
        srv = make_router(urls, args.host, args.port,
                          split_longform=not args.no_router_split,
                          longform_overlap_s=args.router_overlap_s)
        print(f"whisper_tpu router on {args.host}:{args.port} "
              f"-> {args.dp} replicas {urls}", file=sys.stderr, flush=True)
        try:
            srv.serve_forever()
        except KeyboardInterrupt:
            pass
    finally:
        for w in workers:
            w.terminate()
        for w in workers:
            try:
                w.wait(timeout=10)
            except subprocess.TimeoutExpired:
                w.kill()
    return 0


def _run_router(args) -> int:
    from .router import make_router

    urls = [u if "//" in u else f"http://{u}"
            for u in args.backends.split(",") if u]
    srv = make_router(urls, args.host, args.port,
                      split_longform=not args.no_router_split,
                      longform_overlap_s=args.router_overlap_s)
    print(f"whisper_tpu router on {args.host}:{args.port} -> {urls}",
          file=sys.stderr, flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser("whisper_tpu.serving")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--model_type", "-t", default="tiny")
    p.add_argument("--checkpoint", "-p", default=None)
    p.add_argument("--slots", type=int, default=8, help="max concurrent decodes")
    p.add_argument("--dtype", default="bfloat16")
    # Out-of-the-box defaults REPRODUCE the benched flagship configuration
    # (BENCH_NOTES r5 paired sweeps): steps_per_sync 32 with adaptive sync
    # OFF — the four-sweep step ladder rose monotonically 8 < 16 < 24 < 32
    # and flattened at 32 (32 beat 16 7/8 paired with the best p50/p95;
    # 48/64 tied it) — plus int8 cross+self KV, W8A8 weights, and a
    # 224-token budget (OpenAI transcribe's sample_len = n_text_ctx // 2)
    # so the self-KV cache buckets to 256 positions instead of streaming
    # all 448 every step. Opt out per flag for debugging/parity runs.
    p.add_argument("--steps_per_sync", type=int, default=32)
    p.add_argument("--max_tokens", type=int, default=224,
                   help="per-request generated-token budget; bounds the "
                        "bucketed self-KV cache (default 224 = OpenAI "
                        "sample_len; 0 = unlimited full-context cache)")
    p.add_argument("--timestamps", action="store_true")
    p.add_argument("--adaptive_sync", action=argparse.BooleanOptionalAction,
                   default=False,
                   help="grow decode rounds to 2x/4x steps_per_sync while "
                        "no active slot can finish within them. Off by "
                        "default: paired r5 A/B sweeps measured it at or "
                        "below fixed rounds (BENCH_NOTES r5)")
    p.add_argument("--kv_quant", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="int8-quantize the cross-attention KV state")
    p.add_argument("--self_kv_quant", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="int8-quantize the self-attention KV slot cache")
    p.add_argument("--w8a8", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="int8 weights + dynamic-int8 encoder activations "
                        "(quant-gated; the benched flagship mode)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel degree: shard weights/KV over this "
                        "many chips (heads+MLP over the model mesh axis)")
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel replicas: spawn this many single-"
                        "engine workers (subprocesses) behind a router")
    p.add_argument("--backends", default=None,
                   help="router-only mode: comma-separated worker URLs "
                        "(one engine per host for multi-host serving)")
    # must exceed a worker's measured cold start (params+quantize+upload+
    # warmup can reach ~7 min for turbo through the device tunnel; see
    # BENCH_NOTES startup section) or --dp fleets kill healthy workers
    p.add_argument("--worker_startup_timeout", type=float, default=900.0)
    p.add_argument("--no_router_split", action="store_true",
                   help="disable router-level >30s window fan-out "
                        "(windows then decode on one backend)")
    p.add_argument("--router_overlap_s", type=float, default=2.0,
                   help="window overlap for the router-level split")
    p.add_argument("--timeout", type=float, default=300.0)
    p.add_argument("--no_speech_threshold", type=float, default=0.6,
                   help="silence gate: P(<|nospeech|>) above this (and not "
                        "confident) returns '' (-1 disables)")
    p.add_argument("--logprob_threshold", type=float, default=-1.0,
                   help="avg-logprob quality floor (-1e9 disables)")
    p.add_argument("--compression_ratio_threshold", type=float, default=2.4,
                   help="flag repetitive output above this gzip ratio")
    p.add_argument("--admit_chunk", type=int, default=None,
                   help="max newcomers encoded per sync round while slots "
                        "are active (default slots/4); bounds the decode "
                        "stall one admission can cause")
    p.add_argument("--encode_chunks", type=int, default=1,
                   help=">1 splits the admission encoder into that many "
                        "layer-group programs so decode rounds interleave "
                        "with admission encodes on one chip")
    p.add_argument("--max_beam_size", type=int, default=8,
                   help="per-request beam=K ceiling (each distinct K is one "
                        "compile of the beam worker's program)")
    p.add_argument("--beam_batch_max", type=int, default=8,
                   help="beam worker micro-batch size")
    p.add_argument("--length_penalty", type=float, default=None,
                   help="GoogleNMT length-penalty alpha for beam scoring "
                        "(default: mean logprob)")
    p.add_argument("--temperature_fallback", default="0.2,0.4,0.6,0.8,1.0",
                   help="comma-separated retry-ladder temperatures for "
                        "low-quality results ('' disables)")
    p.add_argument("--warm_start", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="compile every decode/admission program at startup "
                        "so worker threads never compile under traffic "
                        "(execute-only; required for --tp serving)")
    args = p.parse_args(argv)

    if args.backends:
        return _run_router(args)
    if args.dp > 1:
        return _run_dp(args)

    from ..utils import compilation_cache

    compilation_cache.enable()
    import jax.numpy as jnp

    from ..config import get_config
    from ..models.checkpoint import load_checkpoint
    from ..models.model import init_params
    from ..tokenizer import get_tokenizer
    from .engine import ContinuousBatchingEngine
    from .server import make_server

    # cold-start phase breakdown (VERDICT r4 #7): the r4 bench saw 395 s
    # "params ready" with no attribution — log load/quantize/place/warm
    # separately so a slow startup names its phase
    import time as _time

    _t = _time.perf_counter()
    if args.checkpoint:
        params, cfg = load_checkpoint(args.checkpoint, size=args.model_type)
    else:
        cfg = get_config(args.model_type)
        params = init_params(cfg)
    t_load = _time.perf_counter() - _t
    _t = _time.perf_counter()
    if args.w8a8:
        import os as _os

        from ..ops.quant import quantize_params

        _os.environ["WHISPER_TPU_W8A8"] = "1"
        params = quantize_params(params)
    t_quant = _time.perf_counter() - _t
    tok = get_tokenizer(cfg.is_multilingual, num_languages=cfg.num_languages)

    mesh = None
    if args.tp > 1:
        from ..parallel.sharding import make_mesh

        mesh = make_mesh(1, args.tp)

    _t = _time.perf_counter()
    engine = ContinuousBatchingEngine(
        params, cfg, tok,
        max_slots=args.slots,
        compute_dtype=jnp.dtype(args.dtype),
        steps_per_sync=args.steps_per_sync,
        max_tokens=(args.max_tokens if args.max_tokens
                    and args.max_tokens > 0 else None),
        timestamps=args.timestamps,
        kv_quant=args.kv_quant,
        self_kv_quant=args.self_kv_quant,
        mesh=mesh,
        no_speech_threshold=(None if args.no_speech_threshold < 0
                             else args.no_speech_threshold),
        logprob_threshold=(None if args.logprob_threshold <= -1e9
                           else args.logprob_threshold),
        compression_ratio_threshold=(None
                                     if args.compression_ratio_threshold < 0
                                     else args.compression_ratio_threshold),
        admit_chunk=args.admit_chunk,
        encode_chunks=args.encode_chunks,
        adaptive_sync=args.adaptive_sync,
        max_beam_size=args.max_beam_size,
        beam_batch_max=args.beam_batch_max,
        length_penalty=args.length_penalty,
        temperature_fallback=tuple(
            float(x) for x in args.temperature_fallback.split(",") if x),
        warm_start=args.warm_start,
    )
    t_init = _time.perf_counter() - _t
    _t = _time.perf_counter()
    engine.start()
    t_start = _time.perf_counter() - _t

    srv = make_server(engine, args.host, args.port, request_timeout_s=args.timeout)
    print(f"whisper_tpu server on {args.host}:{args.port} "
          f"(model={cfg.name}, slots={args.slots}) startup: "
          f"load {t_load:.1f}s quantize {t_quant:.1f}s "
          f"place+state {t_init:.1f}s "
          f"warm {engine.stats.warmup_seconds:.1f}s "
          f"(start {t_start:.1f}s)", file=sys.stderr)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        engine.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
