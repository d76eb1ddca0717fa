"""Server entry point — counterpart of python/whisper_svr.py:99-108 and
cpp/whisper_srv.cpp, with continuous batching.

    python -m whisper_tpu.serving --model_type tiny --port 8000 --slots 8
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser("whisper_tpu.serving")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--model_type", "-t", default="tiny")
    p.add_argument("--checkpoint", "-p", default=None)
    p.add_argument("--slots", type=int, default=8, help="max concurrent decodes")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--steps_per_sync", type=int, default=4)
    p.add_argument("--max_tokens", type=int, default=None)
    p.add_argument("--timestamps", action="store_true")
    p.add_argument("--kv_quant", action="store_true",
                   help="int8-quantize the cross-attention KV state")
    p.add_argument("--self_kv_quant", action="store_true",
                   help="int8-quantize the self-attention KV slot cache")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel degree: shard weights/KV over this "
                        "many chips (heads+MLP over the model mesh axis)")
    p.add_argument("--timeout", type=float, default=300.0)
    args = p.parse_args(argv)

    from ..utils import compilation_cache

    compilation_cache.enable()
    import jax.numpy as jnp

    from ..config import get_config
    from ..models.checkpoint import load_checkpoint
    from ..models.model import init_params
    from ..tokenizer import get_tokenizer
    from .engine import ContinuousBatchingEngine
    from .server import make_server

    if args.checkpoint:
        params, cfg = load_checkpoint(args.checkpoint, size=args.model_type)
    else:
        cfg = get_config(args.model_type)
        params = init_params(cfg)
    tok = get_tokenizer(cfg.is_multilingual, num_languages=cfg.num_languages)

    mesh = None
    if args.tp > 1:
        from ..parallel.sharding import make_mesh

        mesh = make_mesh(1, args.tp)

    engine = ContinuousBatchingEngine(
        params, cfg, tok,
        max_slots=args.slots,
        compute_dtype=jnp.dtype(args.dtype),
        steps_per_sync=args.steps_per_sync,
        max_tokens=args.max_tokens,
        timestamps=args.timestamps,
        kv_quant=args.kv_quant,
        self_kv_quant=args.self_kv_quant,
        mesh=mesh,
    ).start()

    srv = make_server(engine, args.host, args.port, request_timeout_s=args.timeout)
    print(f"whisper_tpu server on {args.host}:{args.port} "
          f"(model={cfg.name}, slots={args.slots})", file=sys.stderr)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        engine.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
