"""Multi-host runtime initialization + scaling measurement.

The reference has no distributed anything (SURVEY.md §2.4). Here multi-host
serving is DP-first: each host feeds its local chips utterance batches; the
only cross-host traffic is request routing (DCN), never the token loop —
which is what makes >=85% 2-host scaling achievable (decode is latency-bound;
any per-token cross-host chatter would sink it).

Usage on a pod slice (one process per host):
    from whisper_tpu.parallel import distributed
    distributed.initialize()            # jax.distributed under the hood
    mesh = distributed.serving_mesh(tp=1)
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from .sharding import make_mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the JAX distributed runtime (no-op single-process).

    Args fall back to the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID) / cloud auto-detection.
    """
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes <= 1 and coordinator_address is None:
        return  # single host
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def serving_mesh(tp: int = 1):
    """(data, model) mesh over all global devices; tp chips per model shard.

    tp=1 for tiny..small (weights fit one chip); tp>1 for Turbo when
    batch-64 KV + weights exceed a single chip's HBM.
    """
    n = jax.device_count()
    assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
    return make_mesh(n // tp, tp)


def local_batch_slice(global_batch: int) -> slice:
    """This process's slice of a globally-sharded utterance batch."""
    n_proc = jax.process_count()
    per = global_batch // n_proc
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
