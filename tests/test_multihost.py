"""Multi-host runtime smoke test: 2 real processes over jax.distributed on
the CPU backend (loopback coordinator). Exercises the actual
parallel.distributed.initialize path — the virtual-device mesh tests cover
SPMD semantics; this covers process bootstrap + cross-process collectives."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})
    from whisper_tpu.parallel import distributed

    distributed.initialize(
        coordinator_address={coord!r},
        num_processes=2,
        process_id=int(sys.argv[1]),
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from whisper_tpu.parallel.sharding import make_mesh

    mesh = make_mesh(4, 1)
    # global psum across both processes' devices
    def f(x):
        return jax.lax.psum(x, "data")
    x = jnp.ones((4,))
    y = jax.jit(
        jax.shard_map(f, mesh=mesh, in_specs=P("data"), out_specs=P("data")),
    )(jax.device_put(x, NamedSharding(mesh, P("data"))))
    total = float(jnp.sum(y))
    print("proc " + sys.argv[1] + " ok total=" + str(total), flush=True)
    assert total == 16.0, total
    """
)


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    if os.environ.get("WHISPER_TPU_SKIP_MULTIHOST"):
        pytest.skip("multihost test disabled")
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=repo, coord=coord))

    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "PALLAS_AXON_POOL_IPS")}
    procs = [
        subprocess.Popen([sys.executable, str(script), str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         env=env, text=True)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=150)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("distributed bootstrap timed out in this environment")
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert "ok total=16.0" in out
