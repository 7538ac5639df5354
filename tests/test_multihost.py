"""Multi-host harness: a REAL 2-process jax.distributed CPU cluster.

Spawns two OS processes (rank 0 hosts the coordinator), each with two
forced CPU devices, so `jax.devices()` is a 4-device GLOBAL list split
across processes -- the same topology shape as a 2-host TPU pod slice,
with DCN hops replaced by gRPC on localhost.  The worker drives the
production mesh helpers (parallel/mesh.py, parallel/multihost.py)
through a sharded Fr dot-product whose lattice of collectives crosses
the process boundary, and checks the result against python-int
arithmetic mod P.

This is the testable face of the BASELINE multi-host scaling claim: on
real hardware the same env triple + entry points light up multi-host
with zero code changes (multihost.py module docstring).
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import os, sys
    sys.path.insert(0, os.getcwd())  # repo root (Popen cwd); the worker
    # file itself lives in tmp_path, so script-dir resolution won't do
    import jax
    jax.config.update("jax_platforms", "cpu")
    from dvpari_tpu.parallel import multihost

    assert multihost.maybe_initialize(), "env triple not seen"
    assert multihost.maybe_initialize(), "not idempotent"
    pid, nproc = multihost.process_info()
    assert nproc == 2, nproc
    assert len(jax.devices()) == 4, jax.devices()  # 2 local x 2 procs

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding
    from dvpari_tpu.ops import fr
    from dvpari_tpu.parallel import mesh as M

    mesh = M.make_mesh()
    n = 64
    a_i = [(7 * i + 3) % fr.P for i in range(n)]
    b_i = [(11 * i + 5) ** 3 % fr.P for i in range(n)]
    a = multihost.global_array(fr.from_int(a_i), mesh, M.spec_last(2))
    b = multihost.global_array(fr.from_int(b_i), mesh, M.spec_last(2))

    @jax.jit
    def dot(x, y):
        # field sum over the SHARDED axis: GSPMD lowers the reduction
        # to a cross-process psum (the DCN hop on a real pod slice)
        return fr.sum_along(fr.mul(x, y), 0)

    got = fr.to_int(jax.device_get(dot(a, b))) % fr.P
    want = sum(x * y for x, y in zip(a_i, b_i)) % fr.P
    assert got == want, (got, want)
    print(f"MULTIHOST-OK rank={pid}", flush=True)
    """
)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cluster_sharded_fr_dot(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = _free_port()
    env_base = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "DVPARI_COORDINATOR": f"127.0.0.1:{port}",
        "DVPARI_NUM_PROCESSES": "2",
        # never inherit a persistent-cache dir pointed at the TPU tunnel
        "JAX_COMPILATION_CACHE_DIR": str(tmp_path / "cache"),
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker)],
            env={**env_base, "DVPARI_PROCESS_ID": str(rank)},
            cwd=REPO,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for rank in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-host workers timed out\n" + "\n".join(outs))
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"MULTIHOST-OK rank={rank}" in out, out
