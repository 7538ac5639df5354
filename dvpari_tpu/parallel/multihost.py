"""Multi-host (DCN) runtime initialization.

The reference's only parallelism is rayon's shared-memory thread pool
(SURVEY.md section 2); scaling past one host there means nothing --
here it means `jax.distributed`: every host process initializes against
a coordinator, `jax.devices()` becomes the GLOBAL device list, and the
existing 1-D mesh + GSPMD shardings (parallel/mesh.py,
parallel/sharded.py) work unchanged -- XLA routes intra-host collective
hops over ICI and inter-host hops over DCN.

This box exposes a single tunneled chip, so the real-hardware claim is
untestable here; what IS testable is the entire software path:
tests/test_multihost.py spawns a genuine 2-process CPU cluster (one
coordinator, 2 devices per process) and runs a cross-process sharded
reduction through the production mesh helpers, asserting against the
host oracle.  On a real pod slice the same three env vars light up
multi-host for every CLI entry point (python -m dvpari_tpu ... calls
maybe_initialize() first).

Env contract (standard jax.distributed triple):
  DVPARI_COORDINATOR    host:port of process 0's coordinator service
  DVPARI_NUM_PROCESSES  total process count
  DVPARI_PROCESS_ID     this process's rank in [0, num_processes)
"""

from __future__ import annotations

import os

ENV_COORD = "DVPARI_COORDINATOR"
ENV_NPROC = "DVPARI_NUM_PROCESSES"
ENV_PID = "DVPARI_PROCESS_ID"

_initialized = False


def is_configured() -> bool:
    """True when the multi-host env triple is fully present."""
    return all(os.environ.get(k) for k in (ENV_COORD, ENV_NPROC, ENV_PID))


def maybe_initialize() -> bool:
    """Initialize jax.distributed from the DVPARI_* env triple.

    No-op (returns False) when the triple is absent -- single-host runs
    never pay a coordinator timeout.  Idempotent: a second call returns
    True without re-initializing.  Malformed values raise immediately
    (fail-fast beats a cluster hanging on one misconfigured rank)."""
    global _initialized
    if _initialized:
        return True
    if not is_configured():
        return False
    import jax

    coord = os.environ[ENV_COORD]
    nproc = int(os.environ[ENV_NPROC])
    pid = int(os.environ[ENV_PID])
    if not (0 <= pid < nproc):
        raise ValueError(f"{ENV_PID}={pid} out of range for {nproc} processes")
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )
    _initialized = True
    return True


def process_info() -> "tuple[int, int]":
    """(process_index, process_count) of the live runtime."""
    import jax

    return jax.process_index(), jax.process_count()


def global_array(host_data, mesh, spec):
    """Build a GLOBAL sharded array from identical host data replicated
    on every process (the setup/prove entry points load artifacts from a
    shared filesystem on every host, exactly like the reference's
    mmap'd artifact dir).  Each process materializes only its
    addressable shards; cross-process shards are never transferred."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding

    arr = np.asarray(host_data)
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )
