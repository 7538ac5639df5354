"""Test configuration: run the whole suite on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding correctness is
validated on a forced 8-device CPU backend (the driver separately
dry-run-compiles the multi-chip path via __graft_entry__.dryrun_multichip).
"""

import os

# Force CPU: the session environment pins JAX_PLATFORMS to the single
# tunneled TPU chip (axon), which would make eager test dispatches cross
# the network.  Sharding tests need the virtual 8-device CPU mesh anyway.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin force-overrides jax_platforms at import time, so the
# env var alone is not enough - pin the config explicitly.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: most suite time is XLA CPU compiles of the
# big crypto graphs; cache them across runs.  Repo-local (not /tmp): /tmp
# is wiped between driver sessions and a cold suite run costs ~50 min.
#
# Poisoned-entry remedy: some XLA:CPU AOT entries SIGSEGV the process on
# reload (get_executable_and_time) -- if a suite run dies that way, the
# fix is `rm -rf .jax_cache/cpu`.  Automated below via a crash sentinel
# that counts CONSECUTIVE crashed runs: the sentinel exists for the
# duration of a suite run and is removed on clean session finish (see
# pytest_sessionfinish).  One crash retries with the cache intact (most
# deaths are transient: timeout-kill races, host OOM pressure); a second
# consecutive crash is taken as a poisoned entry and wipes the cache.
# Wiping on the FIRST crash made every transient death cascade into a
# ~50-min cold recompile of the next run.
_CPU_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache", "cpu",
)
_CRASH_SENTINEL = os.path.join(_CPU_CACHE_DIR, ".suite_running")
_prior_crashes = 0
if os.path.exists(_CRASH_SENTINEL):
    try:
        with open(_CRASH_SENTINEL) as _f:
            _prior_crashes = int(_f.read().split()[0])
    except (ValueError, IndexError, OSError):
        _prior_crashes = 1
    if _prior_crashes >= 2:
        import shutil

        shutil.rmtree(_CPU_CACHE_DIR, ignore_errors=True)
        _prior_crashes = 0
os.makedirs(_CPU_CACHE_DIR, exist_ok=True)
with open(_CRASH_SENTINEL, "w") as _f:
    _f.write(
        f"{_prior_crashes + 1} consecutive crashes if still present; "
        "removed by pytest_sessionfinish on clean exit\n"
    )

jax.config.update("jax_compilation_cache_dir", _CPU_CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
# This jaxlib's XLA:CPU AOT cache entries embed pseudo-features
# (+prefer-no-scatter) the loader rejects on reload -> SIGSEGV; cache the
# compile front-end only.
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")

import contextlib

import pytest


# `timeout`-killed runs (SIGTERM) are routine and must NOT look like
# crashes: convert SIGTERM to a graceful KeyboardInterrupt so
# pytest_sessionfinish still runs and removes the sentinel.  A real
# SIGSEGV cannot run Python handlers, so only genuine crashes leave the
# sentinel behind -- exactly the poisoned-cache case the wipe targets.
import signal as _signal


def _graceful_term(signum, frame):
    raise KeyboardInterrupt("SIGTERM")


try:
    _signal.signal(_signal.SIGTERM, _graceful_term)
except (ValueError, OSError):
    pass  # non-main thread / restricted env: sentinel stays best-effort


def pytest_sessionfinish(session, exitstatus):
    """Clean exit -> drop the crash sentinel (see cache setup above)."""
    try:
        os.remove(_CRASH_SENTINEL)
    except OSError:
        pass


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute test (XLA:CPU compiles); default tier skips "
        "these, full CI mode runs them with DVPARI_SLOW_TESTS=1",
    )


def pytest_collection_modifyitems(config, items):
    """Two-tier suite (the reference's one-command `cargo test` takes
    minutes; here XLA:CPU compiles of the big crypto graphs dominate).
    Default tier covers every subsystem.  MEASURED r5 on the 4-core
    box, both while sharing the host with a TPU ladder run: cold cache
    2 h 13 min (94 passed / 12 skipped, .logs r5_cold), warm cache
    ~45 min (.logs r5_warm) -- the earlier "<5 min warm" claim was
    never substantiated and is withdrawn; most warm time is genuine
    crypto execution, not compiles.  Slow tier adds interpret-mode
    Pallas kernels, the toy e2e, at-scale kronecker:
    DVPARI_SLOW_TESTS=1."""
    if os.environ.get("DVPARI_SLOW_TESTS"):
        return
    skip = pytest.mark.skip(
        reason="slow tier: set DVPARI_SLOW_TESTS=1 to run"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def no_persistent_compile_cache():
    """Disable the persistent compile cache for one test.

    Some SPMD executables (sharded prove / dryrun_multichip) still
    produce cache entries this jaxlib SIGSEGVs on when reloading
    (get_executable_and_time), even with enable_xla_caches="none" --
    one poisoned entry then kills every later suite run.  Tests that
    compile such programs opt out of the cache entirely."""
    prev = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    try:
        yield
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
