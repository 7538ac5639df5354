"""Structured per-phase timing (replaces the reference's println! lines).

The reference instruments phases with ad-hoc prints and Instant timers
(reference: src/dvsnark_test.rs:188-238, println!s throughout
src/proving.rs / src/srs.rs).  Here every phase is recorded as a
structured event so bench.py and tests can introspect wall-clock per
stage; set DVPARI_TRACE=1 for live stderr lines.
"""

from __future__ import annotations

import contextlib
import os
import sys
import time

EVENTS: list = []


@contextlib.contextmanager
def phase(name: str, **attrs):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        EVENTS.append({"phase": name, "seconds": dt, **attrs})
        if os.environ.get("DVPARI_TRACE"):
            print(f"[dvpari] {name}: {dt:.3f}s {attrs}", file=sys.stderr)


def fence(*arrays) -> None:
    """Profiling fence: fetch one element of each array to host, forcing
    the device queue to drain through the ops that produced it.  On the
    tunneled axon backend block_until_ready returns at enqueue, so a
    device->host fetch is the only honest sync (JOURNAL.md round-1).

    Only active under DVPARI_SYNC_PHASES=1 -- the default pipeline keeps
    phases async (dispatch-and-continue), which is faster end-to-end but
    attributes a phase's device time to whichever later phase fetches
    first.  Enable for per-phase attribution runs."""
    if not os.environ.get("DVPARI_SYNC_PHASES"):
        return
    import jax

    for a in arrays:
        if a is None:
            continue
        flat = a.reshape(-1) if hasattr(a, "reshape") else a
        jax.device_get(flat[:1])


def reset():
    EVENTS.clear()


def summary() -> dict:
    out: dict = {}
    for e in EVENTS:
        out[e["phase"]] = out.get(e["phase"], 0.0) + e["seconds"]
    return out
