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


def reset():
    EVENTS.clear()


def summary() -> dict:
    out: dict = {}
    for e in EVENTS:
        out[e["phase"]] = out.get(e["phase"], 0.0) + e["seconds"]
    return out
