"""Lightweight host-side performance counters (dispatch/readback accounting).

The reference reports per-stage median times via SaveStatistics (reference
src/System.cc:556-563); on a remote-TPU backend the number of program
launches and device->host fetches per frame is the analogous first-order
cost model (each blocking fetch costs a tunnel round trip). The tracking /
mapping / bench code bumps these counters at its dispatch and fetch sites;
bench.py reports per-steady-frame rates alongside the fps metric so the
"where does the time go" question has measured evidence.

Counters (by convention):
  track_dispatches   fused tracking programs launched
  track_retires      tracking results consumed on host
  host_fetches       blocking device->host fetch calls (_np / device_get
                     sites in the per-frame and mapping paths)
  host_fetch_s       total seconds spent blocked in those fetches
"""

from __future__ import annotations

import time
from collections import defaultdict

_counts: dict = defaultdict(float)
enabled = True

# optional event trace (bench AF_TRACE=1): wall-clock-stamped markers from
# the tracking/mapping threads, correlated offline with per-frame times to
# locate the frame-time tail. Cheap append; off unless trace_enabled.
_events: list = []
trace_enabled = False


def event(name: str, **kw):
    if trace_enabled:
        _events.append((time.perf_counter(), name, kw))


def events() -> list:
    return list(_events)


def clear_events():
    _events.clear()


def bump(key: str, n: float = 1.0):
    if enabled:
        _counts[key] += n


def get(key: str) -> float:
    return _counts.get(key, 0.0)


def snapshot() -> dict:
    return dict(_counts)


def reset():
    _counts.clear()


class timed_fetch:
    """Context manager: count a blocking device->host fetch and the time
    spent in it."""

    def __init__(self, key: str = "host_fetch"):
        self.key = key

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self.t0
        bump(self.key + "es")
        bump(self.key + "_s", dt)
        return False
