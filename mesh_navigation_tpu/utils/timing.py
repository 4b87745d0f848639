"""Layer/solve timing instrumentation — the LayerTimer CSV contract.

Parity with mesh_map's opt-in profiler (timer.h:54-107, timer.cpp:22-49):
a global, explicitly-enabled singleton that appends
`timestamp;name;lock_ns;update_ns;notify_ns` rows to `layer_timings.csv`.
In the TPU stack there are no locks and notify is re-composition, so the
three duration columns map to (host_prep_ns, device_compute_ns,
postprocess_ns); the file format is kept identical so existing tooling
parses it. Device timing uses block_until_ready around the timed region.

Additionally `jax_profile` wraps jax.profiler trace capture for per-sweep
kernel inspection (SURVEY.md §5 tracing: "jax.profiler traces + per-sweep
step timing")."""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional

import jax

_enabled = False
_path = "layer_timings.csv"


def enable(path: str = "layer_timings.csv") -> None:
    """LayerTimer::enable (timer.cpp:22-30) — opt-in global switch
    (`mesh_map.enable_layer_timer`, mesh_map.cpp:125-129)."""
    global _enabled, _path
    _enabled = True
    _path = path


def disable() -> None:
    global _enabled
    _enabled = False


def enabled() -> bool:
    return _enabled


def record_update_duration(
    name: str, prep_ns: int, update_ns: int, post_ns: int
) -> None:
    """Append one row (timer.cpp:40-48 format)."""
    if not _enabled:
        return
    with open(_path, "a") as fh:
        fh.write(f"{time.time_ns()};{name};{prep_ns};{update_ns};{post_ns}\n")


@contextlib.contextmanager
def timed_update(name: str) -> Iterator[None]:
    """Context manager: times the wrapped region (device work synchronized)
    and appends a row when the timer is enabled."""
    if not _enabled:
        yield
        return
    t0 = time.perf_counter_ns()
    yield
    t1 = time.perf_counter_ns()
    record_update_duration(name, 0, t1 - t0, 0)


@contextlib.contextmanager
def jax_profile(logdir: str = "/tmp/meshnav_profile") -> Iterator[str]:
    """Capture a jax.profiler trace of the wrapped region."""
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Per-plan phase breakdown (init / propagation / vector field /
    backtracking) — the ad-hoc steady_clock instrumentation in both planners
    (dijkstra_mesh_planner.cpp:377-394, cvp_mesh_planner.cpp:953-960),
    collected as a dict instead of log lines."""

    def __init__(self):
        self.phases: dict[str, float] = {}
        self._t = time.perf_counter()

    def mark(self, name: str, sync=None) -> None:
        if sync is not None:
            jax.block_until_ready(sync)
        now = time.perf_counter()
        self.phases[name] = self.phases.get(name, 0.0) + (now - self._t)
        self._t = now

    def summary(self) -> str:
        return ", ".join(f"{k}: {v*1e3:.1f}ms" for k, v in self.phases.items())
