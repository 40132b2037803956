"""Tracing and per-stage timing instrumentation.

The reference's only observability is inline chrono timing in the example
mains (stereo_kitti.cc:108-141) and cout prints. This module packages the
equivalent plus device-level tracing:

- StageTimer: named-stage wall-clock statistics (median/mean/p95), usable
  as a context manager around pipeline stages. The tracker carries one as
  `tracker.stats` (off by default; enable with `tracker.stats.enabled =
  True` or SLAMConfig.profile_stages).
- device_trace(): context manager around jax.profiler.trace — produces a
  TensorBoard/XProf trace of every XLA/Pallas dispatch in scope.

Axon relay note (CLAUDE.md): on this development box host-side wall clock
includes the relay round trip; on-device time needs device_trace or the
bench.py slope method.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np


class StageTimer:
    """Accumulates wall-clock samples per named stage."""

    def __init__(self, enabled: bool = False):
        self.enabled = enabled
        self.samples: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.samples[name].append(time.perf_counter() - t0)

    def add(self, name: str, seconds: float) -> None:
        if self.enabled:
            self.samples[name].append(seconds)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, xs in self.samples.items():
            a = np.asarray(xs)
            out[name] = {
                "n": int(a.size),
                "median_ms": float(np.median(a) * 1e3),
                "mean_ms": float(a.mean() * 1e3),
                "p95_ms": float(np.percentile(a, 95) * 1e3),
                "total_s": float(a.sum()),
            }
        return out

    def report(self) -> str:
        rows = sorted(self.summary().items(),
                      key=lambda kv: -kv[1]["total_s"])
        if not rows:
            return "(no stage samples)"
        lines = [f"{'stage':<24}{'n':>6}{'median':>9}{'mean':>9}{'p95':>9}{'total':>9}"]
        for name, s in rows:
            lines.append(f"{name:<24}{s['n']:>6}{s['median_ms']:>8.1f}m"
                         f"{s['mean_ms']:>8.1f}m{s['p95_ms']:>8.1f}m"
                         f"{s['total_s']:>8.2f}s")
        return "\n".join(lines)

    def reset(self) -> None:
        self.samples.clear()


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace of every device dispatch in scope; view with
    TensorBoard's profile plugin / XProf."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
