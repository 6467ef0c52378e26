"""Structured metrics, stage timers, and profiling helpers.

Replaces the reference's ad-hoc observability (TicToc wall timers +
ROS_DEBUG prints, feature_tracker/src/tic_toc.h, running stage accumulators
feature_tracker.h:145-152, per-frame printStatistics
esvio_estimator/src/utility/visualization.cpp:94-131) with:

  * StageTimer   — accumulating per-stage wall timers with device sync
  * Metrics      — counters / gauges / histograms, JSON-lines emission
  * trace        — context manager bridging to jax.profiler (xprof) when
                   available, no-op otherwise

All host-side and dependency-free; kernels stay pure.
"""
from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Optional


def _sync(x):
    """Force device completion.  block_until_ready is unreliable through the
    axon tunnel (returns early), so fetch a scalar digest when possible."""
    try:
        import jax
        import jax.numpy as jnp
        leaves = jax.tree_util.tree_leaves(x)
        if leaves:
            float(jnp.asarray(leaves[-1]).reshape(-1)[0])
    except Exception:
        pass


class StageTimer:
    """Accumulating wall-clock stage timers (TicToc + accumulators analog).

    >>> tim = StageTimer()
    >>> with tim("frontend"):  out = frontend(...)
    >>> tim.report()  # {'frontend': {'total_s':..., 'n':..., 'mean_ms':...}}
    """

    def __init__(self, sync: bool = False):
        self.total = defaultdict(float)
        self.count = defaultdict(int)
        self._sync = sync
        self._result = None

    @contextlib.contextmanager
    def __call__(self, stage: str, result=None):
        t0 = time.perf_counter()
        try:
            yield self
        finally:
            if self._sync and self._result is not None:
                _sync(self._result)
                self._result = None
            self.total[stage] += time.perf_counter() - t0
            self.count[stage] += 1

    def observe(self, result):
        """Mark a device value whose completion bounds the current stage."""
        self._result = result

    def report(self):
        return {
            k: dict(total_s=round(self.total[k], 6), n=self.count[k],
                    mean_ms=round(self.total[k] / max(self.count[k], 1) * 1e3, 3))
            for k in self.total
        }


class Metrics:
    """Counters + gauges + simple histograms with JSON-lines emission.

    Mirrors the quantities the reference logs per frame (track counts,
    solver time, pose) as structured records instead of ROS console text."""

    def __init__(self, sink: Optional[str] = None):
        self.counters = defaultdict(float)
        self.gauges = {}
        self.series = defaultdict(list)
        self._sink = open(sink, "a") if sink else None

    def count(self, name: str, inc: float = 1.0):
        self.counters[name] += inc

    def gauge(self, name: str, value: float):
        self.gauges[name] = float(value)

    def observe(self, name: str, value: float):
        self.series[name].append(float(value))

    def emit(self, **extra):
        """One JSON line with the current counters/gauges (+ extras)."""
        rec = dict(ts=time.time(), **{f"c.{k}": v for k, v in self.counters.items()},
                   **{f"g.{k}": v for k, v in self.gauges.items()}, **extra)
        line = json.dumps(rec)
        if self._sink:
            self._sink.write(line + "\n")
            self._sink.flush()
        return line

    def summary(self):
        out = dict(self.gauges)
        out.update({k: v for k, v in self.counters.items()})
        for k, vs in self.series.items():
            if vs:
                s = sorted(vs)
                out[f"{k}.mean"] = sum(vs) / len(vs)
                out[f"{k}.p50"] = s[len(s) // 2]
                out[f"{k}.p95"] = s[min(len(s) - 1, int(len(s) * 0.95))]
                out[f"{k}.max"] = s[-1]
        return out

    def close(self):
        if self._sink:
            self._sink.close()
            self._sink = None


@contextlib.contextmanager
def trace(name: str, enabled: bool = True):
    """jax.profiler.TraceAnnotation bridge (xprof); no-op if unavailable."""
    if not enabled:
        yield
        return
    try:
        import jax
        with jax.profiler.TraceAnnotation(name):
            yield
    except Exception:
        yield


@contextlib.contextmanager
def device_profile(log_dir: str, enabled: bool = True):
    """Capture a device profile (jax.profiler.trace) into log_dir."""
    if not enabled:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
