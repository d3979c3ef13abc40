"""Profiling & throughput instrumentation.

The reference has no profiling beyond ad-hoc time.time() benchmarking in a
commented-out test (SURVEY.md §5).  This module provides the TPU-idiomatic
equivalents: a step-time/throughput meter and a jax.profiler trace context.

Measurement caveat (discovered on this machine's relayed TPU): repeated
IDENTICAL dispatches can be memoized by the transport and report impossibly
fast times.  StepTimer is meant to wrap *state-mutating* training steps,
which cannot be memoized; for micro-benchmarks of pure functions, chain the
output into the next call's input or wrap K iterations in lax.scan.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import numpy as np


class StepTimer:
    """Tracks step wall time and frames/sec with a warmup skip."""

    def __init__(self, warmup_steps: int = 1):
        self.warmup_steps = warmup_steps
        self._times: list = []
        self._count = 0
        self._t0: Optional[float] = None

    def __enter__(self) -> "StepTimer":
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup_steps:
            self._times.append(dt)

    def summary(self, batch_size: Optional[int] = None) -> Dict[str, float]:
        if not self._times:
            return {}
        times = np.asarray(self._times)
        out = {
            "steps": len(times),
            "mean_ms": float(times.mean() * 1e3),
            "p50_ms": float(np.median(times) * 1e3),
            "p95_ms": float(np.percentile(times, 95) * 1e3),
        }
        if batch_size:
            out["frames_per_sec"] = float(batch_size / times.mean())
        return out


def aot_compile_with_cost(jitted, *args):
    """lower().compile() + XLA cost analysis, the shared protocol of
    bench.py and scripts/profile_roofline.py (keep them in lockstep).

    Returns (compiled, flops, bytes_accessed). Rules (CLAUDE.md):
      * Execute through the RETURNED executable — calling the jitted fn
        would re-trace and recompile (the jit dispatch cache does not
        reuse lower().compile()).
      * XLA counts a while body ONCE regardless of static trip count
        (verified: KD-step scan-50 raw 679 GF vs 691 GF single-step), so
        for a scan executable the raw numbers ARE the per-step estimates
        — never divide by the iteration count.
    """
    import sys
    compiled = jitted.lower(*args).compile()
    flops = bytes_acc = 0.0
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        bytes_acc = float(ca.get("bytes accessed", 0.0))
    except Exception as e:  # cost model unavailable on some backends
        print(f"cost_analysis unavailable: {e}", file=sys.stderr)
    return compiled, flops, bytes_acc


class StallMeter:
    """Wraps a batch iterable, separating time spent WAITING on the host
    input pipeline from the rest of the loop (device step + bookkeeping).

    Because each training step synchronizes on its loss, the wait measured
    at next(loader) is genuine input stall: the prefetch producer had the
    whole previous step's wall time to decode ahead. stall_frac ~ 0 means
    decode fully hides behind compute (SURVEY.md §7 hard-part (e))."""

    def __init__(self, iterable):
        self.iterable = iterable
        self.wait_s = 0.0
        self.total_s = 0.0
        self.batches = 0

    @property
    def stall_frac(self) -> float:
        return self.wait_s / self.total_s if self.total_s else 0.0

    def __iter__(self):
        start = time.perf_counter()
        it = iter(self.iterable)
        try:
            while True:
                t0 = time.perf_counter()
                try:
                    item = next(it)
                except StopIteration:
                    break
                self.wait_s += time.perf_counter() - t0
                self.batches += 1
                yield item
        finally:
            # Also on early exit (step exception, consumer break): callers
            # read stall_frac in THEIR finally blocks, and a total of 0
            # would report "no stall" for a partial epoch.
            self.total_s = time.perf_counter() - start


@contextlib.contextmanager
def profiler_trace(log_dir: str = "/tmp/lmsu_trace") -> Iterator[None]:
    """Capture a jax.profiler trace (view with TensorBoard / Perfetto)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
