"""Profiling helpers: section timers + jax.profiler trace hooks.

Replaces the reference's wall-clock decorator accumulator
(/root/reference/src/utils/decorators.py:14-31, SURVEY.md §5.1) with
(a) the same-style host-side section timing (correctly fenced with
``block_until_ready``) and (b) one-call TPU trace capture for the
TensorBoard profile plugin."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax

profiling_data: dict = defaultdict(lambda: {"total_time": 0.0, "call_count": 0})


@contextlib.contextmanager
def section(name: str, sync: bool = True):
    """Time a host-side section; with ``sync`` the clock stops only after
    all pending device work completes (otherwise async dispatch makes the
    numbers meaningless — the reference's decorator had this flaw for its
    CUDA path)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync:
            try:
                jax.effects_barrier()
            except Exception:
                pass
        dt = time.perf_counter() - t0
        d = profiling_data[name]
        d["total_time"] += dt
        d["call_count"] += 1


def timed(name: str | None = None, sync: bool = True):
    def deco(fn):
        label = name or fn.__name__

        def wrapper(*args, **kwargs):
            with section(label, sync=sync):
                return fn(*args, **kwargs)

        return wrapper

    return deco


def report(clear: bool = True) -> str:
    lines = []
    for fn_name, d in sorted(profiling_data.items()):
        n = d["call_count"]
        avg = d["total_time"] / n if n else 0.0
        lines.append(
            f"{fn_name}: {n} calls, total {d['total_time']:.4f}s, "
            f"avg {avg * 1e3:.3f}ms"
        )
    if clear:
        profiling_data.clear()
    return "\n".join(lines)


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler trace viewable in TensorBoard's profile tab."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
