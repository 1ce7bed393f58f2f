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


def _hard_sync(out):
    """Fence on ``out`` with an actual host readback of ONE ELEMENT of
    its smallest array leaf: under remote-PJRT tunnels (the "axon" TPU
    plugin) ``block_until_ready`` can return before execution finishes,
    so a device->host transfer is the only reliable completion barrier —
    and transfers through the tunnel are slow, so it must be a scalar,
    never a whole buffer."""
    leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "nbytes")]
    if leaves:
        leaf = min(leaves, key=lambda x: x.nbytes)
        jax.device_get(leaf[(0,) * leaf.ndim] if leaf.ndim else leaf)


def timeit(fn, n: int = 5, warmup: int = 1) -> float:
    """Mean wall-clock seconds of ``fn()`` over ``n`` back-to-back async
    dispatches after ``warmup`` compile calls, fenced with a host
    readback (see ``_hard_sync``).  The shared timer for big steps
    (rollout / train_step); for sub-millisecond pieces use ``timed_scan``
    so per-call dispatch latency doesn't dominate."""
    out = None
    for _ in range(warmup):
        out = fn()
    _hard_sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    _hard_sync(out)
    return (time.perf_counter() - t0) / n


def timed_scan(fn, *args, iters: int = 20) -> float:
    """Mean seconds per call of ``fn(*args)`` with ``iters`` iterations
    fused into ONE jitted ``lax.scan`` whose carry is genuinely
    value-perturbed by the previous output (a data-dependent +0/+1 on an
    integer input), so XLA cannot hoist (LICM), slice (DCE), or
    algebraically fold the body; the timer syncs with a scalar host
    readback because ``block_until_ready`` can return early under remote
    PJRT tunnels.  The right tool for micro-benchmarking kernel pieces
    on the chip (scripts/perf_movegen.py, scripts/perf_breakdown.py)."""
    import jax.numpy as jnp

    int_ok = [i for i, a in enumerate(args) if a.dtype != jnp.bool_]
    idx = min(int_ok, key=lambda i: args[i].nbytes)

    @jax.jit
    def run(args):
        def body(c, _):
            out = fn(*c)
            tag = sum(
                jnp.sum(x.astype(jnp.int32) * x.astype(jnp.int32))
                for x in jax.tree_util.tree_leaves(out)
            ).astype(jnp.int32)
            t = c[idx]
            newt = (t + (tag & 1).astype(t.dtype)).astype(t.dtype)
            c = tuple(newt if i == idx else a for i, a in enumerate(c))
            return c, tag

        _, outs = jax.lax.scan(body, args, None, length=iters)
        return outs[-1]

    run(args).item()  # compile + warm
    t0 = time.perf_counter()
    run(args).item()  # true sync via readback
    return (time.perf_counter() - t0) / iters


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler trace viewable in TensorBoard's profile tab."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
