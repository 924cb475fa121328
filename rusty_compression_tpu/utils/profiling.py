"""Profiling & timing utilities (SURVEY.md §5 "Tracing / profiling").

The reference has no instrumentation; here the benchmark/metrics layer
standardizes on:

* ``sync`` — a barrier that actually works on tunneled TPU backends
  (``jax.block_until_ready`` can return before the device finishes
  through a remote tunnel; fetching a leaf is the reliable fence).
* ``timeit_slope`` — per-iteration wall time via a two-point slope,
  cancelling the fixed per-sync flush latency (~25 ms through a
  tunnel) that would otherwise swamp millisecond kernels.
* ``trace`` — context manager around ``jax.profiler`` for XLA traces
  viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np

__all__ = ["sync", "timeit_slope", "scan_timeit", "trace"]


def sync(tree) -> None:
    """Block until every array in ``tree`` is computed (tunnel-safe)."""
    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        jax.device_get(leaves[-1])
    jax.block_until_ready(leaves)


def timeit_slope(fn, *args, n1: int = 5, n2: int = 45, trials: int = 5,
                 **kwargs) -> float:
    """Median per-iteration seconds of ``fn(*args, **kwargs)``.

    Runs ``n1`` then ``n2`` back-to-back iterations with one sync each;
    the slope ``(t2 - t1) / (n2 - n1)`` cancels both the sync latency
    and any one-time flush cost. ``fn`` must be side-effect free (same
    args each call); compile/warmup happens before measurement.
    """
    out = fn(*args, **kwargs)
    sync(out)
    slopes, means = [], []
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(n1):
            out = fn(*args, **kwargs)
        sync(out)
        t1 = time.perf_counter()
        for _ in range(n2):
            out = fn(*args, **kwargs)
        sync(out)
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / (n2 - n1))
        means.append((t2 - t0) / (n1 + n2))
    med = float(np.median(slopes))
    if med <= 0.0:
        # Slope noise exceeded the workload (sub-resolution runs, e.g.
        # tiny CI configs): fall back to the raw per-iteration mean,
        # which is always positive (includes sync overhead — an upper
        # bound, fine at this granularity).
        med = float(np.median(means))
    return med


def scan_timeit(fn, a, *rest, reps=(2, 26), trials: int = 5) -> float:
    """Dispatch-immune per-call seconds of ``fn(a, *rest)``.

    The tunnel's per-dispatch flush latency drifts 25 ms -> >1.5 s
    within a session (CLAUDE.md), which both wall-clock and dispatch-
    slope timers inherit. Here ``fn`` runs R times inside ONE jitted
    ``lax.scan`` whose carry is ``a`` perturbed by a near-free data
    dependency on fn's first output leaf (serializing iterations,
    defeating CSE); the contrast between the two rep counts in ``reps``
    cancels every per-dispatch cost, and min-statistics over ``trials``
    exploits the latency's hard floor (the jitter is one-sided).

    ``fn`` must accept ``a`` as its first argument and be shape-
    preserving in nothing but that dependency; returns seconds per call
    (NaN when every slope is negative — unusable window).
    """
    import jax.numpy as jnp

    def make(r):
        def body(c, _):
            out = fn(c, *rest)
            leaf = jax.tree_util.tree_leaves(out)[0]
            dep = jnp.real(jnp.ravel(leaf)[0])
            return c * (1.0 + 0.0 * dep.astype(jnp.real(c).dtype)), dep
        return jax.jit(lambda x: jax.lax.scan(body, x, None, length=r)[0])

    ra, rb = reps
    fa, fb = make(ra), make(rb)
    sync(fa(a))
    sync(fb(a))
    tas, tbs, slopes = [], [], []
    for _ in range(trials):
        t0 = time.perf_counter()
        sync(fa(a))
        tas.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        sync(fb(a))
        tbs.append(time.perf_counter() - t0)
        slopes.append((tbs[-1] - tas[-1]) / (rb - ra))
    per = (min(tbs) - min(tas)) / (rb - ra)
    if per <= 0:
        pos = [s for s in slopes if s > 0]
        per = float(np.median(pos)) if pos else float("nan")
    return per


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA profiler trace of the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
