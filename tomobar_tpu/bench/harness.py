"""Benchmark + quality harness.

The reference times with ``timeit.default_timer`` in demos and NVTX ranges
in (disabled) perf tests (SURVEY.md §5-6); here timing and quality
measurement are a first-class module:

* :func:`time_fn` — robust steady-state timing of a jitted callable.
  ``block_until_ready`` is NOT a reliable barrier on remote-attached
  devices (the axon TPU tunnel acknowledges enqueue, not completion), so
  timing materialises a 4-byte device->host readback (:func:`device_sync`)
  and subtracts the measured readback latency.
* :func:`rmse` / :func:`rel_rmse` — the RMSE-vs-phantom quality metric the
  reference demos compute via TomoPhantom's QualityTools
  (``Demos/tomophantom_3D_recon1.py:140-142``).
* :func:`trace` — context manager around ``jax.profiler`` for on-demand
  device traces.
"""

from __future__ import annotations

import contextlib
import timeit
from typing import Callable

import jax
import numpy as np

__all__ = ["device_sync", "time_fn", "rmse", "rel_rmse", "trace"]


def device_sync(x=None) -> None:
    """True device barrier: force a tiny device->host value readback.

    ``jax.block_until_ready`` only waits for the local buffer handle to be
    defined; on remote-attached devices (axon tunnel) that happens at
    enqueue, not completion, so naive timing measures dispatch rate.  A
    value readback cannot complete before every producing op has run."""
    import jax.numpy as jnp

    if x is None:
        x = jnp.zeros(())
    leaf = jax.tree_util.tree_leaves(x)[-1]
    scalar = leaf if getattr(leaf, "ndim", 0) == 0 else leaf.ravel()[0]
    np.asarray(jax.device_get(scalar))


def _sync_overhead(out, samples: int = 3) -> float:
    """Median readback latency on an already-computed buffer."""
    ts = []
    for _ in range(samples):
        t0 = timeit.default_timer()
        device_sync(out)
        ts.append(timeit.default_timer() - t0)
    return float(np.median(ts))


def time_fn(fn: Callable, *args, warmup: int = 1, reps: int = 5) -> float:
    """Mean wall-clock seconds per call, synced via value readback.

    Pick ``reps`` so ``reps * time >> ~100 ms``: the readback latency is
    measured and subtracted but jitters by tens of ms on remote devices."""
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    device_sync(out)
    ovh = _sync_overhead(out)
    t0 = timeit.default_timer()
    for _ in range(reps):
        out = fn(*args)
    device_sync(out)
    return max(timeit.default_timer() - t0 - ovh, 0.0) / reps


def rmse(a, b) -> float:
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    return float(np.sqrt(np.mean((a - b) ** 2)))


def rel_rmse(rec, ref) -> float:
    ref_n = np.sqrt(np.mean(np.asarray(ref, dtype=np.float64) ** 2))
    return rmse(rec, ref) / max(ref_n, 1e-30)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/tomobar_tpu_trace"):
    """``with trace(): ...`` captures a jax.profiler device trace."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
