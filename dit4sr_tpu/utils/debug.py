"""Observability: timers, NaN guards, profiler traces.

Rebuild of the reference's lightweight tooling (SURVEY.md §5): the
`perfcount` wall-clock+memory decorator (utils/vaehook.py:431-456), NaN
checks (utils/devices.py:93-110), per-step grad monitoring (already in the
train step metrics), plus the TPU-native upgrade: jax.profiler traces.
"""

from __future__ import annotations

import contextlib
import functools
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp


def perfcount(fn: Callable) -> Callable:
    """Wall-clock + device-memory decorator (vaehook perfcount equivalent).
    Hard-syncs through a scalar pull (axon's block_until_ready is unreliable
    for timing)."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        leaf = next(
            (x for x in jax.tree.leaves(out) if hasattr(x, "astype")), None
        )
        if leaf is not None:
            float(jnp.sum(leaf.astype(jnp.float32)))
        dt = time.perf_counter() - t0
        mem = ""
        try:
            stats = jax.local_devices()[0].memory_stats()
            if stats:
                mem = f", {stats.get('bytes_in_use', 0) / 1e9:.2f} GB in use"
        except Exception:
            pass
        print(f"[perf] {fn.__name__}: {dt * 1000:.1f} ms{mem}")
        return out

    return wrapped


def test_for_nans(tree, where: str = "") -> Dict[str, int]:
    """Count non-finite values per leaf path (utils/devices.py:93-110
    equivalent). Returns {path: count} for offending leaves."""
    from flax import traverse_util

    if not isinstance(tree, dict):
        tree = {"value": tree}
    flat = traverse_util.flatten_dict(tree, sep="/") if isinstance(tree, dict) else tree
    bad = {}
    for k, v in flat.items():
        if hasattr(v, "astype"):
            n = int(jnp.sum(~jnp.isfinite(v.astype(jnp.float32))))
            if n:
                bad[f"{where}{k}"] = n
    return bad


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/jax-trace"):
    """jax.profiler trace context; view with tensorboard/xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling per-phase timers for the training loop."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, float]:
        return {
            k: self.totals[k] / max(1, self.counts[k]) for k in self.totals
        }
