"""Tracing / profiling helpers (SURVEY.md §5 — the reference has NO
tracing; these are the TPU-native observability hooks).

* `trace(path)`  — context manager around jax.profiler for device traces
  viewable in TensorBoard/Perfetto.
* `timed(fn)`    — wall-time a jitted callable with an honest completion
  barrier (host fetch of a tiny slice — see tpu-env notes: on tunneled
  backends `block_until_ready` may not block on execution).
* `Counters`     — simple ops/s accounting used by bench.py.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Callable, Dict

import numpy as np
import jax


@contextlib.contextmanager
def trace(path: str = "/tmp/jax_trace"):
    jax.profiler.start_trace(path)
    try:
        yield path
    finally:
        jax.profiler.stop_trace()


def force(result) -> None:
    """Honest completion barrier: host-fetch one element per leaf."""
    for x in jax.tree_util.tree_leaves(result):
        if hasattr(x, "reshape"):
            np.asarray(x.reshape(-1)[:1])


def timed(fn: Callable, *args, iters: int = 3, warmup: int = 1):
    """Returns (seconds_per_call, last_result)."""
    r = None
    for _ in range(warmup):
        r = fn(*args)
        force(r)
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
        force(r)
    return (time.time() - t0) / iters, r


@dataclass
class Counters:
    """ops/s accounting: record named op counts and elapsed time."""

    counts: Dict[str, int] = field(default_factory=dict)
    seconds: Dict[str, float] = field(default_factory=dict)

    def add(self, name: str, n_ops: int, secs: float) -> None:
        self.counts[name] = self.counts.get(name, 0) + n_ops
        self.seconds[name] = self.seconds.get(name, 0.0) + secs

    def rate(self, name: str) -> float:
        s = self.seconds.get(name, 0.0)
        return self.counts.get(name, 0) / s if s else 0.0

    def report(self) -> Dict[str, float]:
        return {k: self.rate(k) for k in self.counts}
