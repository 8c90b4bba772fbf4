"""Profiling / timing harness.

The reference's instrumentation is wall-clock prints + thop FLOPs counts
(SURVEY.md §5.1). TPU equivalents:
  * `trace(logdir)` — `jax.profiler` xplane trace (TensorBoard-viewable);
  * `time_fn` — honest steady-state timing that forces completion by
    fetching a value (`block_until_ready` is unreliable through relayed
    transports — see .claude/skills/verify/SKILL.md);
  * `flops_estimate` — XLA cost analysis of a jitted fn (thop equivalent).
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Tuple

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 2,
            ) -> Tuple[float, float]:
    """Returns (seconds_per_call, calls_per_second)."""
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters
    return dt, 1.0 / dt


def flops_estimate(fn: Callable, *args) -> float:
    """XLA cost-analysis FLOPs of the compiled fn (best effort)."""
    compiled = jax.jit(fn).lower(*args).compile()
    try:
        return float(compiled.cost_analysis()["flops"])
    except (KeyError, TypeError, IndexError):
        return float("nan")


def param_count(params) -> int:
    return sum(int(np.prod(np.asarray(p).shape)) for p in jax.tree.leaves(params))
