"""Timing utilities that are correct under remote/async JAX runtimes.

The axon TPU runtime dispatches programs asynchronously and its
``jax.block_until_ready`` does NOT wait for device execution (measured: an
8192^3 bf16 matmul "completes" in 20us = 52 PFLOP/s on a 197 TFLOP/s chip).
The only reliable synchronization point is a *host fetch* of output data.
These helpers time N dispatches followed by a one-element fetch of the last
output — programs execute in dispatch order on the single chip, so the fetch
transitively waits for all N — and subtract the measured fetch round-trip
latency (~30 ms through the tunnel).
"""

from __future__ import annotations

import time
from typing import Callable, Tuple

import jax
import numpy as np


def fetch_sync(tree) -> None:
    """Force real completion of every program that produced ``tree`` by
    fetching one element of one leaf to the host."""
    leaf = jax.tree.leaves(tree)[0]
    arr = leaf
    # index down to a scalar; each indexing op dispatches after the producer
    idx = tuple(0 for _ in range(getattr(arr, "ndim", 0)))
    jax.device_get(arr[idx] if idx else arr)


def measure_fetch_latency(tree, reps: int = 5) -> float:
    """Median round-trip of a scalar fetch on already-computed data."""
    leaf = jax.tree.leaves(tree)[0]
    idx = tuple(0 for _ in range(getattr(leaf, "ndim", 0)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(leaf[idx] if idx else leaf)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def time_loop(run_iter: Callable[[int], object], iters: int
              ) -> Tuple[float, float]:
    """Time ``iters`` dispatches of ``run_iter`` with a single trailing
    fetch-sync; returns (seconds_per_iter, fetch_latency_seconds).

    ``run_iter(i)`` must dispatch the i-th iteration and return its output
    tree (kept on device). The per-iter time excludes the fetch latency.
    """
    out = run_iter(-1)  # warmup iteration (already compiled by caller)
    fetch_sync(out)
    latency = measure_fetch_latency(out)

    t0 = time.perf_counter()
    for i in range(iters):
        out = run_iter(i)
    fetch_sync(out)
    dt = time.perf_counter() - t0
    return max(dt - latency, 1e-9) / iters, latency
