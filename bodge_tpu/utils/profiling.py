"""Roofline accounting and benchmark timing helpers.

[NEW SCOPE] — the reference's only timing code is a min-over-repeats timer
in its benchmark script; here every hot kernel is additionally measured
against the chip's achievable HBM bandwidth ("speed of light"), since
block-sparse SpMM at 4×4 block size is memory-bound by construction.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp


def best_time(fn: Callable[[], None], repeats: int = 5, warmup: int = 2) -> float:
    """Minimum wall-clock over repeats (the reference's methodology)."""
    for _ in range(warmup):
        fn()
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def measure_hbm_bandwidth(nbytes: int = 1 << 28, repeats: int = 5) -> float:
    """Achievable HBM bandwidth (bytes/s) from a jitted copy (read+write).

    A unary elementwise op moves each element HBM→chip→HBM once; the
    returned figure counts both directions, matching how kernel traffic is
    accounted in :func:`roofline`.
    """
    n = nbytes // 4
    x = jnp.zeros((n,), dtype=jnp.float32)

    @jax.jit
    def bump(v):
        return v + 1.0

    x = bump(x)  # compile + materialize
    x.block_until_ready()
    t = best_time(lambda: bump(x).block_until_ready(), repeats=repeats)
    return 2 * n * 4 / t


@dataclass
class Roofline:
    """Memory-roofline verdict for one measured kernel."""

    time_s: float
    bytes_moved: int
    flops: int
    hbm_bw: float

    @property
    def achieved_bw(self) -> float:
        return self.bytes_moved / self.time_s

    @property
    def fraction_of_roof(self) -> float:
        return self.achieved_bw / self.hbm_bw

    @property
    def roof_time_s(self) -> float:
        return self.bytes_moved / self.hbm_bw

    def summary(self) -> str:
        return (
            f"{self.time_s*1e6:.1f} µs ({self.achieved_bw/1e9:.1f} GB/s, "
            f"{100*self.fraction_of_roof:.1f}% of {self.hbm_bw/1e9:.0f} GB/s roof)"
        )
