"""Roofline accounting and benchmark timing helpers.

[NEW SCOPE] — the reference's only timing code is a min-over-repeats timer
in its benchmark script; here every hot kernel is additionally measured
against the chip's achievable HBM bandwidth ("speed of light"), since
block-sparse SpMM at 4×4 block size is memory-bound by construction.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial
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


def time_iterated(make_run: Callable[[int], Callable[[], float]], n_lo: int, n_hi: int,
                  repeats: int = 3) -> float:
    """Per-iteration wall-clock via a two-point slope fit.

    ``make_run(n)`` must return a zero-arg callable executing ``n``
    *sequentially dependent* iterations of the kernel and returning a
    Python scalar derived from the result (forcing a device→host fetch).
    Timing the difference between ``n_hi`` and ``n_lo`` iterations cancels
    dispatch/transfer constants — essential on asynchronous/relayed
    backends where ``block_until_ready`` returns before compute finishes.
    """
    run_lo, run_hi = make_run(n_lo), make_run(n_hi)
    run_lo(), run_hi()  # compile both
    t_lo = best_time(run_lo, repeats=repeats, warmup=1)
    t_hi = best_time(run_hi, repeats=repeats, warmup=1)
    return max(t_hi - t_lo, 1e-12) / (n_hi - n_lo)


def measure_hbm_bandwidth(nbytes: int = 1 << 28) -> float:
    """Achievable HBM bandwidth (bytes/s) via an array-*size* slope fit.

    A chained elementwise loop gets fused by XLA into one in-register
    kernel (measuring FLOPs, not bandwidth), and single dispatches through
    an async relay measure launch latency.  Instead we time one
    reduce-to-scalar pass (`sum(x * 1.0000001)`: one full read, negligible
    write) over a small and a large array and fit the slope over bytes —
    per-dispatch constants cancel, and a reduction cannot skip reading any
    element.  The returned figure doubles the read rate to account
    read+write traffic of a copy-like kernel.
    """

    @jax.jit
    def reduce_pass(v):
        return jnp.sum(v * 1.0000001)

    def timer(n):
        x = jnp.full((n,), 1.000001, dtype=jnp.float32)
        r = float(reduce_pass(x))  # compile + warm
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            r = float(reduce_pass(x))
            best = min(best, time.perf_counter() - t0)
        return best

    n_small, n_large = nbytes // 16, nbytes // 4
    t_small, t_large = timer(n_small), timer(n_large)
    read_bps = 4 * (n_large - n_small) / max(t_large - t_small, 1e-9)
    return 2 * read_bps


# Public HBM bandwidth specs (bytes/s) by device kind substring.  Used as
# the roofline reference: measuring bandwidth through an asynchronous
# compile/dispatch relay is unreliable (minute-scale control-plane stalls),
# while the hardware roof is a published constant.
HBM_SPECS = {
    "v5 lite": 819e9,  # TPU v5e
    "v5e": 819e9,
    "v5p": 2765e9,
    "v4": 1228e9,
    "v3": 900e9,
    "v6": 1640e9,  # Trillium
}


def hbm_roof_for_device(device=None) -> float:
    """Spec-sheet HBM bandwidth for the given (default: first) device."""
    import jax

    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "") or str(device)
    for key, bw in HBM_SPECS.items():
        if key in kind.lower():
            return bw
    return 819e9  # conservative default: v5e-class


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
