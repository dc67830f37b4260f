#!/usr/bin/env python
"""Flat vs forced-plane fused-step timing on the same (L, K) config."""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from bodge_tpu import CubicLattice, Hamiltonian, jσ2, σ0
from bodge_tpu.ops.blocksparse import BLOCK
from bodge_tpu.ops import pallas_spmm as ps

L = int(sys.argv[1]) if len(sys.argv) > 1 else 200
ORDER = int(sys.argv[2]) if len(sys.argv) > 2 else 256
W = int(sys.argv[3]) if len(sys.argv) > 3 else L
K = 4
assert jax.default_backend() == "tpu"

# Bypass the measured plane-preference policy for the whole process: this
# harness exists precisely to compare flat vs plane on the same config
# (the flat kernels consult plan() internally at trace time too).
ps.PLANE_PREFERRED_MIN_SITES = 10**12

lattice = CubicLattice((L, W, 1))
system = Hamiltonian(lattice)
system.assemble(
    onsite=lambda ci: -0.5 * σ0,
    pairing_onsite=lambda ci: 0.4 * jσ2,
    hopping=lambda ci, cj: np.where(
        (np.abs(ci - cj).max(axis=1) == 1)[:, None, None], -1.0 * σ0, 0
    ),
    check=False,
)
sk = system.skeleton
data = system.host_data()
N = lattice.size
v0 = np.zeros((N, BLOCK, K), dtype=system.dtype)
v0[N // 2, np.arange(K) % BLOCK, np.arange(K)] = 1.0
inv = jnp.asarray(0.37, jnp.float32)

model_bytes = (N * sk.n_slots * 16 * 8) + 3 * N * 4 * K * 8
BW = 819e9


def scan3(step, b, vp):
    @functools.partial(jax.jit, static_argnames=("n",))
    def run(b, v, n):
        def body(carry, _):
            t_prev, t_cur = carry
            t_next, _pp = step(b, t_cur, t_prev)
            return (t_cur, t_next), None
        (_, out), _ = jax.lax.scan(body, (v, v), None, length=n)
        return out.ravel()[0]
    return lambda n: float(run(b, vp, n))


def slope(runner, n1, n2, reps=4):
    best = float("inf")
    runner(n1); runner(n2)
    for _ in range(reps):
        t0 = time.perf_counter(); runner(n1); t1 = time.perf_counter()
        runner(n2); t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (n2 - n1))
    return best


for mode in ("flat", "planes"):
    if mode == "planes":
        lo = ps.plane_layout(sk, K)
        if lo is None:
            continue
        b = ps.pack_operator(data, sk, K, layout=lo)
        vp = ps.pack_vector(v0, sk, layout=lo)
        step = lambda b, t, p: ps._plane_cheb_step(b, t, p, inv, sk, K)
    else:
        lo = ps.plan(sk, K)
        if lo is None or lo.mode != "flat":
            print(f"{mode}: not available (flat layout does not fit)", file=sys.stderr)
            continue
        b = ps.pack_operator(data, sk, K, layout=lo)
        vp = ps.pack_vector(v0, sk, layout=lo)
        step = lambda b, t, p: ps._flat_cheb_step(b, t, p, inv, sk, K)
    t = slope(scan3(step, b, vp), ORDER, 4 * ORDER)
    print(f"{mode:7s} {t*1e6:8.1f} µs/step  model {model_bytes/t/1e9:6.1f} GB/s "
          f"({100*model_bytes/t/BW:5.1f}% roof)")
