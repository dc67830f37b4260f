#!/usr/bin/env python
"""Interleaved untiled-vs-tiled plane fused-step timing at L=1000."""
import functools
import statistics
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from bodge_tpu import CubicLattice, Hamiltonian, jσ2, σ0
from bodge_tpu.ops.blocksparse import BLOCK
from bodge_tpu.ops import pallas_spmm as ps

L = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
ORDER = int(sys.argv[2]) if len(sys.argv) > 2 else 64
ROUNDS = int(sys.argv[3]) if len(sys.argv) > 3 else 8
K = 4

lattice = CubicLattice((L, L, 1))
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
lo = ps.plane_layout(sk, K)
b0 = ps.pack_operator(system.host_data(), sk, K, layout=lo)
b16 = ps.pack_operator(system.host_data(), sk, K, operator_dtype=jnp.bfloat16, layout=lo)
N = lattice.size
v0 = np.zeros((N, BLOCK, K), dtype=system.dtype)
v0[N // 2, np.arange(K) % BLOCK, np.arange(K)] = 1.0
vp = ps.pack_vector(v0, sk, layout=lo)
inv = jnp.asarray(0.37, jnp.float32)
model = (N * sk.n_slots * 16 * 8) + 3 * N * 4 * K * 8
model16 = (N * sk.n_slots * 16 * 4) + 3 * N * 4 * K * 8


def scan3(step, b):
    @functools.partial(jax.jit, static_argnames=("n",))
    def run(b, v, n):
        def body(carry, _):
            t_prev, t_cur = carry
            t_next, _ = step(b, t_cur, t_prev)
            return (t_cur, t_next), None
        (_, out), _ = jax.lax.scan(body, (v, v), None, length=n)
        return out.ravel()[0]
    return lambda n: float(run(b, vp, n))


variants = [
    ("untiled", scan3(lambda b, t, p: ps._plane_cheb_step(b, t, p, inv, sk, K), b0), model),
    ("tiled", scan3(lambda b, t, p: ps._plane_cheb_step_tiled(b, t, p, inv, sk, K), b0), model),
    ("untiled16", scan3(lambda b, t, p: ps._plane_cheb_step(b, t, p, inv, sk, K), b16), model16),
    ("tiled16", scan3(lambda b, t, p: ps._plane_cheb_step_tiled(b, t, p, inv, sk, K), b16), model16),
]

for name, run, _ in variants:
    print(f"compile {name}...", file=sys.stderr)
    run(ORDER); run(2 * ORDER)

samples = {name: [] for name, _, _ in variants}
for r in range(ROUNDS):
    for name, run, _ in variants:
        t0 = time.perf_counter(); run(ORDER); t1 = time.perf_counter()
        run(2 * ORDER); t2 = time.perf_counter()
        samples[name].append(((t2 - t1) - (t1 - t0)) / ORDER)
    print(f"round {r}: " + "  ".join(f"{n}={samples[n][-1]*1e6:7.1f}µs" for n, _, _ in variants),
          file=sys.stderr)

for name, _, m in variants:
    xs = sorted(samples[name])
    mn, md = xs[0], statistics.median(xs)
    print(f"{name:10s} min {mn*1e6:8.1f} µs ({100*m/mn/819e9:5.1f}%)  "
          f"median {md*1e6:8.1f} µs ({100*m/md/819e9:5.1f}%)")
