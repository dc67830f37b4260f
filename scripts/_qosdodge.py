#!/usr/bin/env python
"""Footprint-QoS dodge experiment at L=1000 (round-3 verdict item 2).

The shared tunnelled chip throttles programs with ≳0.5 GB HBM footprint to
~55% of the throughput that ≲250 MB programs sustain in the same minutes
(docs/perf_notes.md).  This interleaves, in ONE process so every variant
shares the same weather windows:

  base      f32 operator, K=4                     (~1.05 GB footprint)
  bf16      bf16 operator, K=4                    (~0.72 GB)
  bf16k2    bf16 operator, K=2                    (~0.52 GB)
  bf16s2    bf16, K=4, 2 x-slab sub-programs      (~0.36 GB per call)
  bf16s4    bf16, K=4, 4 x-slab sub-programs      (~0.18 GB per call)

The slab variants run each Chebyshev step as nslab independent halo-form
kernel calls (the single-chip form of the sharded ring): per-CALL operand
footprint shrinks by the slab count while total work is identical, probing
whether the QoS discriminator keys on per-program footprint or on total
HBM residency.  Slab boundaries are multiples of 8 so every sub-call keeps
the measured-optimal XB=8 leading block (docs/perf_notes.md).

Each variant reports min/median per-step time and fraction of the 819 GB/s
spec roof against its own honest traffic model.
"""
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
ROUNDS = int(sys.argv[3]) if len(sys.argv) > 3 else 6

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
N = lattice.size
inv = jnp.asarray(0.1, jnp.float32)


def make_probe(K):
    v0 = np.zeros((N, BLOCK, K), dtype=system.dtype)
    v0[N // 2, np.arange(K) % BLOCK, np.arange(K)] = 1.0
    return v0


def scan_variant(K, op_dtype):
    lo = ps.plane_layout(sk, K)
    b = ps.pack_operator(system.host_data(), sk, K, operator_dtype=op_dtype, layout=lo)
    vp = ps.pack_vector(make_probe(K), sk, layout=lo)

    @functools.partial(jax.jit, static_argnames=("n",))
    def run(b, v, n):
        def body(carry, _):
            t_prev, t_cur = carry
            t_next, _ = ps.chebyshev_step_pallas(b, t_cur, t_prev, inv, sk, K)
            return (t_cur, t_next), None

        (_, out), _ = jax.lax.scan(body, (v, v), None, length=n)
        return out.ravel()[0]

    op_bytes = 2 if op_dtype == jnp.bfloat16 else 4
    model = N * sk.n_slots * 16 * 2 * op_bytes + 3 * N * 4 * K * 2 * 4
    return (lambda n: float(run(b, vp, n))), model


def slab_variant(K, op_dtype, nslabs):
    """Per-step: nslab independent halo-kernel calls over x-slab splits
    (8-aligned boundaries).  Host loop with async dispatch; ring halos."""
    lo = ps.plane_layout(sk, K)
    b_full = ps.pack_operator(system.host_data(), sk, K, operator_dtype=op_dtype, layout=lo)
    vp_full = ps.pack_vector(make_probe(K), sk, layout=lo)

    cuts = [8 * round(L * i / nslabs / 8) for i in range(nslabs + 1)]
    cuts[-1] = L
    bounds = list(zip(cuts[:-1], cuts[1:]))
    b_h = [jax.device_put(b_full[a:c]) for a, c in bounds]
    v_h = [jax.device_put(vp_full[a:c]) for a, c in bounds]

    def run(n):
        prev = [jnp.array(v) for v in v_h]
        cur = [jnp.array(v) for v in v_h]
        for _ in range(n):
            new = []
            for i, (a, c) in enumerate(bounds):
                hm = cur[(i - 1) % nslabs][-1:]
                hp = cur[(i + 1) % nslabs][:1]
                t_next, _pp = ps._plane_cheb_step_halo(
                    b_h[i], cur[i], hm, hp, prev[i], inv, sk, K, c - a
                )
                new.append(t_next)
            prev, cur = cur, new
        return float(cur[0].ravel()[0])

    op_bytes = 2 if op_dtype == jnp.bfloat16 else 4
    model = N * sk.n_slots * 16 * 2 * op_bytes + 3 * N * 4 * K * 2 * 4
    return run, model


variants = [
    ("base", *scan_variant(4, None)),
    ("bf16", *scan_variant(4, jnp.bfloat16)),
    ("bf16k2", *scan_variant(2, jnp.bfloat16)),
    ("bf16s2", *slab_variant(4, jnp.bfloat16, 2)),
    ("bf16s4", *slab_variant(4, jnp.bfloat16, 4)),
]

for name, run, _ in variants:
    print(f"compile {name}...", file=sys.stderr, flush=True)
    run(4)

samples = {name: [] for name, _, _ in variants}
for r in range(ROUNDS):
    for name, run, _ in variants:
        t0 = time.perf_counter(); run(ORDER); t1 = time.perf_counter()
        run(4 * ORDER); t2 = time.perf_counter()
        samples[name].append(((t2 - t1) - (t1 - t0)) / (3 * ORDER))
    print(
        f"round {r}: "
        + "  ".join(f"{n}={samples[n][-1]*1e6:7.1f}µs" for n, _, _ in variants),
        file=sys.stderr, flush=True,
    )

for name, _, m in variants:
    xs = sorted(samples[name])
    mn, md = xs[0], statistics.median(xs)
    print(
        f"{name:8s} min {mn*1e6:8.1f} µs ({100*m/mn/819e9:5.1f}%)  "
        f"median {md*1e6:8.1f} µs ({100*m/md/819e9:5.1f}%)",
        flush=True,
    )
