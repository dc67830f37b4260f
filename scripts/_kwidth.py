#!/usr/bin/env python
"""Interleaved probe-batch-width (K) A/B at L=1000: measures how the
operator-stream-dominated plane layout converts probe width into roofline
fraction (round-4 campaign, docs/perf_notes.md K-width table)."""
import functools, statistics, sys, time
import numpy as np
import jax, jax.numpy as jnp
from bodge_tpu import CubicLattice, Hamiltonian, jσ2, σ0
from bodge_tpu.ops.blocksparse import BLOCK
from bodge_tpu.ops import pallas_spmm as ps

L, ORDER, ROUNDS = 1000, 64, 6
lattice = CubicLattice((L, L, 1))
system = Hamiltonian(lattice)
system.assemble(onsite=lambda ci: -0.5*σ0, pairing_onsite=lambda ci: 0.4*jσ2,
    hopping=lambda ci,cj: np.where((np.abs(ci-cj).max(axis=1)==1)[:,None,None], -σ0, 0),
    check=False)
sk = system.skeleton
N = lattice.size
inv = jnp.asarray(0.1, jnp.float32)

def variant(K, op_dtype):
    lo = ps.plane_layout(sk, K)
    if lo is None:
        return None
    b = ps.pack_operator(system.host_data(), sk, K, operator_dtype=op_dtype, layout=lo)
    v0 = np.zeros((N, BLOCK, K), dtype=system.dtype)
    v0[N//2, np.arange(K) % BLOCK, np.arange(K)] = 1.0
    vp = ps.pack_vector(v0, sk, layout=lo)
    @functools.partial(jax.jit, static_argnames=("n",))
    def run(b, v, n):
        def body(carry, _):
            tp, tc = carry
            tn, _ = ps.chebyshev_step_pallas(b, tc, tp, inv, sk, K)
            return (tc, tn), None
        (_, out), _ = jax.lax.scan(body, (v, v), None, length=n)
        return out.ravel()[0]
    ob = 2 if op_dtype == jnp.bfloat16 else 4
    model = N*sk.n_slots*16*2*ob + 3*N*4*K*2*4
    return (lambda n: float(run(b, vp, n))), model

variants = []
for name, K, dt in (("f32k4",4,None),("f32k8",8,None),("bf16k8",8,jnp.bfloat16),("f32k16",16,None),("f32k32",32,None)):
    v = variant(K, dt)
    if v: variants.append((name, *v))
    else: print(f"{name}: layout infeasible", file=sys.stderr)

for name, run, _ in variants:
    print(f"compile {name}...", file=sys.stderr, flush=True)
    run(4)
samples = {n: [] for n,_,_ in variants}
for r in range(ROUNDS):
    for name, run, _ in variants:
        t0=time.perf_counter(); run(ORDER); t1=time.perf_counter(); run(4*ORDER); t2=time.perf_counter()
        samples[name].append(((t2-t1)-(t1-t0))/(3*ORDER))
    print(f"round {r}: " + "  ".join(f"{n}={samples[n][-1]*1e6:7.1f}µs" for n,_,_ in variants), file=sys.stderr, flush=True)
for name, _, m in variants:
    xs = sorted(samples[name]); mn, md = xs[0], statistics.median(xs)
    print(f"{name:8s} min {mn*1e6:8.1f} µs ({100*m/mn/819e9:5.1f}%)  median {md*1e6:8.1f} µs ({100*m/md/819e9:5.1f}%)", flush=True)
