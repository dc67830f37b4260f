#!/usr/bin/env python
"""Interleaved A/B timing of plane-kernel variants at L=1000 (contention-
proof: every round times all variants back-to-back, so window effects hit
all variants equally; report per-variant min and median)."""
import functools
import statistics
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bodge_tpu import CubicLattice, Hamiltonian, jσ2, σ0
from bodge_tpu.ops.blocksparse import BLOCK
from bodge_tpu.ops import pallas_spmm as ps

L = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
ORDER = int(sys.argv[2]) if len(sys.argv) > 2 else 64
ROUNDS = int(sys.argv[3]) if len(sys.argv) > 3 else 6
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
S, P, Rv = sk.n_slots, lo.P, 2 * BLOCK * K
b0 = ps.pack_operator(system.host_data(), sk, K, layout=lo)
N = lattice.size
v0 = np.zeros((N, BLOCK, K), dtype=system.dtype)
v0[N // 2, np.arange(K) % BLOCK, np.arange(K)] = 1.0
vp = ps.pack_vector(v0, sk, layout=lo)
inv = jnp.asarray(0.37, jnp.float32)
rows = ps._pp_rows(K)
model = (N * S * 16 * 8) + 3 * N * 4 * K * 8
CP = pltpu.CompilerParams(vmem_limit_bytes=ps.VMEM_LIMIT)


def make_kernel(XB, stream=False):
    b_spec = pl.BlockSpec((XB, 2 * S * 16, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    vm = pl.BlockSpec((1, Rv, P), lambda i: ((XB * i - 1) % L, 0, 0), memory_space=pltpu.VMEM)
    vc = pl.BlockSpec((XB, Rv, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    vpp = pl.BlockSpec((1, Rv, P), lambda i: ((XB * i + XB) % L, 0, 0), memory_space=pltpu.VMEM)
    tp = pl.BlockSpec((XB, Rv, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    iv = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    y = pl.BlockSpec((XB, Rv, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    pps = pl.BlockSpec((XB, rows, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    if stream:
        def kern(b_ref, vm_ref, vc_ref, vp_ref, tp_ref, inv_ref, y_ref, pp_ref):
            s = b_ref[0, 0, 0] + vm_ref[0, 0, 0] + vp_ref[0, 0, 0] + tp_ref[0, 0, 0] + inv_ref[0, 0]
            y_ref[...] = vc_ref[...] + s
            pp_ref[...] = jnp.zeros(pp_ref.shape, jnp.float32)
    else:
        def kern(b_ref, vm_ref, vc_ref, vp_ref, tp_ref, inv_ref, y_ref, pp_ref):
            vcv = vc_ref[...]
            hv = ps._plane_stencil_body(
                sk, K, P, XB, ps._bload_from_ref(b_ref, sk), vm_ref[...], vcv, vp_ref[...]
            )
            ps._cheb_tail(sk, K, P, XB, hv, vcv, tp_ref[...], inv_ref[0, 0], y_ref, pp_ref)

    def step(b, t, p):
        return pl.pallas_call(
            kern, grid=(L // XB,),
            in_specs=[b_spec, vm, vc, vpp, tp, iv],
            out_specs=(y, pps),
            out_shape=(
                jax.ShapeDtypeStruct(t.shape, jnp.float32),
                jax.ShapeDtypeStruct((L, rows, P), jnp.float32),
            ),
            compiler_params=CP,
        )(b, t, t, t, p, jnp.asarray(inv, jnp.float32).reshape(1, 1))

    @functools.partial(jax.jit, static_argnames=("n",))
    def run(b, v, n):
        def body(carry, _):
            t_prev, t_cur = carry
            t_next, _ = step(b, t_cur, t_prev)
            return (t_cur, t_next), None
        (_, out), _ = jax.lax.scan(body, (v, v), None, length=n)
        return out.ravel()[0]

    return run


variants = [
    ("cheb_xb8", make_kernel(8)),
    ("cheb_xb4", make_kernel(4)),
    ("stream8", make_kernel(8, stream=True)),
]

# Compile everything first (cached across retries).
for name, run in variants:
    print(f"compile {name}...", file=sys.stderr)
    float(run(b0, vp, ORDER)); float(run(b0, vp, 2 * ORDER))

samples = {name: [] for name, _ in variants}
for r in range(ROUNDS):
    for name, run in variants:
        t0 = time.perf_counter(); float(run(b0, vp, ORDER)); t1 = time.perf_counter()
        float(run(b0, vp, 2 * ORDER)); t2 = time.perf_counter()
        dt = ((t2 - t1) - (t1 - t0)) / ORDER
        samples[name].append(dt)
    print(f"round {r}: " + "  ".join(f"{n}={samples[n][-1]*1e6:7.1f}µs" for n, _ in variants),
          file=sys.stderr)

for name, _ in variants:
    xs = sorted(samples[name])
    mn, md = xs[0], statistics.median(xs)
    print(f"{name:9s} min {mn*1e6:8.1f} µs ({100*model/mn/819e9:5.1f}%)  "
          f"median {md*1e6:8.1f} µs ({100*model/md/819e9:5.1f}%)")
