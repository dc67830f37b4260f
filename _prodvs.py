#!/usr/bin/env python
"""Production _plane_cheb_step vs sweep make_cheb(8) back-to-back at L=1000."""
import functools, sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from bodge_tpu import CubicLattice, Hamiltonian, jσ2, σ0
from bodge_tpu.ops.blocksparse import BLOCK
from bodge_tpu.ops import pallas_spmm as ps

L, K, ORDER = 1000, 4, 64
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
print("XB production:", ps._pick_xb(L, sk.n_slots, K, lo.P), file=sys.stderr)
b = ps.pack_operator(system.host_data(), sk, K, layout=lo)
N = lattice.size
v0 = np.zeros((N, BLOCK, K), dtype=system.dtype)
v0[N // 2, np.arange(K) % BLOCK, np.arange(K)] = 1.0
vp = ps.pack_vector(v0, sk, layout=lo)
inv = jnp.asarray(0.37, jnp.float32)
S, P, Rv = sk.n_slots, lo.P, 2 * BLOCK * K
model = (N * S * 16 * 8) + 3 * N * 4 * K * 8

def scan3(step):
    @functools.partial(jax.jit, static_argnames=("n",))
    def run(b, v, n):
        def body(carry, _):
            t_prev, t_cur = carry
            t_next, _ = step(b, t_cur, t_prev)
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

# sweep-style kernel at XB=8 (no cost estimate)
XB = 8
rows = ps._pp_rows(K)
def specs():
    b_spec = pl.BlockSpec((XB, 2*S*16, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    vm = pl.BlockSpec((1, Rv, P), lambda i: ((XB*i-1) % L, 0, 0), memory_space=pltpu.VMEM)
    vc = pl.BlockSpec((XB, Rv, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    vps = pl.BlockSpec((1, Rv, P), lambda i: ((XB*i+XB) % L, 0, 0), memory_space=pltpu.VMEM)
    tp = pl.BlockSpec((XB, Rv, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    iv = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    y = pl.BlockSpec((XB, Rv, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    pp = pl.BlockSpec((XB, rows, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return b_spec, vm, vc, vps, tp, iv, y, pp

def kernel(b_ref, vm_ref, vc_ref, vp_ref, tp_ref, inv_ref, y_ref, pp_ref):
    vc = vc_ref[...]
    hv = ps._plane_stencil_body(sk, K, P, XB, ps._bload_from_ref(b_ref, sk), vm_ref[...], vc, vp_ref[...])
    ps._cheb_tail(sk, K, P, XB, hv, vc, tp_ref[...], inv_ref[0, 0], y_ref, pp_ref)

b_spec, vm, vc, vps_, tp_, iv, y_, pp_ = specs()
CP = pltpu.CompilerParams(vmem_limit_bytes=ps.VMEM_LIMIT)
def sweep_step(b, t, p):
    return pl.pallas_call(
        kernel, grid=(L // XB,),
        in_specs=[b_spec, vm, vc, vps_, tp_, iv],
        out_specs=(y_, pp_),
        out_shape=(jax.ShapeDtypeStruct(t.shape, jnp.float32),
                   jax.ShapeDtypeStruct((L, rows, P), jnp.float32)),
        compiler_params=CP,
    )(b, t, t, t, p, jnp.asarray(inv, jnp.float32).reshape(1, 1))

for name, step in (
    ("sweep8", sweep_step),
    ("prod", lambda b, t, p: ps._plane_cheb_step(b, t, p, inv, sk, K)),
):
    t = slope(scan3(step), ORDER, 2 * ORDER)
    print(f"{name:7s} {t*1e6:8.1f} µs/step  model {model/t/1e9:6.1f} GB/s ({100*model/t/819e9:5.1f}%)")
