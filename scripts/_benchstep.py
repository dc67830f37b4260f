import time, timeit
import numpy as np
import jax, jax.numpy as jnp
from functools import partial
from bodge_tpu import CubicLattice, Hamiltonian, jσ2, σ0
from bodge_tpu.ops.blocksparse import BLOCK
from bodge_tpu.ops.pallas_spmm import chebyshev_step_pallas, pack_operator, pack_vector, plan

L, K = 200, 4
lattice = CubicLattice((L, L, 1))
system = Hamiltonian(lattice)
system.assemble(
    onsite=lambda ci: -0.5 * σ0,
    pairing_onsite=lambda ci: 0.4 * jσ2,
    hopping=lambda ci, cj: np.where((np.abs(ci - cj).max(axis=1) == 1)[:, None, None], -σ0, 0),
    check=False,
)
sk = system.skeleton
N = lattice.size
v0 = np.zeros((N, BLOCK, K), dtype=np.complex64)
v0[N//2, np.arange(K) % BLOCK, np.arange(K)] = 1.0
b = pack_operator(system.host_data(), sk, K)
vp = pack_vector(v0, sk)
inv = jnp.float32(0.1)

@partial(jax.jit, static_argnames=("n",))
def scan(b, v, inv, n):
    def step(carry, _):
        tp, tc = carry
        tn, _pp = chebyshev_step_pallas(b, tc, tp, inv, sk, K)
        return (tc, tn), None
    (_, out), _ = jax.lax.scan(step, (v, v), None, length=n)
    return out[0, 0]

t0=time.time(); r = float(scan(b, vp, inv, 64)); print("compile+64:", time.time()-t0, r)
t64 = min(timeit.repeat(lambda: float(scan(b, vp, inv, 64)), number=1, repeat=5))
t256 = min(timeit.repeat(lambda: float(scan(b, vp, inv, 256)), number=1, repeat=5))
step = (t256 - t64) / 192
nnz = sk.nnz_blocks * 16
print(f"per-step: {step*1e6:.1f} us, nnz/s {nnz/step/1e9:.2f} G, vs 35.84MB-model roof {35.84e6/step/819e9:.3f}, vs cheb-model(41MB) {40.96e6/step/819e9:.3f}")
