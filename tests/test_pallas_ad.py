"""Differentiability of the single-device fused Pallas KPM path.

The fused kernel carries a custom VJP whose backward is the XLA-derived
VJP of a line-for-line jnp restatement of the packed arithmetic
(:mod:`bodge_tpu.ops.pallas_spmm`).  These tests pin (a) the restatement
against the kernel in interpret mode — it defines the gradients — and
(b) the end-to-end gradients against the independently-differentiable XLA
stencil implementation of the same moments.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bodge_tpu import CubicLattice, Hamiltonian, jσ2, σ0, σ3
from bodge_tpu.ops import chebyshev as kpm
from bodge_tpu.ops import pallas_spmm as pk


def build_system(shape, pbc=False, seed=5):
    lattice = CubicLattice(shape)
    system = Hamiltonian(lattice)
    rng = np.random.default_rng(seed)
    phase = rng.normal(size=(lattice.size, 1, 1))

    def hopping(ci, cj):
        bond = (np.abs(ci - cj).max(axis=1) == 1)[:, None, None]
        if pbc:
            bond = np.ones_like(bond)
        return np.where(bond, -1.0 * σ0, 0)

    system.assemble(
        onsite=lambda ci: -0.6 * σ0 - 0.1 * σ3,
        pairing_onsite=lambda ci: (0.3 + 0.1 * phase) * jσ2,
        hopping=hopping,
    )
    return lattice, system


@pytest.mark.parametrize("pbc", [False, True])
def test_flat_ref_matches_kernel(pbc):
    """The flat-layout jnp restatement must reproduce the fused kernel."""
    lattice, system = build_system((9, 7, 1), pbc=pbc)
    sk = system.skeleton
    K = 4
    lo = pk.plan(sk, K)
    assert lo.mode == "flat"

    rng = np.random.default_rng(1)
    v = (
        rng.normal(size=(lattice.size, 4, K)) + 1j * rng.normal(size=(lattice.size, 4, K))
    ).astype(np.complex64)
    b = pk.pack_operator(system.host_data(), sk, K)
    vp = pk.pack_vector(v, sk)
    tp = jnp.asarray(rng.normal(size=vp.shape).astype(np.float32))
    inv = jnp.float32(0.29)

    tk, ppk = pk.chebyshev_step_pallas(b, vp, tp, inv, sk, K)
    tr, ppr = pk._flat_cheb_step_ref(sk, K, lo, b, vp, tp, inv)
    np.testing.assert_allclose(np.asarray(tk), np.asarray(tr), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ppk), np.asarray(ppr), rtol=1e-5, atol=1e-4)


def test_moments_ad_forward_matches_stencil():
    lattice, system = build_system((10, 6, 1), pbc=True, seed=9)
    sk = system.skeleton
    K, order = 4, 24
    a = float(kpm.spectral_bound(system.host_data(), sk, impl="stencil"))
    N = lattice.size
    v0 = np.zeros((N, 4, K), dtype=system.dtype)
    v0[N // 2, np.arange(K), np.arange(K)] = 1.0

    b = pk.pack_operator(system.host_data(), sk, K)
    vp = pk.pack_vector(v0, sk)
    got = np.asarray(pk.moments_pallas_fused_ad(b, vp, sk, jnp.float32(1 / a), order, K))
    want = np.asarray(kpm.moments(system.host_data(), sk, v0, order, a, impl="stencil"))
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_moments_ad_grad_matches_stencil_grad():
    """d(Σ wₘ μₘ)/d(complex ELL data): the Pallas custom-VJP chain
    (pack → fused steps → moments) must agree with XLA autodiff through
    the independent stencil implementation."""
    lattice, system = build_system((8, 5, 1), pbc=False, seed=13)
    sk = system.skeleton
    K, order = 4, 12
    a = float(kpm.spectral_bound(system.host_data(), sk, impl="stencil"))
    N = lattice.size
    v0 = np.zeros((N, 4, K), dtype=np.complex64)
    v0[N // 2, np.arange(K), np.arange(K)] = 1.0
    w = jnp.asarray(np.linspace(1.0, 0.3, order))

    data64 = jnp.asarray(system.host_data().astype(np.complex64))
    inv = jnp.float32(1.0 / a)

    def loss_pallas(data):
        b = pk.pack_operator(data, sk, K)
        vp = pk.pack_vector(jnp.asarray(v0), sk)
        mu = pk.moments_pallas_fused_ad(b, vp, sk, inv, order, K)
        return jnp.sum(w * jnp.sum(mu, axis=1).astype(w.dtype))

    def loss_stencil(data):
        mu = kpm.moments(data, sk, jnp.asarray(v0), order, a, impl="stencil")
        return jnp.sum(w * jnp.sum(mu, axis=1).astype(w.dtype))

    f_p = float(loss_pallas(data64))
    f_s = float(loss_stencil(data64))
    assert np.isclose(f_p, f_s, rtol=1e-4, atol=1e-3), (f_p, f_s)

    g_p = np.asarray(jax.grad(loss_pallas)(data64))
    g_s = np.asarray(jax.grad(loss_stencil)(data64))
    assert g_p.shape == g_s.shape
    scale = max(1e-8, np.abs(g_s).max())
    np.testing.assert_allclose(g_p / scale, g_s / scale, atol=5e-4)


def test_selfconsistency_pallas_impl():
    """F_total(Δ) and its gradient through impl='pallas' agree with the
    stencil implementation (same probes, same coefficients)."""
    from bodge_tpu.models.selfconsistency import make_total_free_energy
    from bodge_tpu.models.systems import swave_superconductor

    system = swave_superconductor((8, 6, 1), delta=0.0)
    key = jax.random.PRNGKey(3)
    kw = dict(V=1.2, temperature=0.1, method="kpm", order=64, samples=8, key=key)
    F_sten = make_total_free_energy(system, impl="stencil", **kw)
    F_pall = make_total_free_energy(system, impl="pallas", **kw)

    delta = jnp.full((system.skeleton.n_sites,), 0.25, dtype=system.data.dtype)
    v1, g1 = jax.value_and_grad(lambda d: F_sten(d).astype(jnp.float64))(delta)
    v2, g2 = jax.value_and_grad(lambda d: F_pall(d).astype(jnp.float64))(delta)
    assert np.isclose(float(v1), float(v2), rtol=1e-3, atol=1e-2), (v1, v2)
    scale = max(1e-8, float(jnp.abs(g1).max()))
    np.testing.assert_allclose(
        np.asarray(g2) / scale, np.asarray(g1) / scale, atol=2e-3
    )
