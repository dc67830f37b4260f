"""Gather-form Pallas kernel tests (interpret mode on CPU): the
RCM-banded one-hot-MXU gather must reproduce the XLA gather SpMM and the
dense Chebyshev recursion for generic (non-stencil) skeletons — the
FrozenLattice path that previously only had the ~175× planar cliff on
TPU (round-3 verdict item 6 stretch goal)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bodge_tpu import Hamiltonian
from bodge_tpu.ops import chebyshev as kpm
from bodge_tpu.ops import pallas_gather as pg
from bodge_tpu.ops.spmm import spmm
from tests.test_generic_lattice import build_ring


def build_generic_2d(L=12, W=9, delta=0.35, mu=0.6, t=1.0):
    """A 2D lattice routed through the GENERIC (FrozenLattice-style)
    skeleton constructor — non-stencil ELL with RCM bandwidth ~ W."""
    from bodge_tpu import CubicLattice
    from bodge_tpu.ops.blocksparse import skeleton_from_lattice

    lattice = CubicLattice((L, W, 1))
    sk_gen = skeleton_from_lattice(lattice)
    assert not sk_gen.stencil

    # Assemble through the normal facade, then re-express the block data
    # on the generic skeleton via the dense matrix (small system).
    from bodge_tpu.common import jσ2, σ0
    from bodge_tpu.ops.blocksparse import dense_to_ell

    system = Hamiltonian(lattice)
    system.assemble(
        onsite=lambda ci: -mu * σ0,
        pairing_onsite=lambda ci: delta * jσ2,
        hopping=lambda ci, cj: np.where(
            (np.abs(ci - cj).max(axis=1) == 1)[:, None, None], -t * σ0, 0
        ),
    )
    data_gen = dense_to_ell(system.matrix("dense"), sk_gen)
    return sk_gen, data_gen


def test_plan_gather_shapes():
    lattice, ring = build_ring(300)
    gl = pg.plan_gather(ring.skeleton, 4)
    assert gl is not None
    assert gl.bwb <= 4  # a ring RCM-bands to a near-tridiagonal
    assert gl.W == 1 + 2 * gl.h
    # plan is cached: same identity for stable jit keys
    assert pg.plan_gather(ring.skeleton, 4) is gl


@pytest.mark.parametrize("n", [30, 300])
def test_gather_kernel_matches_xla_gather_ring(n):
    lattice, system = build_ring(n)
    sk = system.skeleton
    N = sk.n_sites
    rng = np.random.default_rng(1)
    v = (
        rng.normal(size=(N, 4, 4)) + 1j * rng.normal(size=(N, 4, 4))
    ).astype(np.complex64)

    want = np.asarray(spmm(jnp.asarray(system.host_data()), sk, jnp.asarray(v), impl="gather"))
    got = np.asarray(pg.spmm_gather_pallas(system.host_data(), sk, v))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_gather_kernel_matches_xla_gather_2d():
    """2D generic skeleton: RCM bandwidth ≈ 9 sites (single-tile window
    here; widths > 128 exercise W > 1 — covered by the wide test)."""
    sk, data = build_generic_2d()
    N = sk.n_sites
    rng = np.random.default_rng(3)
    v = (
        rng.normal(size=(N, 4, 2)) + 1j * rng.normal(size=(N, 4, 2))
    ).astype(np.complex64)
    want = np.asarray(spmm(jnp.asarray(data), sk, jnp.asarray(v), impl="gather"))
    got = np.asarray(pg.spmm_gather_pallas(data, sk, v))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_gather_kernel_multi_tile_window():
    """A generic 2D lattice wide enough that the RCM band spans more than
    one 128-lane tile (W = 3 window): the shifted-window index maps and
    zero halo tiles must be exact."""
    sk, data = build_generic_2d(L=10, W=40)
    gl = pg.plan_gather(sk, 2)
    assert gl.h >= 1, gl.bwb  # the point of this test
    N = sk.n_sites
    rng = np.random.default_rng(5)
    v = (
        rng.normal(size=(N, 4, 2)) + 1j * rng.normal(size=(N, 4, 2))
    ).astype(np.complex64)
    want = np.asarray(spmm(jnp.asarray(data), sk, jnp.asarray(v), impl="gather"))
    got = np.asarray(pg.spmm_gather_pallas(data, sk, v))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_gather_moments_match_dense():
    lattice, system = build_ring(40)
    sk = system.skeleton
    N = sk.n_sites
    a = float(kpm.spectral_bound(system.host_data(), sk, impl="gather"))
    order = 24

    site = 7
    v0 = np.zeros((N, 4, 4), dtype=np.complex64)
    v0[site] = np.eye(4)

    mu = np.asarray(
        kpm.moments(system.host_data(), sk, v0, order, a, impl="pallas_gather")
    )

    from bodge_tpu.ops.blocksparse import ell_to_dense

    H = ell_to_dense(system.host_data().astype(np.complex128), sk) / a
    V0 = v0.reshape(4 * N, 4).astype(np.complex128)
    t_prev, t_cur = V0.copy(), H @ V0
    mu_ref = [np.real(np.sum(np.conj(V0) * t_prev, axis=0)),
              np.real(np.sum(np.conj(V0) * t_cur, axis=0))]
    for _ in range(order - 2):
        t_prev, t_cur = t_cur, 2 * (H @ t_cur) - t_prev
        mu_ref.append(np.real(np.sum(np.conj(V0) * t_cur, axis=0)))
    np.testing.assert_allclose(mu, np.array(mu_ref), atol=2e-4)


def test_gather_moments_chunks_wide_probe_batches():
    """K wider than the feasible plan chunks over one packed operator."""
    lattice, system = build_ring(60)
    sk = system.skeleton
    N = sk.n_sites
    a = float(kpm.spectral_bound(system.host_data(), sk, impl="gather"))

    K = 7  # not a plan width; exercises the pad/chunk path
    rng = np.random.default_rng(11)
    v0 = (rng.normal(size=(N, 4, K))).astype(system.dtype)
    mu_g = np.asarray(
        kpm.moments(system.host_data(), sk, v0, 16, a, impl="pallas_gather")
    )
    mu_ref = np.asarray(
        kpm.moments(system.host_data(), sk, v0, 16, a, impl="gather")
    )
    np.testing.assert_allclose(mu_g, mu_ref, atol=2e-4)


def test_auto_upgrade_picks_gather_for_generic(monkeypatch):
    """With the TPU dispatch forced, auto impl selection on a generic
    skeleton must land on the gather kernel (not the planar cliff) and
    must NOT warn."""
    import warnings

    monkeypatch.setenv("BODGE_PALLAS_UPGRADE", "1")
    lattice, system = build_ring(24)
    sk = system.skeleton
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = kpm._upgrade_to_pallas("planar", system.data, 4, sk)
    assert out == "pallas_gather"
    assert not [w for w in caught if w.category is RuntimeWarning]


def test_gather_ldos_via_facade():
    """End-to-end: KPM LDOS on a generic lattice through the gather kernel
    equals the identical pipeline on the XLA gather SpMM (the kernel is
    the only moving part; resolvent-vs-dense parity is covered by
    tests/test_chebyshev.py)."""
    lattice, system = build_ring(24)
    energies = np.linspace(-2.5, 2.5, 11)
    η = 0.35
    i0 = 5

    ρ_g = kpm.ldos_kpm(
        system.host_data(), system.skeleton, i0, energies, eta=η,
        impl="pallas_gather",
    )
    ρ_x = kpm.ldos_kpm(
        system.host_data(), system.skeleton, i0, energies, eta=η,
        impl="gather",
    )
    np.testing.assert_allclose(ρ_g, ρ_x, atol=2e-4, rtol=2e-4)


def test_gather_ref_matches_kernel():
    """The jnp restatement (the VJP reference) reproduces the kernel."""
    sk, data = build_generic_2d(L=10, W=40)  # multi-tile window (W=3)
    gl = pg.plan_gather(sk, 2)
    N = sk.n_sites
    rng = np.random.default_rng(17)
    v = (
        rng.normal(size=(N, 4, 2)) + 1j * rng.normal(size=(N, 4, 2))
    ).astype(np.complex64)
    b = pg.pack_gather_operator(data, sk, gl)
    off = pg.pack_gather_offsets(sk, gl)
    vp = pg.pack_gather_vector(v, sk, gl)
    y_kernel = np.asarray(pg.spmm_gather_packed(b, off, vp, sk, gl, 2))
    y_ref = np.asarray(pg._gather_spmm_ref(sk, gl, 2, b, off, vp))
    np.testing.assert_allclose(y_kernel, y_ref, atol=2e-5)


def test_gather_value_and_grad():
    """Reverse mode through the gather moment sweep: gradient w.r.t. the
    packed operator AND the probe vector vs central finite differences."""
    lattice, system = build_ring(40)
    sk = system.skeleton
    N = sk.n_sites
    a = float(kpm.spectral_bound(system.host_data(), sk, impl="gather"))
    gl = pg.plan_gather(sk, 4)

    b = pg.pack_gather_operator(system.host_data(), sk, gl)
    off = pg.pack_gather_offsets(sk, gl)
    v0 = np.zeros((N, 4, 4), dtype=np.complex64)
    v0[7] = np.eye(4)
    vp = pg.pack_gather_vector(v0, sk, gl)

    order = 10
    w = jnp.asarray(np.linspace(1.0, 0.3, order), jnp.float32)

    def loss(bb, vv):
        mu = pg.moments_gather_packed(bb, off, vv, sk, gl, jnp.float32(1 / a), order, 4)
        return jnp.sum(w[:, None] * mu)

    F, (gb, gv) = jax.value_and_grad(loss, argnums=(0, 1))(b, vp)
    assert np.isfinite(float(F))
    for g, x, which in ((gb, b, 0), (gv, vp, 1)):
        g = np.asarray(g)
        assert np.isfinite(g).all() and np.abs(g).max() > 0
        rng = np.random.default_rng(23 + which)
        u = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
        h = 1e-3
        args = lambda xx: (xx, vp) if which == 0 else (b, xx)
        fd = (float(loss(*args(x + h * u))) - float(loss(*args(x - h * u)))) / (2 * h)
        an = float(jnp.sum(jnp.asarray(g) * u))
        assert np.isclose(an, fd, rtol=2e-2, atol=1e-3), (which, an, fd)
