"""Planar (split-complex f32) device path vs the complex reference path.

The planar representation must reproduce every observable of the complex
path to f32 accuracy — it is the representation actually used on TPU,
where complex lowerings are unavailable.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from bodge_tpu import CubicLattice, Hamiltonian, jσ2, σ0, σ3
from bodge_tpu.ops import chebyshev as kpm
from bodge_tpu.ops import planar as pl
from bodge_tpu.ops.blocksparse import BLOCK
from bodge_tpu.ops.spmm import spmm


def _system(shape=(10, 8, 1), dtype=np.complex64):
    lattice = CubicLattice(shape)
    system = Hamiltonian(lattice, dtype=dtype)
    L = shape[0]
    system.assemble(
        onsite=lambda ci: -0.5 * σ0 + 0.3 * σ3 * (ci[:, 0] < L // 2)[:, None, None],
        pairing_onsite=lambda ci: (0.4 + 0.1j) * jσ2,
        hopping=lambda ci, cj: np.where(
            (np.abs(ci - cj).max(axis=1) == 1)[:, None, None], -1.0 * σ0, 0
        ),
    )
    return lattice, system


def test_roundtrip():
    _, system = _system()
    dp = pl.to_planar(system.host_data())
    assert dp.shape[0] == 2 and dp.dtype == jnp.float32
    back = pl.from_planar(dp, np.complex64)
    np.testing.assert_allclose(back, system.host_data(), atol=1e-7)


@pytest.mark.parametrize("shape", [(10, 8, 1), (6, 5, 4), (16, 1, 1)])
def test_spmm_planar_matches_complex(shape):
    lattice, system = _system(shape)
    N = lattice.size
    rng = np.random.default_rng(0)
    v = (rng.normal(size=(N, BLOCK, 3)) + 1j * rng.normal(size=(N, BLOCK, 3))).astype(
        np.complex64
    )
    want = np.asarray(spmm(jnp.asarray(system.host_data()), system.skeleton, jnp.asarray(v)))
    got = pl.from_planar(
        pl.spmm_planar(pl.to_planar(system.host_data()), system.skeleton, pl.to_planar(v))
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_spmm_planar_gather_matches_dense():
    """Generic-skeleton planar SpMM against the dense product."""
    from bodge_tpu.ops import blocksparse as bs

    n = 10
    rows = np.concatenate([np.arange(n), np.arange(n), np.arange(n)])
    cols = np.concatenate([np.arange(n), (np.arange(n) + 1) % n, (np.arange(n) - 1) % n])
    sk = bs.skeleton_from_pairs(n, rows, cols)
    rng = np.random.default_rng(1)
    data = np.zeros((n, sk.n_slots, 4, 4), np.complex64)
    blk = rng.normal(size=(n, sk.n_slots, 4, 4)) + 1j * rng.normal(size=(n, sk.n_slots, 4, 4))
    data[sk.valid] = blk[sk.valid]
    # Hermitize
    H = bs.ell_to_dense(data.astype(np.complex128), sk)
    H = (H + H.conj().T) / 2
    data = bs.dense_to_ell(H, sk).astype(np.complex64)

    v = (rng.normal(size=(n, 4, 2)) + 1j * rng.normal(size=(n, 4, 2))).astype(np.complex64)
    want = (H @ v.reshape(4 * n, 2)).reshape(n, 4, 2)
    got = pl.from_planar(pl.spmm_planar(pl.to_planar(data), sk, pl.to_planar(v)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_moments_planar_matches_complex():
    lattice, system = _system()
    sk = system.skeleton
    N = lattice.size
    a = kpm.spectral_bound(system.host_data(), sk, impl="stencil")

    v0 = np.zeros((N, BLOCK, BLOCK), np.complex64)
    v0[N // 2, np.arange(BLOCK), np.arange(BLOCK)] = 1.0

    mu_c = np.asarray(kpm.moments(system.host_data(), sk, v0, 64, a, impl="stencil"))
    mu_p = np.asarray(kpm.moments(system.host_data(), sk, v0, 64, a, impl="planar"))
    np.testing.assert_allclose(mu_p, mu_c, atol=2e-4)


def test_spectral_bound_planar_close():
    _, system = _system()
    sk = system.skeleton
    a_c = kpm.spectral_bound(system.host_data(), sk, impl="stencil")
    a_p = kpm.spectral_bound(system.host_data(), sk, impl="planar")
    assert abs(a_c - a_p) / a_c < 0.05


def test_trace_fn_planar_matches_complex():
    _, system = _system()
    sk = system.skeleton
    a = kpm.spectral_bound(system.host_data(), sk, impl="stencil")
    g = lambda E: -np.abs(E) / 2
    t_c = kpm.trace_function(system.host_data(), sk, g, 64, a, impl="stencil")
    t_p = kpm.trace_function(system.host_data(), sk, g, 64, a, impl="planar")
    assert abs(t_c - t_p) < 5e-3 * max(1.0, abs(t_c))


def test_eigvalsh_planar_matches_numpy():
    lattice, system = _system()
    from bodge_tpu.ops import blocksparse as bs

    H = bs.ell_to_dense(system.host_data().astype(np.complex128), system.skeleton)
    want = np.linalg.eigvalsh(H)
    got = pl.eigvalsh_planar(pl.to_planar(system.host_data()), system.skeleton)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_eigh_planar_eigenvectors_are_eigenvectors():
    """Reconstructed complex vectors satisfy H x = λ x, including within the
    doubly-degenerate (spin) multiplets typical of BdG spectra."""
    lattice, system = _system((6, 6, 1))
    from bodge_tpu.ops import blocksparse as bs

    H = bs.ell_to_dense(system.host_data().astype(np.complex128), system.skeleton)
    E, X = pl.eigh_planar(pl.to_planar(system.host_data()), system.skeleton)
    resid = np.linalg.norm(H @ X - X * E[None, :], axis=0)
    assert np.max(resid) < 5e-3
    # Orthonormality
    G = X.conj().T @ X
    np.testing.assert_allclose(G, np.eye(len(E)), atol=5e-3)


def test_hermiticity_planar():
    _, system = _system()
    sk = system.skeleton
    dp = np.array(pl.to_planar(system.host_data()), copy=True)
    assert float(pl.hermiticity_error_planar(jnp.asarray(dp), sk)) < 1e-6
    dp[0, 3, 0, 0, 1] += 0.5
    assert float(pl.hermiticity_error_planar(jnp.asarray(dp), sk)) > 0.2


def test_assemble_kernel_planar_matches_complex():
    from bodge_tpu.hamiltonian import _assemble_kernel
    from bodge_tpu.ops.blocksparse import skeleton as make_sk
    from bodge_tpu.ops.planar import _assemble_kernel_planar

    sk = make_sk((6, 5, 1))
    N, S = sk.cols.shape
    rng = np.random.default_rng(2)
    onsite = (rng.normal(size=(N, 2, 2)) + 1j * rng.normal(size=(N, 2, 2))).astype(np.complex64)
    onsite = onsite + np.conj(np.swapaxes(onsite, -1, -2))  # Hermitian on-site
    pair_on = (rng.normal(size=(N, 2, 2)) + 1j * rng.normal(size=(N, 2, 2))).astype(np.complex64)
    hop = (rng.normal(size=(S - 1, N, 2, 2)) + 1j * rng.normal(size=(S - 1, N, 2, 2))).astype(np.complex64)
    pair = (rng.normal(size=(S - 1, N, 2, 2)) + 1j * rng.normal(size=(S - 1, N, 2, 2))).astype(np.complex64)
    pair_rev = (rng.normal(size=(S - 1, N, 2, 2)) + 1j * rng.normal(size=(S - 1, N, 2, 2))).astype(np.complex64)

    data_c = np.zeros((N, S, 4, 4), np.complex64)
    want = _assemble_kernel(sk, True, True, True, True, False)(
        jnp.asarray(data_c), jnp.asarray(onsite), jnp.asarray(pair_on),
        jnp.asarray(hop), jnp.asarray(pair), jnp.asarray(pair_rev),
    )
    got = _assemble_kernel_planar(sk, True, True, True, True, False)(
        pl.to_planar(data_c), pl.to_planar(onsite), pl.to_planar(pair_on),
        pl.to_planar(hop), pl.to_planar(pair), pl.to_planar(pair_rev),
    )
    np.testing.assert_allclose(pl.from_planar(got), np.asarray(want), atol=1e-5)
