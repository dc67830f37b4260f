"""Banded eigensolver: must reproduce the dense spectrum exactly.

The banded path (bodge_tpu/ops/banded.py) is an exact algorithm — LAPACK
``?hbevd`` on the RCM-relabeled band — so it is held to tight tolerances
against ``np.linalg.eigvalsh`` of the densified matrix, across open and
periodic boundaries, 1D/2D/3D shapes, and order-parameter content.
"""

import numpy as np
import pytest

from bodge_tpu import CubicLattice, Hamiltonian, dwave, jσ2, pwave, σ0, σ2, σ3
from bodge_tpu.ops import banded


def random_system(shape, seed=0, pbc=False):
    lattice = CubicLattice(shape)
    system = Hamiltonian(lattice)
    rng = np.random.default_rng(seed)

    def herm2():
        c = rng.normal(size=4)
        return c[0] * σ0 + c[1] * np.array([[0, 1], [1, 0]]) + c[2] * σ2 + c[3] * σ3

    with system as (H, Δ):
        for i in lattice.sites():
            H[i, i] = herm2()
            Δ[i, i] = rng.normal() * jσ2
        for i, j in lattice.bonds():
            v = herm2()
            H[i, j] = v
            H[j, i] = v
            Δ[i, j] = rng.normal() * jσ2
        if pbc:
            for i, j in lattice.edges():
                v = herm2()
                H[i, j] = v
                H[j, i] = v
    return lattice, system


@pytest.mark.parametrize("shape", [(6, 5, 1), (4, 4, 3), (8, 1, 1), (2, 3, 1)])
@pytest.mark.parametrize("pbc", [False, True])
def test_eigvalsh_banded_matches_dense(shape, pbc):
    _, system = random_system(shape, seed=hash(shape) % 2**31, pbc=pbc)
    H = system.matrix("dense")
    E_ref = np.linalg.eigvalsh(H)
    E = banded.eigvalsh_banded(np.asarray(system._data), system._sk)
    np.testing.assert_allclose(E, E_ref, atol=1e-10, rtol=1e-10)


@pytest.mark.parametrize("reorder", [False, True])
def test_eigh_banded_vectors_diagonalize(reorder):
    _, system = random_system((5, 4, 1), seed=11)
    H = system.matrix("dense")
    E, X = banded.eigh_banded(np.asarray(system._data), system._sk, reorder=reorder)
    E_ref = np.linalg.eigvalsh(H)
    np.testing.assert_allclose(E, E_ref, atol=1e-10)
    # Each returned column must be an actual eigenvector of the ORIGINAL
    # (un-permuted) matrix: H x = E x.
    resid = H @ X - X * E[None, :]
    assert np.abs(resid).max() < 1e-9


def test_bandwidth_ignores_structural_zero_wrap_blocks():
    # Open boundaries: the skeleton still *stores* wrap slots, but they are
    # zero blocks and must not count toward the bandwidth.
    _, system = random_system((16, 1, 1), seed=3, pbc=False)
    bw_open = banded.scalar_bandwidth(np.asarray(system._data), system._sk, reorder=False)
    assert bw_open == 4 * 1 + 3  # nearest-neighbor chain: block bandwidth 1
    _, system_pbc = random_system((16, 1, 1), seed=3, pbc=True)
    bw_pbc = banded.scalar_bandwidth(
        np.asarray(system_pbc._data), system_pbc._sk, reorder=False
    )
    assert bw_pbc == 4 * 15 + 3  # the wrap link spans the chain


def test_rcm_reordering_shrinks_transposed_extents():
    # (4, 16, 1) in natural (z fastest) order has block bandwidth 16;
    # relabeling must bring it down to the (16, 4, 1) equivalent, 4.
    _, system = random_system((4, 16, 1), seed=5)
    mask = banded.nonzero_block_mask(np.asarray(system._data), system._sk)
    _, bwb_natural = banded.block_permutation(system._sk, mask)
    bw = banded.scalar_bandwidth(np.asarray(system._data), system._sk, reorder=True)
    assert bw <= 4 * 5 + 3  # RCM reaches ≤ 5 here (optimal grid ordering is 4)
    E_ref = np.linalg.eigvalsh(system.matrix("dense"))
    E = banded.eigvalsh_banded(np.asarray(system._data), system._sk)
    np.testing.assert_allclose(E, E_ref, atol=1e-10)


def test_hamiltonian_method_banded_end_to_end():
    lattice = CubicLattice((8, 8, 1))
    system = Hamiltonian(lattice)
    with system as (H, Δ):
        for i in lattice.sites():
            H[i, i] = -0.5 * σ0
            Δ[i, i] = 0.4 * jσ2
        for i, j in lattice.bonds():
            H[i, j] = -1.0 * σ0
    E_dense = system.eigenvalues()
    system._eigh_cache = None  # force a fresh banded solve
    E_banded = system.eigenvalues(method="banded")
    np.testing.assert_allclose(E_banded, E_dense, atol=1e-9)

    system._eigh_cache = None
    ev_d, vec_d = system.diagonalize(format="raw")
    system._eigh_cache = None
    ev_b, vec_b = system.diagonalize(format="raw", method="banded")
    np.testing.assert_allclose(ev_b, ev_d, atol=1e-9)
    # Eigenvectors may differ by phase/degenerate rotation; check they span
    # the same eigenspaces via the residual against the dense matrix.
    H = system.matrix("dense")
    resid = H @ vec_b - vec_b * ev_b[None, :]
    assert np.abs(resid).max() < 1e-9

    F_dense = system.free_energy(0.05)
    system._eigh_cache = None
    F_banded = system.free_energy(0.05, method="banded")
    assert abs(F_dense - F_banded) < 1e-8

    with pytest.raises(RuntimeError):
        system.eigenvalues(method="magic")
    with pytest.raises(RuntimeError):
        system.diagonalize(method="magic")


def test_banded_with_order_parameters():
    # p-wave + d-wave content exercises off-diagonal pairing blocks.
    lattice = CubicLattice((6, 6, 1))
    system = Hamiltonian(lattice)
    σ_p = pwave("e_z * (p_x + jp_y)")
    σ_d = dwave()
    with system as (H, Δ):
        for i in lattice.sites():
            H[i, i] = -0.7 * σ0
        for i, j in lattice.bonds():
            H[i, j] = -1.0 * σ0
            Δ[i, j] = 0.2 * σ_p(i, j) + 0.1 * σ_d(i, j)
    E_ref = np.linalg.eigvalsh(system.matrix("dense"))
    E = banded.eigvalsh_banded(np.asarray(system._data), system._sk)
    np.testing.assert_allclose(E, E_ref, atol=1e-10)
