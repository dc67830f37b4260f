"""Hamiltonian-layer tests (parity: reference tests/test_hamiltonian.py).

Covers: Hermiticity autofill + validation, format export equivalence,
order-parameter helper symmetries, diagonalization contracts, free energy
formulas, and LDOS positivity.
"""

import numpy as np
import pytest
from numpy.random import random as r

from bodge_tpu import (
    CubicLattice,
    Hamiltonian,
    dwave,
    jσ2,
    pwave,
    ssd,
    swave,
    σ0,
    σ1,
    σ2,
    σ3,
)


def fill_random_hermitian(system, lattice, seed=None):
    """A generically random — but Hermitian — BdG Hamiltonian."""
    if seed is not None:
        np.random.seed(seed)
    with system as (H, Δ):
        for i in lattice.sites():
            H[i, i] = r() * σ0 + r() * σ1 + r() * σ2 + r() * σ3
            Δ[i, i] = (r() * σ1 + r() * σ2 + r() * σ3) @ jσ2
        for i, j in lattice.bonds():
            t = [r(), r(), r(), r()]
            H[i, j] = t[0] * σ0 + t[1] * σ1 + t[2] * σ2 + t[3] * σ3
            H[j, i] = t[0] * σ0 + t[1] * σ1 + t[2] * σ2 + t[3] * σ3
            Δ[i, j] = (r() * σ1 + r() * σ2 + r() * σ3) @ jσ2
        for i, j in lattice.edges():
            t = [r(), r(), r(), r()]
            H[i, j] = t[0] * σ0 + t[1] * σ1 + t[2] * σ2 + t[3] * σ3
            H[j, i] = t[0] * σ0 + t[1] * σ1 + t[2] * σ2 + t[3] * σ3
            Δ[i, j] = (r() * σ1 + r() * σ2 + r() * σ3) @ jσ2


def test_autofill_produces_hermitian_matrix():
    lattice = CubicLattice((3, 5, 7))
    system = Hamiltonian(lattice)
    fill_random_hermitian(system, lattice, seed=0)
    H = system.matrix("dense")
    assert np.allclose(H, H.T.conj())


def test_non_hermitian_raises():
    lattice = CubicLattice((3, 5, 7))
    system = Hamiltonian(lattice)
    with pytest.raises(Exception):
        with system as (H, Δ):
            H[(1, 1, 1), (1, 1, 1)] = 1j * σ1


def test_matrix_export_formats():
    lattice = CubicLattice((3, 5, 7))
    system = Hamiltonian(lattice)
    with system as (H, Δ):
        for i, j in lattice:
            H[i, j] = 3 * σ0 - 4 * σ2
            Δ[i, j] = 2 * σ3 + 5 * σ2

    H_dns = system.matrix("dense")
    H_bsr = system.matrix("bsr")
    H_csr = system.matrix("csr")
    H_csc = system.matrix("csc")

    assert isinstance(H_dns, np.ndarray)
    assert H_bsr.format == "bsr"
    assert H_csr.format == "csr"
    assert H_csc.format == "csc"
    assert H_bsr.blocksize == (4, 4)

    # Element values of the very first block.
    assert np.real(H_dns[0, 0]) == 3
    assert np.imag(H_dns[0, 1]) == 4
    assert np.real(H_dns[0, 2]) == 2
    assert np.imag(H_dns[0, 3]) == -5

    assert np.max(np.abs(H_bsr - H_dns)) < 1e-6
    assert np.max(np.abs(H_csr - H_dns)) < 1e-6
    assert np.max(np.abs(H_csc - H_dns)) < 1e-6

    with pytest.raises(Exception):
        system.matrix("blah")


def test_incremental_update_preserves_other_terms():
    """Re-entering the with-block must update in place, not clear."""
    lattice = CubicLattice((4, 1, 1))
    system = Hamiltonian(lattice)
    with system as (H, Δ):
        for i in lattice.sites():
            H[i, i] = -1.0 * σ0
        for i, j in lattice.bonds():
            H[i, j] = -2.0 * σ0

    with system as (H, Δ):
        H[(0, 0, 0), (0, 0, 0)] = +7.0 * σ0

    M = system.matrix("dense")
    assert M[0, 0] == 7.0  # updated
    assert M[4, 4] == -1.0  # untouched on-site
    assert M[0, 4] == -2.0  # untouched hopping


def test_swave_systems_are_hermitian():
    lattice = CubicLattice((10, 10, 1))
    system = Hamiltonian(lattice)
    σ_s = swave()
    with system as (H, Δ):
        for i in lattice.sites():
            H[i, i] = -0.1 * σ0
            Δ[i, i] = -0.1j * σ_s(i, i)
        for i, j in lattice.bonds():
            H[i, j] = -1 * σ0
            Δ[i, j] = -0.3 * σ_s(i, j)
    H = system.matrix("dense")
    assert np.allclose(H, H.T.conj())


_PWAVE_CASES = [
    ("e_x * p_x", 0, σ1), ("e_x * p_y", 1, σ1), ("e_x * p_z", 2, σ1),
    ("e_y * p_x", 0, σ2), ("e_y * p_y", 1, σ2), ("e_y * p_z", 2, σ2),
    ("e_z * p_x", 0, σ3), ("e_z * p_y", 1, σ3), ("e_z * p_z", 2, σ3),
]


@pytest.mark.parametrize("expr,axis,spin", _PWAVE_CASES)
def test_pwave_dvector_table(expr, axis, spin):
    """d(p) = e_i p_j must open a gap only for displacements along j."""
    Δ = pwave(expr)
    origin = (0, 0, 0)
    for a in range(3):
        step = tuple(int(a == b) for b in range(3))
        got = Δ(origin, step)
        expected = spin @ jσ2 / 2 if a == axis else np.zeros((2, 2))
        assert np.allclose(got, expected)


@pytest.mark.parametrize(
    "expr",
    ["e_x * p_x", "e_z * p_y", "e_y * jp_z", "e_z * (p_x + jp_y)",
     "(e_x + je_y) * (p_y + jp_z)"],
)
def test_pwave_antisymmetry(expr):
    Δ = pwave(expr)
    for x in range(3):
        for y in range(3):
            for z in range(3):
                i = (x, y, z)
                for step_axis in range(3):
                    j = tuple(np.add(i, [int(step_axis == a) for a in range(3)]))
                    assert np.allclose(Δ(i, j), -Δ(j, i))


@pytest.mark.parametrize(
    "expr",
    ["e_x * p_x", "e_z * p_y", "e_y * jp_z", "e_z * (p_x + jp_y)",
     "(e_x + je_y) * (p_y + jp_z)"],
)
def test_pwave_systems_are_hermitian(expr):
    lattice = CubicLattice((10, 10, 1))
    system = Hamiltonian(lattice)
    with system as (H, Δ):
        for i in lattice.sites():
            H[i, i] = -0.1 * σ0
        for i, j in lattice.bonds():
            H[i, j] = -1 * σ0
    Δ_p = pwave(expr)
    with system as (H, Δ):
        for i, j in lattice.bonds():
            Δ[i, j] = -0.1 * Δ_p(i, j)
    H = system.matrix("dense")
    assert np.allclose(H, H.T.conj())


def test_pwave_batched_matches_scalar():
    Δ = pwave("(e_x + je_y) * (p_y + jp_z)")
    ci = np.array([[0, 0, 0], [1, 2, 3], [4, 0, 1]])
    cj = np.array([[0, 1, 0], [1, 2, 4], [5, 0, 1]])
    batched = Δ(ci, cj)
    for k in range(len(ci)):
        assert np.allclose(batched[k], Δ(tuple(ci[k]), tuple(cj[k])))


def test_dwave_sign_structure():
    Δ_d = dwave()
    zero = np.zeros((2, 2))
    # On-site and z-axis displacements vanish.
    assert np.allclose(Δ_d((0, 0, 0), (0, 0, 0)), zero)
    assert np.allclose(Δ_d((1, 2, 3), (1, 2, 3)), zero)
    assert np.allclose(Δ_d((0, 0, 0), (0, 0, 1)), zero)
    # +1 along x, −1 along y, regardless of distance or direction.
    for j in [(1, 0, 0), (9, 0, 0)]:
        assert np.allclose(Δ_d((0, 0, 0), j), +jσ2)
        assert np.allclose(Δ_d(j, (0, 0, 0)), +jσ2)
    for j in [(0, 1, 0), (0, 9, 0)]:
        assert np.allclose(Δ_d((0, 0, 0), j), -jσ2)
        assert np.allclose(Δ_d(j, (0, 0, 0)), -jσ2)
    # Diagonal displacements vanish.
    for j in [(1, 1, 0), (1, -1, 0)]:
        assert np.allclose(Δ_d(j, (0, 0, 0)), zero)


def test_dwave_systems_are_hermitian():
    lattice = CubicLattice((10, 10, 1))
    system = Hamiltonian(lattice)
    Δ_d = dwave()
    with system as (H, Δ):
        for i in lattice.sites():
            H[i, i] = -0.1 * σ0
        for i, j in lattice.bonds():
            H[i, j] = -1 * σ0
            Δ[i, j] = -0.1 * Δ_d(i, j)
    H = system.matrix("dense")
    assert np.allclose(H, H.T.conj())


def test_ssd_profile():
    lattice = CubicLattice((31, 137, 1))
    system = Hamiltonian(lattice)
    φ = ssd(system)
    assert np.allclose(φ((0, 0, 0), (0, 0, 0)), 0, atol=0.001)  # corner → 0
    assert np.allclose(φ((15, 68, 0), (15, 68, 0)), 1, atol=0.001)  # center → 1
    assert φ((0, 0, 0), (0, 0, 0)) == φ((30, 136, 0), (30, 136, 0))  # symmetry
    # Midpoint averaging is exact.
    assert φ((1, 21, 0), (11, 1, 0)) == φ((6, 11, 0), (6, 11, 0))


def build_sc_magnet_system():
    lattice = CubicLattice((10, 3, 2))
    system = Hamiltonian(lattice)
    with system as (H, Δ):
        for i in lattice.sites():
            H[i, i] = 4 * σ0
            if i[0] > 5:
                Δ[i, i] = 1 * jσ2
            elif i[0] > 3:
                H[i, i] = 6 * σ0 + 2 * σ3
        for i, j in lattice.bonds():
            H[i, j] = -1 * σ0
    return lattice, system


def test_diagonalize_contracts():
    lattice, system = build_sc_magnet_system()
    H = system.matrix("dense")
    N = lattice.size

    E, X = system.diagonalize(format="raw")
    # Only the positive half of the Nambu-doubled spectrum, ascending.
    assert E.size == 2 * N
    assert np.all(E > 0)
    assert np.all(np.diff(E) >= -1e-12)
    # Defining eigenvalue equation for raw vectors.
    for n in range(E.size):
        assert np.allclose(H @ X[:, n], E[n] * X[:, n], atol=1e-8)

    # Reshaped layout: X[n, site, α] == X_raw[4·site+α, n].
    eigval, eigvec = system.diagonalize()
    assert np.allclose(eigval, E)
    assert np.allclose(eigvec, X.T.reshape(E.size, N, 4))

    # Cross-check against scipy's subset solver.
    from scipy.linalg import eigh

    E_ref, _ = eigh(H, subset_by_value=(0, np.inf))
    assert np.allclose(np.sort(E), np.sort(E_ref), atol=1e-8)

    with pytest.raises(Exception):
        system.diagonalize(format="foo")


def test_free_energy_formulas():
    lattice = CubicLattice((10, 7, 3))
    system = Hamiltonian(lattice)
    with system as (H, Δ):
        for i in lattice.sites():
            if i[0] <= 3:
                H[i, i] = -0.5 * σ0
                Δ[i, i] = -1.0 * jσ2
            if i[0] >= 7:
                H[i, i] = +0.5 * σ0 + 1.5 * σ3
        for i, j in lattice.bonds():
            H[i, j] = -1 * σ0

    ε, _ = system.diagonalize()
    ε_full = np.hstack([-ε, +ε])
    for T in [0.01, 0.1, 1.0]:
        F1 = system.free_energy(T)
        F2 = -(T / 2) * np.sum(np.log(1 + np.exp(-ε_full / T)))
        assert np.allclose(F1, F2)

    # Zero-temperature limit: half the sum of the negative spectrum.
    assert np.allclose(system.free_energy(0.0), 0.5 * np.sum(ε_full[ε_full < 0]))

    with pytest.raises(Exception):
        system.free_energy(-1.0)


def test_ldos_nonnegative_on_random_system():
    lattice = CubicLattice((5, 5, 2))
    system = Hamiltonian(lattice)
    fill_random_hermitian(system, lattice, seed=1)

    energies = [0.0, 0.01, 0.10, 0.50, 1.00, 2.00, 4.00]
    for site in lattice.sites():
        ρ = system.ldos(site, energies)
        assert ρ.shape == (len(energies),)
        assert np.all(ρ >= 0)


def test_ldos_matches_sparse_lu_reference():
    """Our spectral resolvent must equal the reference's spsolve approach."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    lattice = CubicLattice((6, 4, 1))
    system = Hamiltonian(lattice)
    fill_random_hermitian(system, lattice, seed=2)

    site = (3, 2, 0)
    energies = np.array([-1.0, -0.3, 0.0, 0.3, 1.0])
    ρ_ours = system.ldos(site, energies)

    # Reference algorithm: per-energy sparse LU of [(ε+iΓ)I − H].
    H = system.matrix("csc")
    I = sp.identity(H.shape[0], format="csc")
    ε_pos = np.unique(np.abs(energies))
    Γ = np.gradient(ε_pos)
    i0 = 4 * lattice[site]
    table = {}
    for ε_n, Γ_n in zip(ε_pos, Γ):
        A = (ε_n + 1j * Γ_n) * I - H
        X = spla.spsolve(A.tocsc(), sp.identity(H.shape[0], format="csc")[:, i0 : i0 + 4])
        diag = np.array([X[i0 + a, a] for a in range(4)])
        table[+ε_n] = -np.imag(diag[0] + diag[1]) / np.pi
        table[-ε_n] = -np.imag(diag[2] + diag[3]) / np.pi
    ρ_ref = np.array([table[e] for e in energies])

    assert np.allclose(ρ_ours, ρ_ref, atol=1e-10)


def test_index_addresses_blocks():
    lattice = CubicLattice((3, 3, 1))
    system = Hamiltonian(lattice)
    with system as (H, Δ):
        H[(0, 0, 0), (1, 0, 0)] = 2.5 * σ0
        H[(1, 0, 0), (0, 0, 0)] = 2.5 * σ0
    k = system.index((0, 0, 0), (1, 0, 0))
    block = np.asarray(system.data).reshape(-1, 4, 4)[k]
    assert block[0, 0] == 2.5
    with pytest.raises(Exception):
        system.index((0, 0, 0), (2, 2, 0))  # not a structural neighbor


def test_cuda_flag_rejected():
    lattice = CubicLattice((2, 2, 1))
    system = Hamiltonian(lattice)
    with system as (H, Δ):
        for i in lattice.sites():
            H[i, i] = σ0
    with pytest.raises(RuntimeError):
        system.diagonalize(cuda=True)
    with pytest.raises(RuntimeError):
        system.free_energy(0.1, cuda=True)
