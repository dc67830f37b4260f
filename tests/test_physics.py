"""Physics integration tests (parity: reference tests/test_physics.py).

Each test builds a known physical system and asserts a law of
superconductivity physics on the computed observables, giving end-to-end
coverage of assembly + solvers.
"""

import numpy as np
from numpy.random import random as r

from bodge_tpu import CubicLattice, Hamiltonian, jσ2, pwave, π, σ0, σ1, σ2, σ3


def test_superconducting_gap_opens():
    """Adding Δ must deplete the LDOS inside the gap and push ε_min up."""
    lattice = CubicLattice((16, 16, 1))
    system = Hamiltonian(lattice)
    with system as (H, Δ):
        for i in lattice.sites():
            H[i, i] = -1.5 * σ0
        for i, j in lattice.bonds():
            H[i, j] = -1.0 * σ0

    Δs = 0.5
    probe = (8, 8, 0)
    ω = np.array([-1.2 * Δs, -0.8 * Δs, +0.8 * Δs, 1.2 * Δs])

    ρ_normal = system.ldos(probe, ω)
    ε_normal = np.min(system.diagonalize()[0])

    with system as (H, Δ):
        for i in lattice.sites():
            Δ[i, i] = Δs * jσ2

    ρ_sc = system.ldos(probe, ω)
    ε_sc = np.min(system.diagonalize()[0])

    # Inside the gap the DOS drops; outside it piles up; ε_min increases.
    assert ρ_sc[1] < ρ_normal[1] and ρ_sc[2] < ρ_normal[2]
    assert ρ_sc[0] > ρ_normal[0] and ρ_sc[3] > ρ_normal[3]
    assert ε_sc > ε_normal


def test_gap_scales_with_order_parameter():
    lattice = CubicLattice((32, 1, 1))
    system = Hamiltonian(lattice)
    t, μ = 1.0, 1.5
    with system as (H, Δ):
        for i in lattice.sites():
            H[i, i] = -μ * σ0
        for i, j in lattice.bonds():
            H[i, j] = -t * σ0

    gaps = []
    for Δ0 in [0.0, 0.01, 0.03, 0.1, 0.3, 1.0]:
        with system as (H, Δ):
            for i in lattice.sites():
                Δ[i, i] = Δ0 * jσ2
        gaps.append(np.min(system.diagonalize()[0]))

    assert all(a < b for a, b in zip(gaps[:-1], gaps[1:]))


def test_magnetic_field_isotropy():
    """Free energy and LDOS depend on |M| but not on its direction."""
    np.random.seed(42)
    lattice = CubicLattice((128, 1, 1))
    system = Hamiltonian(lattice)
    probe, energies = (64, 0, 0), [0.0, 0.01]
    t = 1.0
    Δ0, M0, T = 0.1 * t, 0.05 * t, 0.01 * t

    with system as (H, Δ):
        for i in lattice.sites():
            Δ[i, i] = -Δ0 * jσ2
        for i, j in lattice.bonds():
            H[i, j] = -t * σ0
    F0 = system.free_energy(T)
    ρ0 = system.ldos(probe, energies)[0]

    Fs, ρs = [], []
    for _ in range(10):
        θ, φ = 2 * π * r(), 2 * π * r()
        direction = (
            np.cos(θ) * σ1 + np.sin(θ) * np.cos(φ) * σ2 + np.sin(θ) * np.sin(φ) * σ3
        )
        with system as (H, Δ):
            for i in lattice.sites():
                H[i, i] = -M0 * direction
        Fs.append(system.free_energy(T))
        ρs.append(system.ldos(probe, energies)[0])

    # Turning the field on changes the observables…
    assert all(not np.allclose(F0, F, rtol=1e-10) for F in Fs)
    assert all(not np.allclose(ρ0, ρ, rtol=1e-10) for ρ in ρs)
    # …but rotating it does not.
    assert all(np.allclose(F1, F2, rtol=1e-10) for F1, F2 in zip(Fs[:-1], Fs[1:]))
    assert all(np.allclose(ρ1, ρ2, rtol=1e-10) for ρ1, ρ2 in zip(ρs[:-1], ρs[1:]))


def test_superconducting_spin_valve():
    """F(antiparallel) < F(parallel) for an F/S/F junction."""
    lattice = CubicLattice((128, 1, 1))
    system = Hamiltonian(lattice)
    t = 1.0
    Δ0, M0, T = 0.3 * t, 0.7 * t, 0.001 * t

    in_f1 = lambda i: i[0] < 32
    in_f2 = lambda i: i[0] >= 96

    with system as (H, Δ):
        for i, j in lattice.bonds():
            H[i, j] = -t * σ0
        for i in lattice.sites():
            if in_f1(i):
                H[i, i] = -M0 * σ3
            elif in_f2(i):
                H[i, i] = -M0 * σ3
            else:
                Δ[i, i] = -Δ0 * jσ2
    F_parallel = system.free_energy(T)

    with system as (H, Δ):
        for i in lattice.sites():
            if in_f2(i):
                H[i, i] = +M0 * σ3
    F_antiparallel = system.free_energy(T)

    assert F_antiparallel < F_parallel


def test_odd_frequency_zero_energy_peak():
    """A magnet converts singlets to odd-ω triplets → zero-energy peak."""
    lattice = CubicLattice((128, 1, 1))
    system = Hamiltonian(lattice)
    t = 1.0
    Δ0, M0 = 0.3 * t, 0.15 * t
    probe, energies = (63, 0, 0), [0.0, 0.05 * 0.3]

    with system as (H, Δ):
        for i, j in lattice.bonds():
            H[i, j] = -t * σ0
        for i in lattice.sites():
            Δ[i, i] = -Δ0 * jσ2
    Z_clean = system.ldos(probe, energies)[0]

    with system as (H, Δ):
        for i in lattice.sites():
            H[i, i] = -M0 * σ2
    Z_magnet = system.ldos(probe, energies)[0]

    assert Z_clean >= 0
    assert Z_magnet >= Z_clean


def test_free_energy_decreases_with_temperature():
    lattice = CubicLattice((10, 10, 1))
    system = Hamiltonian(lattice)
    with system as (H, Δ):
        for i in lattice.sites():
            H[i, i] = -2.0 * σ0
        for i, j in lattice.bonds():
            H[i, j] = -1.0 * σ0

    Fs = [system.free_energy(T) for T in [0.01, 0.1, 0.5, 1.0]]
    assert all(a > b for a, b in zip(Fs[:-1], Fs[1:]))


def test_pwave_edge_states():
    """pₓ-wave: the gap closes at x-normal edges, not elsewhere."""
    lattice = CubicLattice((31, 31, 1))
    system = Hamiltonian(lattice)
    t = 1.0
    Δ0 = 0.1 * t
    σp = pwave("e_z * p_x")
    with system as (H, Δ):
        for i, j in lattice.bonds():
            H[i, j] = -t * σ0
            Δ[i, j] = -Δ0 * σp(i, j)

    energies = [0.0, Δ0 / 4]
    ρ_center = system.ldos((15, 15, 0), energies)[0]
    ρ_yedge = system.ldos((15, 0, 0), energies)[0]
    ρ_xedge = system.ldos((0, 15, 0), energies)[0]
    ρ_corner = system.ldos((0, 0, 0), energies)[0]

    assert ρ_xedge > ρ_center and ρ_xedge > ρ_yedge
    assert ρ_corner > ρ_center and ρ_corner > ρ_yedge


def test_josephson_minigap_phase_dependence():
    """S/N/S minigap closes at φ = π and is symmetric under φ → 2π − φ."""
    lattice = CubicLattice((128, 1, 1))
    t = 1.0
    Δ0 = 3.0 * t

    def minigap(φ):
        system = Hamiltonian(lattice)
        with system as (H, Δ):
            for i in lattice.sites():
                if i[0] < 32:
                    Δ[i, i] = -Δ0 * jσ2 * np.exp(-1j * φ / 2)
                elif i[0] >= 96:
                    Δ[i, i] = -Δ0 * jσ2 * np.exp(+1j * φ / 2)
            for i, j in lattice.bonds():
                H[i, j] = -t * σ0
        return np.min(system.diagonalize()[0])

    gaps = [minigap(f * π) for f in (0.0, 0.5, 1.0, 1.5, 2.0)]
    assert gaps[0] > gaps[1] > gaps[2]
    assert np.allclose(gaps[0], gaps[4])
    assert np.allclose(gaps[1], gaps[3])
