"""Model-zoo tests, including the BASELINE 3D Rashba d+p-wave configuration
(scaled down for CPU) and S/F-bilayer equivalence with the reference's
benchmark construction."""

import numpy as np
import pytest

from bodge_tpu import CubicLattice, Hamiltonian, jσ2, σ0, σ3
from bodge_tpu.models import systems


def test_swave_builder_gap():
    system = systems.swave_superconductor((12, 12, 1), mu=0.5, delta=0.4)
    E = system.eigenvalues()
    assert E.min() > 0.3  # gapped at ~Δ


def test_swave_inhomogeneous_and_zeeman():
    def delta(ci):
        return np.where(ci[:, 0] < 6, 0.5, 0.0)

    system = systems.swave_superconductor((12, 4, 1), delta=delta, zeeman=[0, 0, 0.2])
    H = system.matrix("dense")
    assert np.allclose(H, H.T.conj())
    # Zeeman splits spins: onsite block e↑ vs e↓ differ by 2m.
    assert np.isclose((H[1, 1] - H[0, 0]).real, 2 * 0.2)


def test_sf_bilayer_matches_reference_recipe():
    """The builder must equal the explicit with-DSL construction of the
    reference's benchmark system (misc/benchmark.py:91-130 semantics)."""
    L, W = 8, 6
    t, μ, M0, Δ0, χ = 1.0, -3.0, 1.5, 0.1, 0.5
    built = systems.sf_bilayer(L, W, t=t, mu=μ, m0=M0, delta0=Δ0, winding=χ)

    lattice = CubicLattice((L, W, 1))
    dsl = Hamiltonian(lattice)
    with dsl as (H, Δ):
        for i in lattice.sites():
            if i[0] < L // 2:
                H[i, i] = -μ * σ0
                Δ[i, i] = -Δ0 * np.exp(1j * χ * i[0] / L) * jσ2
            else:
                H[i, i] = -μ * σ0 - M0 * σ3
        for i, j in lattice.bonds(axis=0):
            H[i, j] = -t * σ0
        for i, j in lattice.bonds(axis=1):
            H[i, j] = -2 * t * σ0

    assert np.allclose(built.matrix("dense"), dsl.matrix("dense"), atol=1e-12)


def test_rashba_dp_wave_3d():
    """BASELINE config: d-wave + p-wave with Rashba SOC on a 3D lattice,
    inhomogeneous Δ(i) (scaled down from 64×64×4 for the CPU suite)."""

    def profile(mid):
        return 1.0 + 0.5 * np.cos(np.pi * mid[:, 0] / 8)

    system = systems.rashba_dp_wave(
        shape=(8, 8, 4), alpha=0.4, delta_d=0.3, delta_p=0.2, profile=profile
    )
    H = system.matrix("dense")
    assert np.allclose(H, H.T.conj(), atol=1e-10)

    # Particle-hole symmetric spectrum.
    E = np.linalg.eigvalsh(H)
    assert np.allclose(E, -E[::-1], atol=1e-10)

    # Rashba SOC present: spin-flip hopping elements are nonzero.
    lattice = system.lattice
    i, j = lattice[(0, 0, 0)], lattice[(1, 0, 0)]
    assert abs(H[4 * i, 4 * j + 1]) > 0.1

    # Pairing present on bonds.
    assert np.abs(H[4 * i : 4 * i + 2, 4 * j + 2 : 4 * j + 4]).max() > 0.05


def test_josephson_builder_minigap_closes():
    gaps = [
        np.min(systems.josephson_junction(64, phase=φ).eigenvalues())
        for φ in (0.0, np.pi / 2, np.pi)
    ]
    assert gaps[0] > gaps[1] > gaps[2]
