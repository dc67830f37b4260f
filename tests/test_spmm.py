"""SpMM tests: stencil and gather implementations must agree with the dense
matrix product, including periodic wrap links, and the vectorized assemble()
fast path must agree with the with-DSL."""

import numpy as np
import pytest

import jax.numpy as jnp

from bodge_tpu import CubicLattice, Hamiltonian, jσ2, pwave, σ0, σ2, σ3
from bodge_tpu.ops.spmm import spmm_gather, spmm_stencil


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
                Δ[i, j] = rng.normal() * jσ2
    return lattice, system


@pytest.mark.parametrize("shape", [(6, 5, 1), (4, 4, 3), (8, 1, 1), (2, 3, 1), (2, 2, 2)])
@pytest.mark.parametrize("pbc", [False, True])
def test_spmm_matches_dense(shape, pbc):
    lattice, system = random_system(shape, seed=hash(shape) % 2**31, pbc=pbc)
    N = lattice.size
    K = 3
    rng = np.random.default_rng(7)
    v = rng.normal(size=(N, 4, K)) + 1j * rng.normal(size=(N, 4, K))
    v = jnp.asarray(v)

    dense = system.matrix("dense")
    want = (dense @ np.asarray(v).reshape(4 * N, K)).reshape(N, 4, K)

    got_stencil = np.asarray(spmm_stencil(system.data, system.skeleton, v))
    got_gather = np.asarray(spmm_gather(system.data, system.skeleton, v))
    assert np.allclose(got_stencil, want, atol=1e-10)
    assert np.allclose(got_gather, want, atol=1e-10)

    # And via the public facade.
    assert np.allclose(np.asarray(system.apply(v)), want, atol=1e-10)


def test_assemble_fast_path_matches_dsl():
    """Vectorized assemble() must produce the same matrix as the with-DSL."""
    shape = (8, 6, 1)
    lattice = CubicLattice(shape)
    t, μ, Δ0, M0 = 1.0, 0.75, 0.32, 0.11
    σ_p = pwave("e_z * p_x")

    dsl = Hamiltonian(lattice)
    with dsl as (H, Δ):
        for i in lattice.sites():
            H[i, i] = -μ * σ0 - M0 * σ3
            Δ[i, i] = Δ0 * jσ2
        for i, j in lattice.bonds():
            H[i, j] = -t * σ0
            Δ[i, j] = -0.1 * σ_p(i, j)

    fast = Hamiltonian(lattice)
    fast.assemble(
        onsite=lambda ci: -μ * σ0 - M0 * σ3,
        pairing_onsite=lambda ci: Δ0 * jσ2,
        # Structural neighbor pairs include periodic edges; mask them out to
        # mirror the DSL loop, which only touched bonds.
        hopping=lambda ci, cj: np.where(
            (np.abs(ci - cj).max(axis=1) == 1)[:, None, None], -t * σ0, 0
        ),
        pairing=lambda ci, cj: np.where(
            (np.abs(ci - cj).max(axis=1) == 1)[:, None, None], -0.1 * σ_p(ci, cj), 0
        ),
    )

    assert np.allclose(fast.matrix("dense"), dsl.matrix("dense"), atol=1e-12)


def test_assemble_reset_and_partial():
    lattice = CubicLattice((4, 4, 1))
    system = Hamiltonian(lattice)
    system.assemble(onsite=lambda ci: 2.0 * σ0, hopping=lambda ci, cj: -1.0 * σ0)
    M1 = system.matrix("dense")
    assert M1[0, 0] == 2.0

    # Partial update preserves hoppings.
    system.assemble(onsite=lambda ci: 3.0 * σ0)
    M2 = system.matrix("dense")
    assert M2[0, 0] == 3.0
    assert np.allclose(M2[0, 4:8], M1[0, 4:8])

    # Reset clears everything not re-specified.
    system.assemble(onsite=lambda ci: 1.0 * σ0, reset=True)
    M3 = system.matrix("dense")
    assert M3[0, 0] == 1.0
    assert np.all(M3[0, 4:] == 0)


def test_assemble_position_dependent():
    """Coordinate-dependent batched callables (the S/F bilayer pattern)."""
    L, W = 6, 4
    lattice = CubicLattice((L, W, 1))
    t, μ, Δ0, χ = 1.0, 3.0, 0.1, 0.5

    def onsite(ci):
        sc = ci[:, 0] < L // 2
        v = np.where(sc[:, None, None], -μ * σ0, -μ * σ0 - 1.5 * σ3)
        return v

    def pair_onsite(ci):
        sc = ci[:, 0] < L // 2
        phase = np.exp(1j * χ * ci[:, 0] / L)
        return np.where(sc[:, None, None], -Δ0 * phase[:, None, None] * jσ2, 0)

    fast = Hamiltonian(lattice)
    fast.assemble(
        onsite=onsite,
        pairing_onsite=pair_onsite,
        hopping=lambda ci, cj: np.where(
            (np.abs(ci - cj).max(axis=1) == 1)[:, None, None], -t * σ0, 0
        ),
    )

    dsl = Hamiltonian(lattice)
    with dsl as (H, Δ):
        for i in lattice.sites():
            if i[0] < L // 2:
                H[i, i] = -μ * σ0
                Δ[i, i] = -Δ0 * np.exp(1j * χ * i[0] / L) * jσ2
            else:
                H[i, i] = -μ * σ0 - 1.5 * σ3
        for i, j in lattice.bonds():
            H[i, j] = -t * σ0

    assert np.allclose(fast.matrix("dense"), dsl.matrix("dense"), atol=1e-12)


def test_assemble_host_path_matches_device():
    lattice = CubicLattice((6, 5, 1))
    kw = dict(
        onsite=lambda ci: 2.0 * σ0 + 0.1 * σ3,
        pairing_onsite=lambda ci: 0.3 * jσ2,
        hopping=lambda ci, cj: np.where(
            (np.abs(ci - cj).max(axis=1) == 1)[:, None, None], -1.0 * σ0, 0
        ),
    )
    dev = Hamiltonian(lattice).assemble(**kw)
    host = Hamiltonian(lattice).assemble(**kw, device=False)
    assert isinstance(host.data, np.ndarray)  # stays host-resident
    assert np.allclose(np.asarray(dev.data), host.data)
    # Host-assembled system still flows through the DSL and solvers.
    with host as (H, Δ):
        H[(0, 0, 0), (0, 0, 0)] = 5.0 * σ0
    assert host.matrix("dense")[0, 0] == 5.0
    E = host.eigenvalues()
    assert np.all(E >= 0)
