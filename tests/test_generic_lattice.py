"""End-to-end coverage of user-defined Lattice subclasses: the generic
(gather-based) skeleton must support the full facade — DSL assembly,
exports, solvers — exactly like the cubic fast path."""

import numpy as np
import pytest

from bodge_tpu import CubicLattice, Hamiltonian, Lattice, jσ2, σ0, σ3


class RingLattice(Lattice):
    """1D ring of n sites: every site bonded to its two neighbors with the
    closing link expressed through ``edges`` (periodic by construction)."""

    def __init__(self, n):
        super().__init__((n, 1, 1))

    def index(self, coord):
        x = coord[0]
        if not (0 <= x < self.shape[0]) or coord[1] or coord[2]:
            raise ValueError(f"Coordinate {coord} out of bounds")
        return x

    def sites(self):
        for x in range(self.shape[0]):
            yield (x, 0, 0)

    def bonds(self):
        for x in range(self.shape[0] - 1):
            yield (x, 0, 0), (x + 1, 0, 0)
            yield (x + 1, 0, 0), (x, 0, 0)

    def edges(self):
        n = self.shape[0]
        yield (0, 0, 0), (n - 1, 0, 0)
        yield (n - 1, 0, 0), (0, 0, 0)


def build_ring(n=12, t=1.0, mu=0.4, delta=0.3):
    lattice = RingLattice(n)
    system = Hamiltonian(lattice)
    with system as (H, Δ):
        for i in lattice.sites():
            H[i, i] = -mu * σ0
            Δ[i, i] = delta * jσ2
        for i, j in lattice.bonds():
            H[i, j] = -t * σ0
        for i, j in lattice.edges():
            H[i, j] = -t * σ0
    return lattice, system


def test_generic_lattice_full_flow():
    n = 12
    lattice, system = build_ring(n)
    assert not system.skeleton.stencil

    H = system.matrix("dense")
    assert np.allclose(H, H.T.conj())

    # Ring spectrum: ε_k = ±sqrt((−2t·cos k − μ)² + Δ²), k = 2πm/n.
    k = 2 * np.pi * np.arange(n) / n
    ξ = -2 * 1.0 * np.cos(k) - 0.4
    expected = np.sort(np.concatenate([np.sqrt(ξ**2 + 0.3**2)] * 2))  # spin doubled
    E, X = system.diagonalize()
    assert np.allclose(np.sort(E), expected, atol=1e-10)

    # SpMM (gather fallback) against the dense product.
    import jax.numpy as jnp

    v = jnp.asarray(np.random.default_rng(0).normal(size=(n, 4, 2)))
    want = (H @ np.asarray(v).reshape(4 * n, 2)).reshape(n, 4, 2)
    assert np.allclose(np.asarray(system.apply(v)), want, atol=1e-10)

    # Exact LDOS runs and is non-negative.
    ρ = system.ldos((3, 0, 0), [0.0, 0.5, 1.0])
    assert np.all(ρ >= 0)


def test_generic_matches_cubic_chain_with_pbc():
    """A ring must equal a periodic cubic chain built via edges()."""
    n = 10
    _, ring = build_ring(n)

    chain = CubicLattice((n, 1, 1))
    cubic = Hamiltonian(chain)
    with cubic as (H, Δ):
        for i in chain.sites():
            H[i, i] = -0.4 * σ0
            Δ[i, i] = 0.3 * jσ2
        for i, j in chain.bonds():
            H[i, j] = -1.0 * σ0
        for i, j in chain.edges(axis=0):
            H[i, j] = -1.0 * σ0

    assert np.allclose(ring.matrix("dense"), cubic.matrix("dense"))


def test_generic_vectorized_assemble_matches_dsl():
    """assemble() on a generic skeleton must equal the with-DSL build."""
    n = 12
    _, dsl = build_ring(n)

    lattice = RingLattice(n)
    fast = Hamiltonian(lattice)
    ring_bond = lambda ci, cj: (np.abs(ci[:, 0] - cj[:, 0]) % (n - 2) == 1)[:, None, None]
    fast.assemble(
        onsite=lambda ci: -0.4 * σ0,
        pairing_onsite=lambda ci: 0.3 * jσ2,
        hopping=lambda ci, cj: -1.0 * σ0,  # every structural neighbor is a bond
    )
    np.testing.assert_allclose(fast.matrix("dense"), dsl.matrix("dense"), atol=1e-12)


def test_generic_assemble_pairing_bonds():
    """Antisymmetric bond pairing via assemble() stays Hermitian and matches DSL."""
    n = 10
    lattice = RingLattice(n)

    def pair_fn(ci, cj):
        # Odd (p-wave-like) bond pairing ~ sign of the displacement around the ring.
        d = cj[:, 0] - ci[:, 0]
        d = np.where(d > n // 2, d - n, np.where(d < -(n // 2), d + n, d))
        return 0.2 * np.sign(d)[:, None, None] * jσ2

    fast = Hamiltonian(lattice)
    fast.assemble(
        onsite=lambda ci: -0.4 * σ0,
        hopping=lambda ci, cj: -1.0 * σ0,
        pairing=pair_fn,
    )

    dsl = Hamiltonian(RingLattice(n))
    with dsl as (H, Δ):
        for i in lattice.sites():
            H[i, i] = -0.4 * σ0
        for i, j in list(lattice.bonds()) + list(lattice.edges()):
            H[i, j] = -1.0 * σ0
            ci = np.array([i]); cj = np.array([j])
            Δ[i, j] = pair_fn(ci, cj)[0]
    np.testing.assert_allclose(fast.matrix("dense"), dsl.matrix("dense"), atol=1e-12)
