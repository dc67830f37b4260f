"""Skeleton/ELL storage tests: structure parity with a COO-coalesced
reference construction, export round-trips, and Hermiticity accounting."""

import numpy as np
import pytest
import scipy.sparse as sp

from bodge_tpu import CubicLattice, Hamiltonian, σ0, σ1, jσ2
from bodge_tpu.ops import blocksparse as bs

SHAPES = [(4, 3, 2), (7, 1, 1), (2, 2, 2), (3, 3, 1), (2, 5, 1), (1, 1, 1)]


def reference_block_pattern(lattice):
    """The reference's skeleton: COO of (i, j) site pairs, coalesced."""
    rows, cols = [], []
    for ci, cj in lattice:
        i, j = lattice[ci], lattice[cj]
        rows += [i, j]
        cols += [j, i]
    m = sp.coo_matrix((np.ones(len(rows)), (rows, cols)), shape=(lattice.size,) * 2)
    m.sum_duplicates()
    return {(int(i), int(j)) for i, j in zip(m.row, m.col)}


@pytest.mark.parametrize("shape", SHAPES)
def test_skeleton_structure_matches_reference(shape):
    lattice = CubicLattice(shape)
    sk = bs.skeleton(shape)
    ours = {
        (i, int(sk.cols[i, s]))
        for i in range(sk.n_sites)
        for s in range(sk.n_slots)
        if sk.cols[i, s] >= 0
    }
    assert ours == reference_block_pattern(lattice)
    assert sk.nnz_blocks == len(ours)


@pytest.mark.parametrize("shape", SHAPES)
def test_generic_skeleton_matches_cubic(shape):
    lattice = CubicLattice(shape)
    sk_gen = bs.skeleton_from_lattice(lattice)
    ours = {
        (i, int(sk_gen.cols[i, s]))
        for i in range(lattice.size)
        for s in range(sk_gen.cols.shape[1])
        if sk_gen.cols[i, s] >= 0
    }
    assert ours == reference_block_pattern(lattice)


@pytest.mark.parametrize("shape", SHAPES)
def test_slot_count_is_static_bound(shape):
    sk = bs.skeleton(shape)
    active = sum(1 for L in shape if L > 1)
    assert sk.n_slots == 1 + 2 * active


def test_dense_roundtrip():
    shape = (3, 4, 2)
    sk = bs.skeleton(shape)
    rng = np.random.default_rng(0)
    data = rng.normal(size=(sk.n_sites, sk.n_slots, 4, 4)) + 1j * rng.normal(
        size=(sk.n_sites, sk.n_slots, 4, 4)
    )
    data[~sk.valid] = 0
    dense = bs.ell_to_dense(data, sk)
    assert dense.shape == (4 * sk.n_sites,) * 2
    back = bs.dense_to_ell(dense, sk)
    assert np.allclose(back, data)
    # Device-side densification agrees with the host-side one.
    import jax.numpy as jnp

    assert np.allclose(np.asarray(bs.ell_to_dense_jnp(jnp.asarray(data), sk)), dense)


def test_bsr_export_matches_dense():
    shape = (3, 4, 2)
    sk = bs.skeleton(shape)
    rng = np.random.default_rng(1)
    data = rng.normal(size=(sk.n_sites, sk.n_slots, 4, 4)).astype(complex)
    data[~sk.valid] = 0
    bsr = bs.ell_to_bsr(data, sk)
    assert bsr.blocksize == (4, 4)
    assert np.allclose(bsr.toarray(), bs.ell_to_dense(data, sk))


def test_hermiticity_error_detects_asymmetry():
    import jax.numpy as jnp

    shape = (4, 4, 1)
    lattice = CubicLattice(shape)
    system = Hamiltonian(lattice)
    with system as (H, Δ):
        for i in lattice.sites():
            H[i, i] = 2.0 * σ0 + 0.5 * σ1
            Δ[i, i] = 0.3 * jσ2
        for i, j in lattice.bonds():
            H[i, j] = -1.0 * σ0
    assert float(bs.hermiticity_error(system.data, system.skeleton)) < 1e-12

    # Deliberately break one block's Hermitian partner.
    data = np.asarray(system.data).copy()
    data[0, 1, 0, 0] += 0.5
    err = float(bs.hermiticity_error(jnp.asarray(data), system.skeleton))
    assert err >= 0.25  # at least the asymmetric half shows up


@pytest.mark.parametrize("shape", SHAPES)
def test_pbc_wrap_slots(shape):
    """Boundary sites' missing-neighbor slots must hold the wrap column."""
    sk = bs.skeleton(shape)
    lattice = CubicLattice(shape)
    for s, (axis, d) in enumerate(sk.slots):
        if axis < 0 or shape[axis] == 2 and d == -1:
            continue
        for coord in [(0, 0, 0)]:
            i = lattice[coord]
            expect = list(coord)
            expect[axis] = (expect[axis] + d) % shape[axis]
            assert sk.cols[i, s] == lattice[tuple(expect)]
