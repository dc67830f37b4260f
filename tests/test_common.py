"""Constant-layer tests (parity: reference tests/test_common.py)."""

import numpy as np

from bodge_tpu import jσ0, jσ1, jσ2, jσ3, σ0, σ1, σ2, σ3
from bodge_tpu.common import jσ, σ, π, sigma0, jsigma2, pi


def test_pauli_quaternion_identities():
    assert np.allclose(σ1 @ σ1, σ0)
    assert np.allclose(σ2 @ σ2, σ0)
    assert np.allclose(σ3 @ σ3, σ0)
    assert np.allclose(σ1 @ σ2, jσ3)
    assert np.allclose(σ2 @ σ3, jσ1)
    assert np.allclose(σ3 @ σ1, jσ2)
    assert np.allclose(σ1 @ σ2 @ σ3, jσ0)


def test_stacks_and_aliases():
    assert σ.shape == (3, 2, 2)
    assert np.allclose(σ[0], σ1) and np.allclose(σ[2], σ3)
    assert np.allclose(jσ, 1j * σ)
    assert sigma0 is σ0 and jsigma2 is jσ2 and pi == π


def test_dtypes():
    for m in (σ0, σ1, σ2, σ3, jσ0):
        assert m.dtype == np.complex128


def test_public_api_surface_parity():
    """The reference's 30-name `__all__` must be importable verbatim."""
    import bodge_tpu

    reference_all = [
        "Lattice", "CubicLattice", "Hamiltonian",
        "Coord", "Coords", "Index", "Indices",
        "ssd", "swave", "pwave", "dwave",
        "π", "σ", "σ0", "σ1", "σ2", "σ3",
        "jσ", "jσ0", "jσ1", "jσ2", "jσ3",
        "pi", "sigma", "sigma0", "sigma1", "sigma2", "sigma3",
        "jsigma", "jsigma0", "jsigma1", "jsigma2", "jsigma3",
    ]
    missing = [n for n in reference_all if not hasattr(bodge_tpu, n)]
    assert not missing, f"missing public names: {missing}"
    for n in reference_all:
        assert n in bodge_tpu.__all__ or hasattr(bodge_tpu, n)
