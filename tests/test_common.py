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


def test_runtime_typecheck_rejects_bad_args():
    """Reference contract: every public method is runtime type checked
    (bodge/common.py:9 decorates with beartype); the vendored checker must
    reject obviously wrong argument types."""
    import pytest

    from bodge_tpu import CubicLattice, Hamiltonian

    lattice = CubicLattice((4, 4, 1))
    with pytest.raises(TypeError):
        lattice.index("not a coord")
    with pytest.raises((TypeError, ValueError)):
        lattice.index((1.5, 0, 0))
    with pytest.raises(TypeError):
        list(lattice.bonds(axis="x"))
    with pytest.raises(TypeError):
        Hamiltonian("not a lattice")
    system = Hamiltonian(lattice)
    with pytest.raises(TypeError):
        system.matrix(format=3)

    # Valid calls still work, including numpy integers for int slots.
    import numpy as np

    assert lattice.index((1, 2, 0)) == lattice.index(
        (np.int64(1), np.int64(2), np.int64(0))
    )
