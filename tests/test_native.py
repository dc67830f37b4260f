"""Native (C++) host-runtime tier vs. pure-NumPy reference behavior."""

import numpy as np
import pytest

from bodge_tpu import CubicLattice, Hamiltonian, jσ2, σ0, σ3
from bodge_tpu import native
from bodge_tpu.ops import blocksparse as bs

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no toolchain)"
)


def _assemble(shape, device, dtype=np.complex128):
    lattice = CubicLattice(shape)
    system = Hamiltonian(lattice, dtype=dtype)
    L = shape[0]
    system.assemble(
        onsite=lambda ci: -0.5 * σ0
        + 0.3 * σ3 * (ci[:, 0] < L // 2)[:, None, None],
        pairing_onsite=lambda ci: (0.4 + 0.1j) * jσ2,
        hopping=lambda ci, cj: np.where(
            (np.abs(ci - cj).max(axis=1) == 1)[:, None, None], -1.0 * σ0, 0
        ),
        pairing=lambda ci, cj: 0.05
        * (ci[:, 0] - cj[:, 0])[:, None, None]
        * jσ2,
        check=False,
        device=device,
    )
    return system


@pytest.mark.parametrize("dtype", [np.complex64, np.complex128])
@pytest.mark.parametrize("shape", [(6, 5, 1), (4, 4, 3), (8, 1, 1)])
def test_native_assembly_matches_device_path(shape, dtype):
    host = _assemble(shape, device=False, dtype=dtype)
    dev = _assemble(shape, device=True, dtype=dtype)
    assert isinstance(host.data, np.ndarray)  # stayed host-resident
    np.testing.assert_allclose(
        np.asarray(host.data), np.asarray(dev.data), atol=1e-12
    )


def test_native_herm_error_matches_device():
    system = _assemble((6, 6, 1), device=False)
    sk = system.skeleton
    d = np.array(system.data, copy=True)
    e_native = native.herm_error(d, sk.cols, sk.trans_slot)
    e_dev = float(bs.hermiticity_error(np.asarray(d), sk))
    assert abs(e_native - e_dev) < 1e-12

    # Break Hermiticity in one block; both detectors must agree.
    d[3, 0, 0, 1] += 0.5
    e_native = native.herm_error(d, sk.cols, sk.trans_slot)
    e_dev = float(bs.hermiticity_error(np.asarray(d), sk))
    assert abs(e_native - e_dev) < 1e-9
    assert e_native > 0.4


def test_native_mirror_slots_matches_python():
    sk = bs.skeleton((5, 4, 3))
    # Build the generic-skeleton mirror table from the cubic one and compare
    # against the slot-table ground truth.
    trans = native.mirror_slots(sk.cols)
    rows, slots = np.nonzero(sk.valid)
    cols = sk.cols[rows, slots]
    # Ground truth: block (i,s)->j mirrors to the slot of (j -> i).
    for i, s, j in zip(rows[:500], slots[:500], cols[:500]):
        assert sk.cols[j, trans[i, s]] == i


def test_native_mirror_slots_asymmetry_raises():
    cols = np.array([[0, 1], [1, -1]], dtype=np.int32)  # (0,1) has no (1,0)
    with pytest.raises(ValueError, match="asymmetric"):
        native.mirror_slots(cols)


def test_generic_skeleton_numpy_fallback_equivalence(monkeypatch):
    """skeleton_from_pairs must build identical mirrors with & without C++."""
    rng = np.random.default_rng(7)
    n = 40
    # Random symmetric pair set including the diagonal.
    i = rng.integers(0, n, size=200)
    j = rng.integers(0, n, size=200)
    rows = np.concatenate([i, j, np.arange(n)])
    cols = np.concatenate([j, i, np.arange(n)])

    sk_native = bs.skeleton_from_pairs(n, rows, cols)
    monkeypatch.setattr(native, "available", lambda: False)
    sk_numpy = bs.skeleton_from_pairs(n, rows, cols)
    np.testing.assert_array_equal(sk_native.cols, sk_numpy.cols)
    np.testing.assert_array_equal(sk_native.trans_slot, sk_numpy.trans_slot)
