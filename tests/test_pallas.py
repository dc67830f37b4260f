"""Pallas stencil-kernel tests (interpreter mode on CPU): pack/unpack
round-trips and bit-level agreement with the XLA stencil SpMM."""

import numpy as np
import pytest

import jax.numpy as jnp

from bodge_tpu import CubicLattice, Hamiltonian, jσ2, σ0, σ2, σ3
from bodge_tpu.ops import pallas_spmm as pk
from bodge_tpu.ops.spmm import spmm_stencil


def random_system(shape, pbc, seed=0):
    lattice = CubicLattice(shape)
    system = Hamiltonian(lattice)
    rng = np.random.default_rng(seed)

    def herm2(n):
        c = rng.normal(size=(4, n, 1, 1))
        return c[0] * σ0 + c[1] * np.array([[0, 1], [1, 0]]) + c[2] * σ2 + c[3] * σ3

    def hopping(ci, cj):
        bond = (np.abs(ci - cj).max(axis=1) == 1)[:, None, None]
        keep = np.ones_like(bond) if pbc else bond
        return np.where(keep, herm2(len(ci)), 0)

    # Note: hopping(ci, cj) and hopping(cj, ci) are independent random draws;
    # Hermiticity is irrelevant for SpMM agreement, so skip the check.
    system.assemble(
        onsite=lambda ci: herm2(len(ci)),
        pairing_onsite=lambda ci: herm2(len(ci)) @ np.asarray(jσ2),
        hopping=hopping,
        pairing=hopping,
        check=False,
    )
    return lattice, system


@pytest.mark.parametrize(
    "shape,pbc",
    [
        ((6, 5, 1), False),
        ((6, 5, 1), True),
        ((4, 7, 1), True),
        ((4, 4, 3), False),
        ((4, 4, 3), True),
        ((3, 1, 5), True),
        ((5, 6, 4), True),
    ],
)
def test_pallas_matches_stencil(shape, pbc):
    lattice, system = random_system(shape, pbc)
    sk = system.skeleton
    assert pk.supported(sk)

    rng = np.random.default_rng(1)
    K = 4
    v = jnp.asarray(
        (rng.normal(size=(lattice.size, 4, K)) + 1j * rng.normal(size=(lattice.size, 4, K))).astype(
            np.complex64
        )
    )
    data64 = system.data.astype(jnp.complex64)

    want = np.asarray(spmm_stencil(data64, sk, v))
    got = np.asarray(pk.spmm_pallas(data64, sk, v))
    assert np.allclose(got, want, atol=2e-4, rtol=2e-4)


def test_pack_roundtrip():
    lattice, system = random_system((6, 5, 1), pbc=True)
    sk = system.skeleton
    rng = np.random.default_rng(2)
    v = jnp.asarray(
        (rng.normal(size=(lattice.size, 4, 3)) + 1j * rng.normal(size=(lattice.size, 4, 3))).astype(
            np.complex64
        )
    )
    vp = pk.pack_vector(v, sk)
    assert vp.shape[-1] % 128 == 0
    back = pk.unpack_vector(vp, sk, 3, jnp.complex64)
    assert np.allclose(np.asarray(back), np.asarray(v), atol=1e-6)

    # Inner products are invariant under packing (permutation + zero pad).
    ip_packed = float(jnp.sum(vp * vp))
    ip_plain = float(jnp.sum(jnp.real(v) ** 2 + jnp.imag(v) ** 2))
    assert np.isclose(ip_packed, ip_plain, rtol=1e-6)


def test_pallas_1d_chain_flat_layout():
    # 1D chains are handled by the flat resident-vector layout (the plane
    # layout cannot: a 1-lane plane would waste 127/128 of the VPU).
    lattice, system = random_system((16, 1, 1), pbc=True)
    sk = system.skeleton
    assert pk.plan(sk, 2).mode == "flat"
    rng = np.random.default_rng(3)
    v = jnp.asarray(
        (rng.normal(size=(lattice.size, 4, 2)) + 1j * rng.normal(size=(lattice.size, 4, 2))).astype(
            np.complex64
        )
    )
    got = np.asarray(pk.spmm_pallas(system.data.astype(jnp.complex64), sk, v))
    want = np.asarray(spmm_stencil(system.data.astype(jnp.complex64), sk, v))
    assert np.allclose(got, want, atol=2e-4, rtol=2e-4)


def test_pallas_unsupported_fallback():
    # Non-stencil (generic) skeletons fall back to the XLA path.
    from bodge_tpu.ops.blocksparse import skeleton_from_pairs

    rows = np.array([0, 0, 1, 1, 2, 2, 0, 2])
    cols = np.array([0, 1, 0, 1, 2, 0, 2, 1])
    # make structurally symmetric
    rows, cols = np.concatenate([rows, cols]), np.concatenate([cols, rows])
    sk = skeleton_from_pairs(3, rows, cols)
    assert not pk.supported(sk)
    rng = np.random.default_rng(4)
    data = (rng.normal(size=(3, sk.n_slots, 4, 4)) * sk.valid[..., None, None]).astype(
        np.complex64
    )
    v = jnp.ones((3, 4, 2), dtype=np.complex64)
    from bodge_tpu.ops.spmm import spmm_gather

    got = np.asarray(pk.spmm_pallas(jnp.asarray(data), sk, v))
    want = np.asarray(spmm_gather(jnp.asarray(data), sk, v))
    assert np.allclose(got, want, atol=1e-5)


def test_fused_chebyshev_step_moments_match_stencil():
    """The fused step kernel (t_next + in-kernel inner products) reproduces
    the complex stencil moment scan."""
    import numpy as np
    import jax.numpy as jnp
    from bodge_tpu import CubicLattice, Hamiltonian, jσ2, σ0
    from bodge_tpu.ops import chebyshev as kpm
    from bodge_tpu.ops.blocksparse import BLOCK
    from bodge_tpu.ops.pallas_spmm import (
        moments_pallas_fused,
        pack_operator,
        pack_vector,
    )

    lattice = CubicLattice((10, 8, 1))
    system = Hamiltonian(lattice, dtype=np.complex64)
    system.assemble(
        onsite=lambda ci: -0.5 * σ0,
        pairing_onsite=lambda ci: 0.4 * jσ2,
        hopping=lambda ci, cj: np.where(
            (np.abs(ci - cj).max(axis=1) == 1)[:, None, None], -1.0 * σ0, 0
        ),
    )
    sk = system.skeleton
    N = lattice.size
    a = kpm.spectral_bound(system.host_data(), sk, impl="stencil")

    K = 4
    v0 = np.zeros((N, BLOCK, K), np.complex64)
    v0[N // 2, np.arange(K) % BLOCK, np.arange(K)] = 1.0

    order = 32
    want = np.asarray(kpm.moments(system.host_data(), sk, v0, order, a, impl="stencil"))

    b_packed = pack_operator(system.host_data(), sk, K)
    v0p = pack_vector(v0, sk)
    got = np.asarray(
        moments_pallas_fused(b_packed, v0p, sk, jnp.float32(1.0 / a), order, K)
    )
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_bf16_operator_storage_matches_f32():
    """bf16 block storage (half HBM traffic) must agree with f32 storage to
    bf16 rounding accuracy — same kernel, same vectors, reduced operator."""
    lattice, system = random_system((6, 5, 1), pbc=False, seed=3)
    sk = system.skeleton
    K = 4
    N = lattice.size
    rng = np.random.default_rng(7)
    v = (rng.normal(size=(N, 4, K)) + 1j * rng.normal(size=(N, 4, K))).astype(
        np.complex64
    )
    vp = pk.pack_vector(v, sk)
    data = system.host_data()
    b32 = pk.pack_operator(data, sk, K)
    b16 = pk.pack_operator(data, sk, K, operator_dtype=jnp.bfloat16)
    assert b16.dtype == jnp.bfloat16
    y32 = pk.unpack_vector(pk.spmm_pallas_packed(b32, vp, sk, K), sk, K, np.complex64)
    y16 = pk.unpack_vector(pk.spmm_pallas_packed(b16, vp, sk, K), sk, K, np.complex64)
    scale = np.abs(y32).max()
    assert np.abs(y16 - y32).max() < 2e-2 * scale  # bf16 has ~8 mantissa bits

    # Fused Chebyshev moments agree to the same tolerance.
    inv = jnp.float32(1.0 / 8.0)
    mu32 = np.asarray(pk.moments_pallas_fused(b32, vp, sk, inv, 16, K))
    mu16 = np.asarray(pk.moments_pallas_fused(b16, vp, sk, inv, 16, K))
    assert np.abs(mu16 - mu32).max() < 3e-2 * max(1.0, np.abs(mu32).max())
