"""Multi-device tests on the 8-virtual-CPU-device mesh: the halo-exchange
sharded SpMM / Chebyshev paths must agree with their single-device
counterparts, for open and periodic boundaries."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bodge_tpu import CubicLattice, Hamiltonian, jσ2, σ0, σ3
from bodge_tpu.ops import chebyshev as kpm
from bodge_tpu.ops.spmm import spmm_stencil
from bodge_tpu.parallel import (
    RowSharding,
    free_energy_kpm_sharded,
    make_row_mesh,
    moments_sharded,
    spmm_sharded,
)


def build_system(shape, pbc=False, seed=3):
    lattice = CubicLattice(shape)
    system = Hamiltonian(lattice)
    rng = np.random.default_rng(seed)
    phase = rng.normal(size=(lattice.size, 1, 1))

    def hopping(ci, cj):
        bond = (np.abs(ci - cj).max(axis=1) == 1)[:, None, None]
        if pbc:
            bond = np.ones_like(bond)
        return np.where(bond, -1.0 * σ0, 0)

    system.assemble(
        onsite=lambda ci: -0.7 * σ0 - 0.2 * σ3,
        pairing_onsite=lambda ci: (0.3 + 0.1 * phase) * jσ2,
        hopping=hopping,
    )
    return lattice, system


def eight_device_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_row_mesh(8)


@pytest.mark.parametrize("pbc", [False, True])
def test_sharded_spmm_matches_single_device(pbc):
    mesh = eight_device_mesh()
    lattice, system = build_system((16, 6, 1), pbc=pbc)
    rs = RowSharding(system.skeleton, mesh)

    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=(lattice.size, 4, 3)) + 1j * rng.normal(size=(lattice.size, 4, 3)))

    want = np.asarray(spmm_stencil(system.data, system.skeleton, v))
    got = np.asarray(spmm_sharded(rs, rs.shard_data(system.data), rs.shard_vector(v)))
    assert np.allclose(got, want, atol=1e-10)


def test_sharded_moments_match_single_device():
    mesh = eight_device_mesh()
    lattice, system = build_system((16, 6, 1), pbc=True)
    rs = RowSharding(system.skeleton, mesh)
    sk = system.skeleton

    a = kpm.spectral_bound(system.data, sk)
    N = lattice.size
    site = lattice[(8, 3, 0)]
    v0 = jnp.zeros((N, 4, 4), dtype=system.data.dtype)
    v0 = v0.at[site, jnp.arange(4), jnp.arange(4)].set(1.0)

    order = 64
    mu_single = np.asarray(kpm.moments(system.data, sk, v0, order, a))
    mu_sharded = np.asarray(
        moments_sharded(rs, rs.shard_data(system.data), rs.shard_vector(v0), order, a)
    )
    assert np.allclose(mu_sharded, mu_single, atol=1e-10)


def test_sharded_free_energy_matches_single_device():
    mesh = eight_device_mesh()
    lattice, system = build_system((16, 4, 1))
    rs = RowSharding(system.skeleton, mesh)
    sk = system.skeleton
    a = kpm.spectral_bound(system.data, sk)

    T, order, samples = 0.3, 256, 16
    key = jax.random.PRNGKey(7)
    F_single = kpm.free_energy_kpm(
        system.data, sk, T, order=order, samples=samples, key=key, scale=a
    )
    F_sharded = free_energy_kpm_sharded(
        rs, rs.shard_data(system.data), T, a, order=order, samples=samples, key=key
    )
    assert np.isclose(F_sharded, F_single, rtol=1e-10)


def test_row_sharding_validation():
    mesh = eight_device_mesh()
    lattice, system = build_system((6, 4, 1))  # 6 not divisible by 8
    with pytest.raises(ValueError):
        RowSharding(system.skeleton, mesh)


def test_sharded_planar_spmm_matches_complex():
    """The planar f32 sharded SpMM (the TPU-pod form) matches the complex one."""
    from bodge_tpu.ops.planar import from_planar, to_planar

    mesh = eight_device_mesh()
    lattice, system = build_system((16, 6, 1), pbc=True)
    rs = RowSharding(system.skeleton, mesh)

    rng = np.random.default_rng(4)
    v = (rng.normal(size=(lattice.size, 4, 3))
         + 1j * rng.normal(size=(lattice.size, 4, 3))).astype(np.complex64)

    want = np.asarray(spmm_stencil(jnp.asarray(system.host_data()), system.skeleton, jnp.asarray(v)))
    dp = rs.shard_data(np.asarray(to_planar(system.host_data())))
    vp = rs.shard_vector(np.asarray(to_planar(v)))
    got = from_planar(spmm_sharded(rs, dp, vp))
    assert np.allclose(got, want, atol=1e-4)


def test_sharded_planar_moments_match_complex():
    from bodge_tpu.ops.planar import to_planar

    mesh = eight_device_mesh()
    lattice, system = build_system((16, 6, 1), pbc=True)
    rs = RowSharding(system.skeleton, mesh)
    sk = system.skeleton
    a = kpm.spectral_bound(system.host_data(), sk, impl="stencil")

    N = lattice.size
    v0 = np.zeros((N, 4, 4), dtype=system.dtype)
    v0[lattice[(8, 3, 0)], np.arange(4), np.arange(4)] = 1.0

    order = 64
    mu_single = np.asarray(kpm.moments(system.host_data(), sk, v0, order, a, impl="stencil"))
    dp = rs.shard_data(np.asarray(to_planar(system.host_data())))
    vp = rs.shard_vector(np.asarray(to_planar(v0)))
    mu_planar = np.asarray(moments_sharded(rs, dp, vp, order, a))
    assert np.allclose(mu_planar, mu_single, atol=2e-4)


def test_sharded_planar_free_energy_matches_complex():
    from bodge_tpu.ops.planar import to_planar

    mesh = eight_device_mesh()
    lattice, system = build_system((16, 4, 1))
    rs = RowSharding(system.skeleton, mesh)
    sk = system.skeleton
    a = kpm.spectral_bound(system.host_data(), sk, impl="stencil")

    T, order, samples = 0.3, 128, 8
    key = jax.random.PRNGKey(7)
    F_c = free_energy_kpm_sharded(
        rs, rs.shard_data(system.host_data()), T, a, order=order, samples=samples, key=key
    )
    dp = rs.shard_data(np.asarray(to_planar(system.host_data())))
    F_p = free_energy_kpm_sharded(rs, dp, T, a, order=order, samples=samples, key=key)
    assert np.isclose(F_p, F_c, rtol=2e-4, atol=1e-3)
