"""Row-sharded Pallas plane-kernel tests (8 virtual CPU devices, kernels in
interpreter mode): the halo-exchange Pallas path must agree with the
single-device stencil reference for open and periodic boundaries.

[NEW SCOPE] — closes the round-1 gap where the multi-device layer only ran
the XLA einsum stencil; see bodge_tpu/parallel/pallas_sharded.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bodge_tpu import CubicLattice, Hamiltonian, jσ2, σ0, σ3
from bodge_tpu.ops import chebyshev as kpm
from bodge_tpu.ops.spmm import spmm_stencil
from bodge_tpu.parallel import RowSharding, make_row_mesh
from bodge_tpu.parallel.pallas_sharded import (
    free_energy_kpm_sharded_pallas,
    moments_sharded_pallas,
    pack_operator_sharded,
    pack_vector_sharded,
    spmm_sharded_pallas,
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


def row_mesh(n=8):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} virtual devices")
    return make_row_mesh(n)


@pytest.mark.parametrize("pbc", [False, True])
def test_pallas_sharded_spmm_matches_stencil(pbc):
    mesh = row_mesh()
    lattice, system = build_system((16, 7, 1), pbc=pbc)
    rs = RowSharding(system.skeleton, mesh)

    rng = np.random.default_rng(0)
    v = (
        rng.normal(size=(lattice.size, 4, 4)) + 1j * rng.normal(size=(lattice.size, 4, 4))
    ).astype(np.complex64)

    want = np.asarray(
        spmm_stencil(jnp.asarray(system.host_data()), system.skeleton, jnp.asarray(v))
    )
    got = np.asarray(spmm_sharded_pallas(rs, system.host_data(), v))
    assert np.allclose(got, want, atol=2e-4, rtol=2e-4)


def test_pallas_sharded_spmm_packed_form():
    """Pre-packed sharded operands go straight through the kernel (the form
    the sweep workhorse uses — no per-call host packing)."""
    mesh = row_mesh()
    lattice, system = build_system((16, 7, 1), pbc=True)
    rs = RowSharding(system.skeleton, mesh)

    rng = np.random.default_rng(5)
    v = (
        rng.normal(size=(lattice.size, 4, 4)) + 1j * rng.normal(size=(lattice.size, 4, 4))
    ).astype(np.complex64)

    b_sh = pack_operator_sharded(rs, system.host_data())
    v_sh = pack_vector_sharded(rs, v)
    y_packed = spmm_sharded_pallas(rs, b_sh, v_sh)

    from bodge_tpu.ops.pallas_spmm import plane_layout, unpack_vector

    lo = plane_layout(system.skeleton, 4)
    got = np.asarray(
        unpack_vector(np.asarray(y_packed), system.skeleton, 4, np.complex64, layout=lo)
    )
    want = np.asarray(
        spmm_stencil(jnp.asarray(system.host_data()), system.skeleton, jnp.asarray(v))
    )
    assert np.allclose(got, want, atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("pbc", [False, True])
def test_pallas_sharded_moments_match_single_device(pbc):
    mesh = row_mesh()
    lattice, system = build_system((16, 7, 1), pbc=pbc, seed=11)
    rs = RowSharding(system.skeleton, mesh)
    sk = system.skeleton
    a = kpm.spectral_bound(system.host_data(), sk, impl="stencil")

    N = lattice.size
    v0 = np.zeros((N, 4, 4), dtype=system.dtype)
    v0[lattice[(8, 3, 0)], np.arange(4), np.arange(4)] = 1.0

    order = 48
    want = np.asarray(kpm.moments(system.host_data(), sk, v0, order, a, impl="stencil"))
    got = np.asarray(moments_sharded_pallas(rs, system.host_data(), v0, order, a))
    np.testing.assert_allclose(got, want, atol=3e-4)


@pytest.mark.parametrize("pbc", [False, True])
def test_pallas_sharded_moments_multiblock_slab(pbc):
    """Lxl=16 per shard → XB=8, nb=2: covers the blocked halo kernel's
    clamped interior index maps AND the first/last-block halo predication
    in the same run."""
    mesh = row_mesh()
    lattice, system = build_system((128, 5, 1), pbc=pbc, seed=13)
    rs = RowSharding(system.skeleton, mesh)
    sk = system.skeleton
    a = kpm.spectral_bound(system.host_data(), sk, impl="stencil")

    N = lattice.size
    v0 = np.zeros((N, 4, 4), dtype=system.dtype)
    v0[lattice[(64, 2, 0)], np.arange(4), np.arange(4)] = 1.0

    order = 32
    want = np.asarray(kpm.moments(system.host_data(), sk, v0, order, a, impl="stencil"))
    got = np.asarray(moments_sharded_pallas(rs, system.host_data(), v0, order, a))
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_pallas_sharded_free_energy_matches_single_device():
    mesh = row_mesh()
    lattice, system = build_system((16, 4, 1))
    rs = RowSharding(system.skeleton, mesh)
    sk = system.skeleton
    a = kpm.spectral_bound(system.host_data(), sk, impl="stencil")

    T, order, samples = 0.3, 128, 8
    key = jax.random.PRNGKey(7)
    F_single = kpm.free_energy_kpm(
        system.host_data(), sk, T, order=order, samples=samples, key=key, scale=a,
        impl="stencil",
    )
    F_pallas = free_energy_kpm_sharded_pallas(
        rs, system.host_data(), T, a, order=order, samples=samples, key=key
    )
    assert np.isclose(F_pallas, F_single, rtol=2e-4, atol=1e-3)


def test_pallas_sharded_odd_order_moments():
    """Odd expansion orders exercise the trailing-moment truncation."""
    mesh = row_mesh()
    lattice, system = build_system((8, 6, 1), pbc=True, seed=2)
    rs = RowSharding(system.skeleton, mesh)
    sk = system.skeleton
    a = kpm.spectral_bound(system.host_data(), sk, impl="stencil")

    N = lattice.size
    v0 = np.zeros((N, 4, 2), dtype=system.dtype)
    v0[N // 2, [0, 1], [0, 1]] = 1.0

    for order in (2, 3, 7):
        want = np.asarray(
            kpm.moments(system.host_data(), sk, v0, order, a, impl="stencil")
        )
        got = np.asarray(moments_sharded_pallas(rs, system.host_data(), v0, order, a))
        np.testing.assert_allclose(got, want, atol=3e-4)


def test_pallas_sharded_requires_rows_only_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_row_mesh(8, probe_shards=2)
    lattice, system = build_system((8, 6, 1))
    rs = RowSharding(system.skeleton, mesh)
    v = np.zeros((lattice.size, 4, 2), dtype=np.complex64)
    with pytest.raises(ValueError):
        spmm_sharded_pallas(rs, system.host_data(), v)


def test_pallas_sharded_single_shard_mesh():
    """A 1-device mesh must reproduce the unsharded kernel (the real-chip
    bench configuration: shard_map over the single TPU)."""
    mesh = make_row_mesh(1)
    lattice, system = build_system((6, 5, 1), pbc=True, seed=9)
    rs = RowSharding(system.skeleton, mesh)

    rng = np.random.default_rng(1)
    v = (
        rng.normal(size=(lattice.size, 4, 4)) + 1j * rng.normal(size=(lattice.size, 4, 4))
    ).astype(np.complex64)
    want = np.asarray(
        spmm_stencil(jnp.asarray(system.host_data()), system.skeleton, jnp.asarray(v))
    )
    got = np.asarray(spmm_sharded_pallas(rs, system.host_data(), v))
    assert np.allclose(got, want, atol=2e-4, rtol=2e-4)


def test_plane_halo_ref_matches_kernel():
    """The jnp restatement used as the custom-VJP backward must reproduce
    the halo kernels bit-for-bit-ish (it defines the gradients)."""
    from bodge_tpu.ops.pallas_spmm import (
        _plane_cheb_step_halo,
        _plane_cheb_step_halo_ref,
        _plane_spmm_halo,
        _plane_stencil_halo_ref,
        pack_operator,
        pack_vector,
        plane_layout,
    )

    lattice, system = build_system((12, 6, 1), pbc=True, seed=17)
    sk = system.skeleton
    K = 4
    lo = plane_layout(sk, K)
    b = pack_operator(system.host_data(), sk, K, layout=lo)
    rng = np.random.default_rng(0)
    v = (
        rng.normal(size=(lattice.size, 4, K)) + 1j * rng.normal(size=(lattice.size, 4, K))
    ).astype(np.complex64)
    vp = pack_vector(v, sk, layout=lo)
    Lxl = sk.shape[0]
    hm = jnp.asarray(rng.normal(size=(1,) + vp.shape[1:]).astype(np.float32))
    hp = jnp.asarray(rng.normal(size=(1,) + vp.shape[1:]).astype(np.float32))
    tp = jnp.asarray(rng.normal(size=vp.shape).astype(np.float32))
    inv = jnp.float32(0.31)

    yk = np.asarray(_plane_spmm_halo(b, vp, hm, hp, sk, K, Lxl))
    yr = np.asarray(_plane_stencil_halo_ref(sk, K, b, vp, hm, hp))
    np.testing.assert_allclose(yk, yr, atol=1e-5)

    tk, ppk = _plane_cheb_step_halo(b, vp, hm, hp, tp, inv, sk, K, Lxl)
    tr, ppr = _plane_cheb_step_halo_ref(sk, K, b, vp, hm, hp, tp, inv)
    np.testing.assert_allclose(np.asarray(tk), np.asarray(tr), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ppk), np.asarray(ppr), rtol=1e-5, atol=1e-4)


def test_pallas_sharded_value_and_grad():
    """Reverse-mode through the row-sharded Pallas moment sweep (the
    self-consistency 'training step'): gradient w.r.t. the packed operator
    checked against a central finite difference along a random direction."""
    mesh = row_mesh()
    lattice, system = build_system((16, 5, 1), pbc=True, seed=21)
    rs = RowSharding(system.skeleton, mesh)
    sk = system.skeleton
    a = float(kpm.spectral_bound(system.host_data(), sk, impl="stencil"))

    N = lattice.size
    v0 = np.zeros((N, 4, 4), dtype=system.dtype)
    v0[N // 2, np.arange(4), np.arange(4)] = 1.0
    b_sh = pack_operator_sharded(rs, system.host_data())
    v_sh = pack_vector_sharded(rs, v0)

    order = 12
    w = jnp.asarray(np.linspace(1.0, 0.2, order), jnp.float32)

    def loss(b):
        mu = moments_sharded_pallas(rs, b, v_sh, order, a)
        return jnp.sum(w[:, None] * mu.astype(jnp.float32))

    F, g = jax.jit(jax.value_and_grad(loss))(b_sh)
    g = np.asarray(g)
    assert g.shape == b_sh.shape
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0

    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.normal(size=b_sh.shape).astype(np.float32))
    h = 1e-3
    fd = (float(loss(b_sh + h * u)) - float(loss(b_sh - h * u))) / (2 * h)
    an = float(jnp.sum(jnp.asarray(g) * u))
    assert np.isclose(an, fd, rtol=2e-2, atol=1e-3), (an, fd)


def test_pallas_sharded_grad_wrt_vector():
    """Gradients also flow into the probe vectors (through the halo
    ppermute ring, transposed automatically by JAX)."""
    mesh = row_mesh()
    lattice, system = build_system((8, 6, 1), pbc=False, seed=23)
    rs = RowSharding(system.skeleton, mesh)
    sk = system.skeleton
    a = float(kpm.spectral_bound(system.host_data(), sk, impl="stencil"))

    N = lattice.size
    v0 = np.zeros((N, 4, 2), dtype=system.dtype)
    v0[N // 2, [0, 1], [0, 1]] = 1.0
    b_sh = pack_operator_sharded(rs, system.host_data())
    v_sh = pack_vector_sharded(rs, v0)

    def loss(v):
        mu = moments_sharded_pallas(rs, b_sh, v, 8, a)
        return jnp.sum(mu.astype(jnp.float32))

    F, g = jax.jit(jax.value_and_grad(loss))(v_sh)
    g = np.asarray(g)
    assert g.shape == v_sh.shape
    assert np.isfinite(g).all()

    rng = np.random.default_rng(9)
    u = jnp.asarray(rng.normal(size=v_sh.shape).astype(np.float32))
    h = 1e-3
    fd = (float(loss(v_sh + h * u)) - float(loss(v_sh - h * u))) / (2 * h)
    an = float(jnp.sum(jnp.asarray(g) * u))
    assert np.isclose(an, fd, rtol=2e-2, atol=1e-3), (an, fd)


def test_pallas_sharded_bf16_operator():
    """bf16 operator storage through the sharded path: same moments to
    within bf16 drift."""
    mesh = row_mesh()
    lattice, system = build_system((16, 6, 1), pbc=True, seed=31)
    rs = RowSharding(system.skeleton, mesh)
    sk = system.skeleton
    a = kpm.spectral_bound(system.host_data(), sk, impl="stencil")
    N = lattice.size
    v0 = np.zeros((N, 4, 4), dtype=system.dtype)
    v0[N // 2, np.arange(4), np.arange(4)] = 1.0
    v_sh = pack_vector_sharded(rs, v0)

    b32 = pack_operator_sharded(rs, system.host_data())
    b16 = pack_operator_sharded(rs, system.host_data(), operator_dtype=jnp.bfloat16)
    assert b16.dtype == jnp.bfloat16
    mu32 = np.asarray(moments_sharded_pallas(rs, b32, v_sh, 24, a))
    mu16 = np.asarray(moments_sharded_pallas(rs, b16, v_sh, 24, a))
    drift = np.abs(mu16 - mu32).max() / max(np.abs(mu32).max(), 1e-9)
    assert 0 < drift < 5e-2, drift


def test_pallas_sharded_ldos_matches_single_device():
    from bodge_tpu.parallel.pallas_sharded import ldos_kpm_sharded_pallas

    mesh = row_mesh()
    lattice, system = build_system((16, 6, 1), pbc=False, seed=41)
    rs = RowSharding(system.skeleton, mesh)
    sk = system.skeleton
    a = float(kpm.spectral_bound(system.host_data(), sk, impl="stencil"))

    sites = [lattice[(8, 3, 0)], lattice[(0, 0, 0)]]
    energies = np.linspace(-1.0, 1.0, 9)
    order = 64
    want = np.asarray(
        kpm.ldos_kpm_sites(system.host_data(), sk, sites, energies,
                           order=order, scale=a, impl="stencil")
    )
    got = ldos_kpm_sharded_pallas(rs, system.host_data(), sites, energies,
                                  order=order, scale=a)
    assert got.shape == want.shape == (2, 9)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-4)


def test_pallas_sharded_dos_matches_single_device():
    from bodge_tpu.parallel.pallas_sharded import dos_kpm_sharded_pallas

    mesh = row_mesh()
    lattice, system = build_system((16, 6, 1), pbc=True, seed=51)
    rs = RowSharding(system.skeleton, mesh)
    sk = system.skeleton
    a = float(kpm.spectral_bound(system.host_data(), sk, impl="stencil"))

    energies = np.linspace(-1.2, 1.2, 11)
    key = jax.random.PRNGKey(5)
    want = np.asarray(
        kpm.dos_kpm(system.host_data(), sk, energies, order=64, scale=a,
                    samples=8, key=key, impl="stencil")
    )
    got = dos_kpm_sharded_pallas(rs, system.host_data(), energies, order=64,
                                 scale=a, samples=8, key=key)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-3)


@pytest.mark.parametrize("pbc", [False, True])
def test_halo_overlap_split_matches_monolithic(pbc):
    """The interior/boundary halo-overlap split (round-3 verdict item 3,
    SURVEY §7 hard part 5) must compute bit-equivalent SpMM results and
    moments vs the monolithic halo kernel: same planes, same kernels, only
    the launch structure differs so the ppermute can hide under interior
    compute on a pod."""
    mesh = row_mesh()
    lattice, system = build_system((32, 7, 1), pbc=pbc, seed=41)
    rs = RowSharding(system.skeleton, mesh)
    sk = system.skeleton
    a = kpm.spectral_bound(system.host_data(), sk, impl="stencil")

    rng = np.random.default_rng(2)
    v = (
        rng.normal(size=(lattice.size, 4, 4))
        + 1j * rng.normal(size=(lattice.size, 4, 4))
    ).astype(np.complex64)

    y_mono = np.asarray(spmm_sharded_pallas(rs, system.host_data(), v, overlap=False))
    y_split = np.asarray(spmm_sharded_pallas(rs, system.host_data(), v, overlap=True))
    np.testing.assert_array_equal(y_split, y_mono)

    N = lattice.size
    v0 = np.zeros((N, 4, 4), dtype=system.dtype)
    v0[lattice[(16, 3, 0)], np.arange(4), np.arange(4)] = 1.0
    mu_mono = np.asarray(
        moments_sharded_pallas(rs, system.host_data(), v0, 32, a, overlap=False)
    )
    mu_split = np.asarray(
        moments_sharded_pallas(rs, system.host_data(), v0, 32, a, overlap=True)
    )
    # Per-plane kernel outputs are identical (asserted bit-exact above);
    # the cross-plane partial sum associates differently in the split, so
    # the moments agree to float32 rounding, not bit-for-bit.
    np.testing.assert_allclose(mu_split, mu_mono, atol=2e-5)


def test_halo_overlap_env_knob(monkeypatch):
    """BODGE_HALO_OVERLAP=1 turns the split on by default; thin slabs
    (Lxl < 3) silently use the monolithic kernel."""
    from bodge_tpu.parallel import pallas_sharded as ps

    monkeypatch.setenv("BODGE_HALO_OVERLAP", "1")
    assert ps._resolve_overlap(None, 4) is True
    assert ps._resolve_overlap(None, 2) is False
    monkeypatch.delenv("BODGE_HALO_OVERLAP")
    assert ps._resolve_overlap(None, 4) is False
    assert ps._resolve_overlap(True, 4) is True


def test_halo_overlap_value_and_grad():
    """Reverse-mode through the split path: gradient w.r.t. the packed
    operator matches the monolithic path's gradient exactly (same compute
    graph up to launch structure) and a finite difference."""
    mesh = row_mesh()
    lattice, system = build_system((16, 5, 1), pbc=True, seed=43)
    rs = RowSharding(system.skeleton, mesh)
    sk = system.skeleton
    a = float(kpm.spectral_bound(system.host_data(), sk, impl="stencil"))

    N = lattice.size
    v0 = np.zeros((N, 4, 4), dtype=system.dtype)
    v0[N // 2, np.arange(4), np.arange(4)] = 1.0
    b_sh = pack_operator_sharded(rs, system.host_data())
    v_sh = pack_vector_sharded(rs, v0)

    order = 12
    w = jnp.asarray(np.linspace(1.0, 0.2, order), jnp.float32)

    def loss(b, overlap):
        mu = moments_sharded_pallas(rs, b, v_sh, order, a, overlap=overlap)
        return jnp.sum(w[:, None] * mu.astype(jnp.float32))

    F_s, g_s = jax.jit(jax.value_and_grad(lambda b: loss(b, True)))(b_sh)
    F_m, g_m = jax.jit(jax.value_and_grad(lambda b: loss(b, False)))(b_sh)
    np.testing.assert_allclose(float(F_s), float(F_m), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_m), atol=2e-5)

    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.normal(size=b_sh.shape).astype(np.float32))
    h = 1e-3
    fd = (float(loss(b_sh + h * u, True)) - float(loss(b_sh - h * u, True))) / (2 * h)
    an = float(jnp.sum(jnp.asarray(g_s) * u))
    assert np.isclose(an, fd, rtol=2e-2, atol=1e-3), (an, fd)


def test_remat_moments_and_grad_match_unchunked():
    """√steps checkpointing of the sharded moment scan is bit-compatible:
    same moments, same gradients as the plain scan (the recompute replays
    the identical graph), with reverse-mode memory O(√order)."""
    mesh = row_mesh()
    lattice, system = build_system((16, 5, 1), pbc=True, seed=51)
    rs = RowSharding(system.skeleton, mesh)
    sk = system.skeleton
    a = float(kpm.spectral_bound(system.host_data(), sk, impl="stencil"))

    N = lattice.size
    v0 = np.zeros((N, 4, 4), dtype=system.dtype)
    v0[N // 2, np.arange(4), np.arange(4)] = 1.0
    b_sh = pack_operator_sharded(rs, system.host_data())
    v_sh = pack_vector_sharded(rs, v0)

    order = 65  # steps = 32 ≥ the auto-remat threshold
    mu_plain = np.asarray(
        moments_sharded_pallas(rs, b_sh, v_sh, order, a, remat=False)
    )
    mu_remat = np.asarray(
        moments_sharded_pallas(rs, b_sh, v_sh, order, a, remat="auto")
    )
    np.testing.assert_array_equal(mu_remat, mu_plain)

    w = jnp.asarray(np.linspace(1.0, 0.2, order), jnp.float32)

    def loss(b, remat):
        mu = moments_sharded_pallas(rs, b, v_sh, order, a, remat=remat)
        return jnp.sum(w[:, None] * mu.astype(jnp.float32))

    g_plain = np.asarray(jax.jit(jax.grad(lambda b: loss(b, False)))(b_sh))
    g_remat = np.asarray(jax.jit(jax.grad(lambda b: loss(b, "auto")))(b_sh))
    np.testing.assert_allclose(g_remat, g_plain, atol=1e-6)


def test_moments_2d_rows_probes_mesh_matches_stencil():
    """Rows×probes mesh: probe chunks ride the second mesh axis; moments
    must equal the single-device stencil scan exactly (packing is a
    permutation and chunks are independent columns)."""
    import jax
    from jax.sharding import AxisType

    from bodge_tpu.ops import chebyshev as kpm
    from bodge_tpu.parallel.sharded import AXIS, PROBE_AXIS, RowSharding, make_row_mesh

    lattice, system = build_system((8, 4, 1))
    sk = system.skeleton
    mesh2 = make_row_mesh(8, probe_shards=2)
    rs = RowSharding(sk, mesh2)
    assert rs.has_probe_axis

    rng = np.random.default_rng(5)
    K = 8
    v0 = (rng.normal(size=(sk.n_sites, 4, K))
          + 1j * rng.normal(size=(sk.n_sites, 4, K))).astype(system.dtype)
    scale = 6.0
    order = 12

    mu_2d = np.asarray(
        moments_sharded_pallas(rs, system.host_data(), v0, order, scale)
    )
    mu_ref = np.asarray(
        kpm.moments(system.host_data(), sk, v0, order, scale, impl="stencil")
    )
    np.testing.assert_allclose(mu_2d, mu_ref, rtol=2e-4, atol=2e-4)
