"""Plane-layout kernel coverage and impl-dispatch policy tests.

Round-1 review: the plane layout (large-N path, BASELINE 1000×1000 config)
had zero repo test coverage because every test lattice selects the flat
layout.  Here FLAT_VECTOR_VMEM_MAX is forced to 0 so plan() must choose
planes, and the kernels run in interpreter mode on small lattices against
the XLA stencil.  Also covers the dispatch policy: the automatic
planar→pallas upgrade fires only for impl=None/"auto" — an explicit
impl="planar" stays planar (advisor finding).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from bodge_tpu import CubicLattice, Hamiltonian, jσ2, σ0, σ3
from bodge_tpu.ops import chebyshev as kpm
from bodge_tpu.ops import pallas_spmm as pk
from bodge_tpu.ops.spmm import spmm_stencil


def build_system(shape, pbc=False, seed=6):
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


@pytest.fixture
def force_planes(monkeypatch):
    """Make plan() select the plane layout regardless of problem size."""
    monkeypatch.setattr(pk, "FLAT_VECTOR_VMEM_MAX", 0)


@pytest.mark.parametrize(
    "shape,pbc",
    [
        ((7, 6, 1), False),
        ((7, 6, 1), True),
        ((5, 3, 2), True),
        # Multi-block grids: Lx=12 → XB=6 (nb=2), Lx=16 → XB=8 (nb=2),
        # and a prime Lx=11 → XB=1 (per-plane grid, nb=11).  These cover
        # the inter-block ±x index maps (circular wrap across block edges).
        ((12, 6, 1), True),
        ((16, 5, 1), False),
        ((11, 4, 1), True),
    ],
)
def test_plane_spmm_matches_stencil(force_planes, shape, pbc):
    lattice, system = build_system(shape, pbc=pbc)
    sk = system.skeleton
    K = 4
    assert pk.plan(sk, K).mode == "planes"

    rng = np.random.default_rng(1)
    v = (
        rng.normal(size=(lattice.size, 4, K)) + 1j * rng.normal(size=(lattice.size, 4, K))
    ).astype(np.complex64)
    data = system.host_data()

    want = np.asarray(spmm_stencil(jnp.asarray(data), sk, jnp.asarray(v)))
    got = np.asarray(pk.spmm_pallas(data, sk, v))
    assert np.allclose(got, want, atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("shape", [(9, 5, 1), (12, 5, 1)])  # nb=1 and nb=2
def test_plane_fused_moments_match_stencil(force_planes, shape):
    lattice, system = build_system(shape, pbc=True, seed=8)
    sk = system.skeleton
    K = 4
    assert pk.plan(sk, K).mode == "planes"
    a = kpm.spectral_bound(system.host_data(), sk, impl="stencil")

    N = lattice.size
    v0 = np.zeros((N, 4, K), dtype=system.dtype)
    v0[N // 2, np.arange(K), np.arange(K)] = 1.0

    order = 32
    want = np.asarray(kpm.moments(system.host_data(), sk, v0, order, a, impl="stencil"))
    b_packed = pk.pack_operator(system.host_data(), sk, K)
    v0p = pk.pack_vector(v0, sk)
    got = np.asarray(
        pk.moments_pallas_fused(b_packed, v0p, sk, jnp.float32(1.0 / a), order, K)
    )
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_plane_bf16_operator_storage(force_planes):
    """bf16 plane operator storage: same moments to within bf16 drift."""
    import jax.numpy as jnp

    lattice, system = build_system((12, 5, 1), pbc=True, seed=8)
    sk = system.skeleton
    K = 4
    a = kpm.spectral_bound(system.host_data(), sk, impl="stencil")
    N = lattice.size
    v0 = np.zeros((N, 4, K), dtype=system.dtype)
    v0[N // 2, np.arange(K), np.arange(K)] = 1.0
    order = 24
    v0p = pk.pack_vector(v0, sk)
    b32 = pk.pack_operator(system.host_data(), sk, K)
    b16 = pk.pack_operator(system.host_data(), sk, K, operator_dtype=jnp.bfloat16)
    assert b16.dtype == jnp.bfloat16
    mu32 = np.asarray(pk.moments_pallas_fused(b32, v0p, sk, jnp.float32(1.0 / a), order, K))
    mu16 = np.asarray(pk.moments_pallas_fused(b16, v0p, sk, jnp.float32(1.0 / a), order, K))
    drift = np.abs(mu16 - mu32).max() / max(np.abs(mu32).max(), 1e-9)
    assert drift < 5e-2, drift  # bf16 has ~3 significant digits


def test_plane_packed_inner_and_roundtrip(force_planes):
    lattice, system = build_system((7, 4, 1), pbc=False, seed=4)
    sk = system.skeleton
    rng = np.random.default_rng(2)
    v = (
        rng.normal(size=(lattice.size, 4, 3)) + 1j * rng.normal(size=(lattice.size, 4, 3))
    ).astype(np.complex64)
    vp = pk.pack_vector(v, sk)
    assert vp.ndim == 3  # plane layout: [Lx, rows, P]
    back = pk.unpack_vector(vp, sk, 3, np.complex64)
    assert np.allclose(np.asarray(back), v, atol=1e-6)
    ip_packed = np.asarray(pk._packed_inner(vp, vp, sk, 3))
    ip_plain = np.sum(np.abs(v) ** 2, axis=(0, 1))
    assert np.allclose(ip_packed, ip_plain, rtol=1e-5)


def test_auto_impl_upgrades_to_pallas(monkeypatch):
    """impl=None on a planar-default backend dispatches the public
    moments() into the fused Pallas kernel (interpret mode here)."""
    from bodge_tpu.hamiltonian import use_planar_device_path

    monkeypatch.setenv("BODGE_PLANAR", "1")
    monkeypatch.setenv("BODGE_PALLAS_UPGRADE", "1")
    use_planar_device_path.cache_clear()
    try:
        lattice, system = build_system((6, 6, 1), pbc=True, seed=5)
        sk = system.skeleton
        a = kpm.spectral_bound(system.host_data(), sk, impl="stencil")
        N = lattice.size
        v0 = np.zeros((N, 4, 4), dtype=system.dtype)
        v0[N // 2, np.arange(4), np.arange(4)] = 1.0

        calls = []
        real = pk.moments_pallas_fused

        def spy(*args, **kwargs):
            calls.append(1)
            return real(*args, **kwargs)

        monkeypatch.setattr(pk, "moments_pallas_fused", spy)
        got = np.asarray(kpm.moments(system.host_data(), sk, v0, 16, a))
        assert calls, "auto impl did not dispatch into the fused Pallas path"
        want = np.asarray(
            kpm.moments(system.host_data(), sk, v0, 16, a, impl="stencil")
        )
        np.testing.assert_allclose(got, want, atol=3e-4)
    finally:
        use_planar_device_path.cache_clear()


def test_explicit_planar_not_upgraded(monkeypatch):
    """impl="planar" must run the planar stencil even where the Pallas
    upgrade is available (the paths stay individually forceable)."""
    from bodge_tpu.hamiltonian import use_planar_device_path

    monkeypatch.setenv("BODGE_PLANAR", "1")
    monkeypatch.setenv("BODGE_PALLAS_UPGRADE", "1")
    use_planar_device_path.cache_clear()
    try:
        lattice, system = build_system((6, 4, 1), pbc=True, seed=7)
        sk = system.skeleton
        a = kpm.spectral_bound(system.host_data(), sk, impl="stencil")
        N = lattice.size
        v0 = np.zeros((N, 4, 4), dtype=system.dtype)
        v0[N // 2, np.arange(4), np.arange(4)] = 1.0

        def boom(*args, **kwargs):
            raise AssertionError("explicit impl='planar' was rerouted to pallas")

        monkeypatch.setattr(pk, "moments_pallas_fused", boom)
        got = np.asarray(kpm.moments(system.host_data(), sk, v0, 16, a, impl="planar"))
        want = np.asarray(
            kpm.moments(system.host_data(), sk, v0, 16, a, impl="stencil")
        )
        np.testing.assert_allclose(got, want, atol=3e-4)
    finally:
        use_planar_device_path.cache_clear()


def test_identity_probe_guard():
    """samples=None exact-trace probes refuse to materialize a multi-GB
    identity (round-1 foot-gun)."""
    lattice, system = build_system((52, 52, 1))  # 2704 sites > 8192/4 orbitals
    sk = system.skeleton
    with pytest.raises(ValueError, match="samples"):
        kpm.trace_function(
            system.host_data(), sk, lambda E: E**2, order=8, scale=8.0, samples=None
        )
    with pytest.raises(ValueError, match="samples"):
        kpm.dos_kpm(
            system.host_data(), sk, [0.0], order=8, scale=8.0, samples=None
        )


def test_bf16_operator_storage_knob(monkeypatch):
    """The BODGE_OPERATOR_STORAGE=bf16 env knob routes the public moments()
    Pallas path through bf16 operator packing."""
    lattice, system = build_system((6, 3, 1), pbc=True, seed=10)
    sk = system.skeleton
    a = kpm.spectral_bound(system.host_data(), sk, impl="stencil")
    N = lattice.size
    v0 = np.zeros((N, 4, 4), dtype=system.dtype)
    v0[N // 2, np.arange(4), np.arange(4)] = 1.0

    mu32 = np.asarray(kpm.moments(system.host_data(), sk, v0, 16, a, impl="pallas"))
    monkeypatch.setenv("BODGE_OPERATOR_STORAGE", "bf16")
    mu16 = np.asarray(kpm.moments(system.host_data(), sk, v0, 16, a, impl="pallas"))
    # bf16 rounding is visible but small; exact equality would mean the
    # knob did nothing.
    drift = np.abs(mu16 - mu32).max()
    assert drift > 0
    assert drift < 3e-2 * max(1.0, np.abs(mu32).max())


@pytest.mark.parametrize(
    "shape,pbc",
    [
        ((16, 140, 1), False),
        ((16, 140, 1), True),   # periodic y exercises the dynamic-roll wrap
        ((8, 36, 4), True),     # 3D: z shifts + z wrap + y wrap (M=144, P=256)
        ((8, 130, 2), False),   # M=260 → P=384, PB=128 (three lane chunks)
    ],
)
def test_tiled_plane_cheb_matches_untiled(force_planes, monkeypatch, shape, pbc):
    """The lane-tiled fused step (large-P form) must agree with the
    untiled plane step for open AND periodic boundaries."""
    monkeypatch.setenv("BODGE_PLANE_TILED", "1")  # opt into the tiled form
    lattice, system = build_system(shape, pbc=pbc, seed=12)
    sk = system.skeleton
    K = 4
    lo = pk.plan(sk, K)
    assert lo.mode == "planes"
    P = lo.P
    assert pk._tile_plan(sk, K, P) is not None, (shape, P)
    assert pk._use_tiled_plane(sk, K, P)  # env knob active

    rng = np.random.default_rng(3)
    v = (
        rng.normal(size=(lattice.size, 4, K)) + 1j * rng.normal(size=(lattice.size, 4, K))
    ).astype(np.complex64)
    b = pk.pack_operator(system.host_data(), sk, K, layout=lo)
    vp = pk.pack_vector(v, sk, layout=lo)
    tp = jnp.asarray(rng.normal(size=np.asarray(vp).shape).astype(np.float32))
    inv = jnp.float32(0.23)

    t_tiled, pp_tiled = pk._plane_cheb_step_tiled(b, vp, tp, inv, sk, K)
    t_ref, pp_ref = pk._plane_cheb_step(b, vp, tp, inv, sk, K)
    np.testing.assert_allclose(np.asarray(t_tiled), np.asarray(t_ref), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(pp_tiled), np.asarray(pp_ref), rtol=1e-5, atol=1e-3
    )


def test_tiled_plane_dispatch(force_planes, monkeypatch):
    """chebyshev_step_pallas routes to the tiled form under the opt-in env
    knob and fused moments stay exact through it."""
    monkeypatch.setenv("BODGE_PLANE_TILED", "1")
    lattice, system = build_system((16, 140, 1), pbc=True, seed=20)
    sk = system.skeleton
    K = 4
    a = kpm.spectral_bound(system.host_data(), sk, impl="stencil")
    N = lattice.size
    v0 = np.zeros((N, 4, K), dtype=system.dtype)
    v0[N // 2, np.arange(K), np.arange(K)] = 1.0

    order = 24
    want = np.asarray(kpm.moments(system.host_data(), sk, v0, order, a, impl="stencil"))
    b = pk.pack_operator(system.host_data(), sk, K)
    vp = pk.pack_vector(v0, sk)
    got = np.asarray(
        pk.moments_pallas_fused(b, vp, sk, jnp.float32(1.0 / a), order, K)
    )
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_huge_probe_batch_chunks_through_pallas(monkeypatch):
    """LDOS-map-sized probe batches (K = 4·n_sites) must not OOM the
    kernels: plan() rejects infeasible K and moments() chunks the columns
    through the widest feasible layout (caught by examples/edge_states_map
    on real TPU: a 576-site map allocated a 90 MB Mosaic stack)."""
    monkeypatch.setenv("BODGE_PLANAR", "1")
    monkeypatch.setenv("BODGE_PALLAS_UPGRADE", "1")
    from bodge_tpu.hamiltonian import use_planar_device_path

    use_planar_device_path.cache_clear()
    try:
        lattice, system = build_system((8, 6, 1), pbc=False, seed=14)
        sk = system.skeleton
        N = lattice.size
        K = 4 * 40  # 40-site map: beyond any single-sweep layout here
        assert pk.plan(sk, K) is None or pk.plan(sk, K).mode == "flat"

        a = kpm.spectral_bound(system.host_data(), sk, impl="stencil")
        rng = np.random.default_rng(2)
        v0 = (rng.normal(size=(N, 4, K)) + 1j * rng.normal(size=(N, 4, K))).astype(
            system.dtype
        )
        got = np.asarray(kpm.moments(system.host_data(), sk, v0, 12, a, impl="pallas"))
        want = np.asarray(
            kpm.moments(system.host_data(), sk, v0, 12, a, impl="stencil")
        )
        np.testing.assert_allclose(got, want, atol=3e-4)
    finally:
        use_planar_device_path.cache_clear()


def test_plane_layout_rejects_infeasible_probe_count():
    lattice, system = build_system((24, 24, 1), pbc=False, seed=1)
    sk = system.skeleton
    assert pk.plane_layout(sk, 4) is not None
    assert pk.plane_layout(sk, 4 * 576) is None  # whole-lattice LDOS map
