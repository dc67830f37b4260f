"""Row-sharded KPM sweeps driven by the Pallas plane kernel.

[NEW SCOPE] — closes the round-1 gap where the multi-device layer only ran
the XLA einsum stencil (~0.5% of the HBM roof) while the single-device
Pallas kernel ran at ~80%: here the *same* hand-scheduled plane kernel
(:mod:`bodge_tpu.ops.pallas_spmm`) processes each device's local x-slab,
and the one plane of operand data needed from each neighbor device is
exchanged with a ``jax.lax.ppermute`` ring inside ``shard_map`` (ICI on a
pod slice, hierarchical over DCN for multi-host).

Key facts the design leans on:

- The packed plane layout ``[Lx, rows, P]`` is x-major, so a 1-D row
  partition of the lattice is a contiguous block partition of BOTH the
  packed operator and the packed vectors — no repacking at shard
  boundaries.
- The stencil needs exactly one x-plane per side per application.  The
  local slab is extended to ``v_ext[Lxl + 2]`` (halo planes at both ends)
  and the kernel reads neighbors through shifted index maps
  (:func:`bodge_tpu.ops.pallas_spmm._plane_cheb_step_halo`).
- The ``ppermute`` ring wrap delivers the global-boundary partner planes,
  so periodic and open boundaries work unmodified (open-boundary wrap
  blocks are structural zeros and annihilate the halo contribution).
- Chebyshev inner products come from the kernel's fused per-plane moment
  partials, reduced with one tiny ``psum`` per step — the vectors are
  never re-read outside the kernel.

Reference analog: none (the reference is single-process,
reference README "no support for e.g. MPI"); SURVEY §2.2 halo-exchange row.

Multi-chip latency hiding (SURVEY §7 hard part 5) — the
interior/boundary overlap split, ``overlap=True`` or ``BODGE_HALO_OVERLAP=1``:
each local step issues the ``ppermute`` first, then computes the interior
planes ``[1, Lxl−1)`` (which have no halo dependence) in one kernel call,
then the two boundary planes in two single-plane calls that consume the
arrived halos.  The interior call carries no data dependence on the
collective, so XLA's latency-hiding scheduler can run the ICI transfer
under the interior compute — on a pod this converts the halo latency from
serial overhead into overlap.  Default off: this environment has one
physical chip, where the split's extra kernel launches only cost (the
monolithic path already sustains 82–97% of the HBM roof single-chip);
correctness of the split (outputs AND gradients) is proven on the
8-virtual-device CPU mesh (tests/test_pallas_sharded.py) and exercised by
``dryrun_multichip``.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops.blocksparse import BLOCK, Skeleton
from ..ops.chebyshev import _KERNELS, chebyshev_coefficients, rademacher_probes
from ..ops.pallas_spmm import (
    pack_operator,
    pack_vector,
    plane_cheb_step_halo_ad,
    plane_layout,
    plane_spmm_halo_ad,
    unpack_vector,
)
from .sharded import AXIS, PROBE_AXIS, RowSharding


def _require_plane_shardable(rs: RowSharding, K: int):
    if rs.has_probe_axis:
        raise ValueError(
            "This Pallas sharded entry point partitions rows only; "
            "rows×probes meshes are supported by moments_sharded_pallas"
        )
    lo = plane_layout(rs.sk, K)
    if lo is None:
        # Two distinct causes (advisor finding, round 3): an unsuitable
        # lattice vs a probe count that blows the kernel's VMEM cap — the
        # latter is fixable by chunking K, so say so.
        if plane_layout(rs.sk, 1) is not None:
            raise ValueError(
                f"Pallas sharded path: probe count K={K} exceeds the plane "
                f"kernel's VMEM working-set cap for lattice shape "
                f"{tuple(rs.sk.shape)}; chunk the probe columns (the KPM "
                f"entry points do this automatically)"
            )
        raise ValueError(
            "Pallas sharded path needs a cubic lattice with Lx > 1 and Ly·Lz > 1"
        )
    return lo


def _is_packed_operator(data) -> bool:
    return data.ndim == 3 and not np.iscomplexobj(data)


def _is_packed_vector(v) -> bool:
    return v.ndim == 3 and not np.iscomplexobj(v)


def pack_operator_sharded(rs: RowSharding, data, operator_dtype=None):
    """Host ELL block data ``[N, S, 4, 4]`` → plane-packed, row-sharded
    ``[Lx, 2·S·16, P]`` on the mesh (float32, or bfloat16 operator storage
    via ``operator_dtype`` — same capacity/traffic knob as the
    single-device :func:`bodge_tpu.ops.pallas_spmm.pack_operator`)."""
    lo = _require_plane_shardable(rs, BLOCK)
    packed = pack_operator(
        np.asarray(data), rs.sk, K=lo.K, operator_dtype=operator_dtype, layout=lo
    )
    return jax.device_put(packed, NamedSharding(rs.mesh, P(AXIS)))


def pack_vector_sharded(rs: RowSharding, v):
    """Operand ``[N, 4, K]`` complex → plane-packed, row-sharded
    ``[Lx, 2·4·K, P]`` float32 on the mesh."""
    lo = _require_plane_shardable(rs, int(v.shape[-1]))
    packed = pack_vector(np.asarray(v), rs.sk, layout=lo)
    return jax.device_put(packed, NamedSharding(rs.mesh, P(AXIS)))


def _overlap_from_env() -> bool:
    """Default for the interior/boundary overlap split (see module docs)."""
    return os.environ.get("BODGE_HALO_OVERLAP") == "1"


def _resolve_overlap(overlap, Lxl: int) -> bool:
    if overlap is None:
        overlap = _overlap_from_env()
    # The split needs a non-empty interior; thin slabs use the monolithic
    # kernel (they are all boundary anyway).
    return bool(overlap) and Lxl >= 3


def _make_local_cheb_step(sk: Skeleton, K: int, Lxl: int, n_shards: int,
                          overlap: bool):
    """Per-device fused Chebyshev step closure
    ``(b_l, t_cur, t_prev, inv) → (t_next[Lxl], partials[Lxl, 2K])``.

    ``overlap=True`` is the interior/boundary split: the ppermute is issued
    first, the interior kernel (planes [1, Lxl−1)) consumes only local
    planes, and the two boundary-plane kernels consume the halos — XLA can
    schedule the collective under the interior compute.
    """
    if Lxl < 3:
        overlap = False  # no interior to overlap with
    if not overlap:
        kernel = plane_cheb_step_halo_ad(sk, K, Lxl)

        def step(b_l, t_cur, t_prev, inv):
            hm, hp = _halo_planes(t_cur, n_shards)
            return kernel(b_l, t_cur, hm, hp, t_prev, inv)

        return step

    k_int = plane_cheb_step_halo_ad(sk, K, Lxl - 2)
    k_bnd = plane_cheb_step_halo_ad(sk, K, 1)

    def step(b_l, t_cur, t_prev, inv):
        hm, hp = _halo_planes(t_cur, n_shards)  # issued before the interior
        t_int, pp_int = k_int(
            b_l[1:-1], t_cur[1:-1], t_cur[:1], t_cur[-1:], t_prev[1:-1], inv
        )
        t_lo, pp_lo = k_bnd(b_l[:1], t_cur[:1], hm, t_cur[1:2], t_prev[:1], inv)
        t_hi, pp_hi = k_bnd(
            b_l[-1:], t_cur[-1:], t_cur[-2:-1], hp, t_prev[-1:], inv
        )
        t_next = jnp.concatenate([t_lo, t_int, t_hi], axis=0)
        pp = jnp.concatenate([pp_lo, pp_int, pp_hi], axis=0)
        return t_next, pp

    return step


def _make_local_spmm(sk: Skeleton, K: int, Lxl: int, n_shards: int,
                     overlap: bool):
    """Per-device plain SpMM closure ``(b_l, v_l) → y_l`` (same split)."""
    if Lxl < 3:
        overlap = False
    if not overlap:
        kernel = plane_spmm_halo_ad(sk, K, Lxl)

        def apply(b_l, v_l):
            hm, hp = _halo_planes(v_l, n_shards)
            return kernel(b_l, v_l, hm, hp)

        return apply

    k_int = plane_spmm_halo_ad(sk, K, Lxl - 2)
    k_bnd = plane_spmm_halo_ad(sk, K, 1)

    def apply(b_l, v_l):
        hm, hp = _halo_planes(v_l, n_shards)
        y_int = k_int(b_l[1:-1], v_l[1:-1], v_l[:1], v_l[-1:])
        y_lo = k_bnd(b_l[:1], v_l[:1], hm, v_l[1:2])
        y_hi = k_bnd(b_l[-1:], v_l[-1:], v_l[-2:-1], hp)
        return jnp.concatenate([y_lo, y_int, y_hi], axis=0)

    return apply


def _halo_planes(t_local, n_shards: int):
    """Neighbor halo planes ``(hm, hp)``, each ``[1, rows, P]`` (ring
    ppermute; wrap = periodic partner).  Passed to the kernel as separate
    arrays — concatenating them onto the slab would copy the whole local
    vector every step."""
    fwd = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    bwd = [(i, (i - 1) % n_shards) for i in range(n_shards)]
    hm = lax.ppermute(t_local[-1:], AXIS, perm=fwd)
    hp = lax.ppermute(t_local[:1], AXIS, perm=bwd)
    return hm, hp


@partial(jax.jit, static_argnames=("rs", "K", "overlap"))
def _spmm_pallas_sharded_jit(rs: RowSharding, b_sh, v_sh, K: int,
                             overlap: bool = False):
    sk, n = rs.sk, rs.n_shards
    Lxl = sk.shape[0] // n

    local = _make_local_spmm(sk, K, Lxl, n, overlap)

    # check_vma=False: pallas_call outputs carry no varying-mesh-axes
    # annotation, and the kernel is manually sharded by construction.
    fn = jax.shard_map(
        local, mesh=rs.mesh, in_specs=(P(AXIS), P(AXIS)), out_specs=P(AXIS),
        check_vma=False,
    )
    return fn(b_sh, v_sh)


def spmm_sharded_pallas(rs: RowSharding, data, v, overlap: Optional[bool] = None):
    """``H @ v`` with H row-partitioned, computed by the Pallas plane kernel.

    Accepts host complex inputs (packed/sharded internally) or already
    plane-packed sharded arrays; the output matches the input form.
    ``overlap`` selects the interior/boundary halo-overlap split (default:
    the BODGE_HALO_OVERLAP env knob).
    """
    ov = _resolve_overlap(overlap, rs.sk.shape[0] // rs.n_shards)
    if _is_packed_operator(data) and _is_packed_vector(v):
        K = v.shape[1] // (2 * BLOCK)
        return _spmm_pallas_sharded_jit(rs, data, v, K, ov)
    K = int(v.shape[-1])
    lo = _require_plane_shardable(rs, K)
    b_sh = pack_operator_sharded(rs, data)
    v_sh = pack_vector_sharded(rs, v)
    y = _spmm_pallas_sharded_jit(rs, b_sh, v_sh, K, ov)
    return unpack_vector(np.asarray(y), rs.sk, K, np.asarray(data).dtype, layout=lo)


def _remat_chunk_for(order: int, remat) -> int:
    """Resolve the two-level checkpointing chunk for a moment scan.

    ``remat``: None/"auto" → √steps chunking for order ≥ 64 (the classic
    O(√n)-memory schedule: the backward stores only per-chunk boundary
    carries and recomputes inside each chunk — rematerialization trades
    FLOPs for HBM residency, the right trade on TPU); an int forces the
    chunk; 0/False disables.  Values are bit-identical either way (the
    recompute replays the same graph).
    """
    steps = max(0, (order - 1) // 2)
    if remat in (0, False):
        return 0
    if remat in (None, "auto"):
        return int(np.sqrt(steps)) if steps >= 32 else 0
    return int(remat)


def _build_local_moments(sk: Skeleton, K: int, Lxl: int, n: int,
                         order: int, overlap: bool, remat_chunk: int):
    """Per-device moment-scan closure ``(b_l, v_l, inv_l) → μ[order, K]``
    (psum over the row axis inside) — shared by the rows-only and
    rows×probes shard_maps."""
    step_fn = _make_local_cheb_step(sk, K, Lxl, n, overlap)

    def local(b_l, v_l, inv_l):
        def fused(t_cur, t_prev, step_inv):
            t_next, pp = step_fn(b_l, t_cur, t_prev, step_inv)
            sums = lax.psum(jnp.sum(pp, axis=0), AXIS)  # [2K]
            return t_next, sums[:K], sums[K:]

        # Half-scaled first step: t1 = H̃ t0, and the fused partials give
        # μ0 = ⟨t0,t0⟩, μ1 = ⟨t1,t0⟩ for free (same trick as the
        # single-device moments_pallas_fused).
        t0 = v_l
        t1, mu0, mu1 = fused(t0, jnp.zeros_like(t0), 0.5 * inv_l)
        steps = max(0, (order - 1) // 2)
        if steps == 0:
            return jnp.stack([mu0, mu1])[:order]

        def body(carry, _):
            t_prev, t_cur = carry
            t_next, cc, nc = fused(t_cur, t_prev, inv_l)
            return (t_cur, t_next), (2.0 * cc - mu0, 2.0 * nc - mu1)

        if remat_chunk and steps > remat_chunk:
            # Two-level scan with per-chunk checkpointing: reverse-mode
            # memory drops from O(steps) vector copies (34 GB at 512²,
            # order 512 — an OOM) to O(steps/chunk + chunk).  The ragged
            # tail runs as its own short scan — rounding the outer scan up
            # would silently compute (and differentiate) up to chunk−1
            # discarded SpMM sweeps (review finding).
            full = steps // remat_chunk
            rem = steps - full * remat_chunk

            @jax.checkpoint
            def chunk_body(carry, _):
                return lax.scan(body, carry, None, length=remat_chunk)

            carry, (a1, b1) = lax.scan(chunk_body, (t0, t1), None, length=full)
            alphas = a1.reshape(full * remat_chunk, K)
            betas = b1.reshape(full * remat_chunk, K)
            if rem:
                _, (a2, b2) = lax.scan(body, carry, None, length=rem)
                alphas = jnp.concatenate([alphas, a2], axis=0)
                betas = jnp.concatenate([betas, b2], axis=0)
        else:
            (_, _), (alphas, betas) = lax.scan(body, (t0, t1), None, length=steps)
        rest = jnp.stack([alphas, betas], axis=1).reshape(2 * steps, K)
        return jnp.concatenate([mu0[None], mu1[None], rest], axis=0)[:order]

    return local


@partial(jax.jit, static_argnames=("rs", "order", "K", "overlap", "remat_chunk"))
def _moments_pallas_sharded_jit(rs: RowSharding, b_sh, v0_sh, inv, order: int,
                                K: int, overlap: bool = False,
                                remat_chunk: int = 0):
    sk, n = rs.sk, rs.n_shards
    Lxl = sk.shape[0] // n
    local = _build_local_moments(sk, K, Lxl, n, order, overlap, remat_chunk)
    fn = jax.shard_map(
        local, mesh=rs.mesh, in_specs=(P(AXIS), P(AXIS), P()), out_specs=P(),
        check_vma=False,
    )
    return fn(b_sh, v0_sh, jnp.asarray(inv, jnp.float32))


@partial(jax.jit, static_argnames=("rs", "order", "K", "overlap", "remat_chunk"))
def _moments_pallas_sharded2d_jit(rs: RowSharding, b_sh, v_blk, inv, order: int,
                                  K: int, overlap: bool = False,
                                  remat_chunk: int = 0):
    """Rows×probes mesh: probe-column chunks ride the second mesh axis.

    ``v_blk: [probe_shards, Lx, 8K, P]`` sharded ``P(PROBE_AXIS, AXIS)``;
    the operator is replicated over probes.  Each probe shard runs the
    identical row-sharded kernel sweep on its K-column chunk (probe
    chunks are independent, so the only collective along PROBE_AXIS is
    the output concatenation)."""
    sk, n = rs.sk, rs.n_shards
    Lxl = sk.shape[0] // n
    local = _build_local_moments(sk, K, Lxl, n, order, overlap, remat_chunk)

    def local2(b_l, v_l, inv_l):
        return local(b_l, v_l[0], inv_l)[:, None, :]  # [order, 1, K]

    fn = jax.shard_map(
        local2, mesh=rs.mesh,
        in_specs=(P(AXIS), P(PROBE_AXIS, AXIS), P()),
        out_specs=P(None, PROBE_AXIS),
        check_vma=False,
    )
    mu = fn(b_sh, v_blk, jnp.asarray(inv, jnp.float32))  # [order, ps, K]
    return mu.reshape(order, -1)


def moments_sharded_pallas(rs: RowSharding, data, v0, order: int, scale: float,
                           overlap: Optional[bool] = None, remat="auto"):
    """Chebyshev moments ``μ_m[k]`` with the row-sharded Pallas kernel.

    ``data`` may be host complex ELL data or a pre-packed sharded operator;
    likewise ``v0``.  Moments are exact (packing is a permutation plus zero
    padding, and the kernel's fused partials are the same inner products).
    ``overlap`` selects the interior/boundary halo-overlap split (default:
    the BODGE_HALO_OVERLAP env knob); ``remat`` the reverse-mode
    checkpointing chunk ("auto" = √steps at order ≥ 64 — keeps gradient
    memory O(√order) instead of O(order) vector copies; bit-identical).
    """
    ov = _resolve_overlap(overlap, rs.sk.shape[0] // rs.n_shards)
    if rs.has_probe_axis:
        # Rows×probes mesh: probe-column chunks are data-parallel over the
        # second axis; each chunk is packed at its own width and the
        # operator is packed once, replicated over probes.
        if _is_packed_operator(data) or _is_packed_vector(v0):
            raise ValueError(
                "rows×probes mesh: pass host complex data and v0 "
                "(per-chunk packing happens internally)"
            )
        ps = int(dict(zip(rs.mesh.axis_names, rs.mesh.devices.shape))[PROBE_AXIS])
        K = int(v0.shape[-1])
        if K % ps:
            raise ValueError(
                f"probe count K={K} must divide evenly over {ps} probe shards"
            )
        Kl = K // ps
        lo = plane_layout(rs.sk, Kl)
        if lo is None:
            raise ValueError(
                f"Pallas sharded path: per-shard probe count {Kl} has no "
                f"feasible plane layout for lattice shape {tuple(rs.sk.shape)}"
            )
        b = pack_operator(np.asarray(data), rs.sk, K=Kl, layout=lo)
        b_sh = jax.device_put(b, NamedSharding(rs.mesh, P(AXIS)))
        v0h = np.asarray(v0)
        chunks = np.stack([
            np.asarray(pack_vector(v0h[..., i * Kl : (i + 1) * Kl], rs.sk, layout=lo))
            for i in range(ps)
        ])
        v_sh = jax.device_put(chunks, NamedSharding(rs.mesh, P(PROBE_AXIS, AXIS)))
        return _moments_pallas_sharded2d_jit(
            rs, b_sh, v_sh, 1.0 / scale, order, Kl, ov,
            _remat_chunk_for(order, remat),
        )
    if _is_packed_operator(data):
        b_sh = data
    else:
        b_sh = pack_operator_sharded(rs, data)
    if _is_packed_vector(v0):
        v_sh = v0
        K = v0.shape[1] // (2 * BLOCK)
    else:
        K = int(v0.shape[-1])
        v_sh = pack_vector_sharded(rs, v0)
    return _moments_pallas_sharded_jit(
        rs, b_sh, v_sh, 1.0 / scale, order, K, ov, _remat_chunk_for(order, remat)
    )


@partial(jax.jit, static_argnames=("rs", "steps", "K", "overlap"))
def chebyshev_scan_sharded(rs: RowSharding, b_sh, v_sh, inv, steps: int, K: int,
                           overlap: bool = False):
    """``steps`` fused Chebyshev steps over the row-sharded kernel; returns
    the final packed local-slab vector (sharded).

    One halo exchange + one kernel pass per step — the sustained-throughput
    workhorse (bench) and the building block for Chebyshev time evolution.
    ``overlap=True`` uses the interior/boundary halo-overlap split.
    """
    sk, n = rs.sk, rs.n_shards
    Lxl = sk.shape[0] // n

    step_fn = _make_local_cheb_step(sk, K, Lxl, n, overlap)

    def local(b_l, v_l, inv_l):
        def step(carry, _):
            t_prev, t_cur = carry
            t_next, _pp = step_fn(b_l, t_cur, t_prev, inv_l)
            return (t_cur, t_next), None

        (_, out), _ = lax.scan(step, (v_l, v_l), None, length=steps)
        return out

    fn = jax.shard_map(
        local, mesh=rs.mesh, in_specs=(P(AXIS), P(AXIS), P()), out_specs=P(AXIS),
        check_vma=False,
    )
    return fn(b_sh, v_sh, jnp.asarray(inv, jnp.float32))


def free_energy_kpm_sharded_pallas(
    rs: RowSharding,
    data,
    temperature: float,
    scale: float,
    order: int = 512,
    samples: int = 64,
    key=None,
    kernel: str = "jackson",
) -> float:
    """Row-partitioned KPM free energy through the Pallas plane kernel.

    Same estimator as :func:`bodge_tpu.parallel.free_energy_kpm_sharded`
    (identical probes for identical keys), but every SpMM runs in the
    hand-scheduled kernel — the fast multi-chip sweep workhorse.
    """
    T = float(temperature)
    if T < 0:
        raise ValueError("Expected non-negative temperature!")
    if T == 0:
        g = lambda E: -np.abs(E) / 2
    else:
        g = lambda E: -np.abs(E) / 2 - T * np.log1p(np.exp(-np.abs(E) / T))

    coeffs = chebyshev_coefficients(lambda x: g(scale * x), order)
    coeffs = coeffs * _KERNELS[kernel](order)

    z = rademacher_probes(rs.sk.n_sites, samples, key, np.complex64)
    mu = moments_sharded_pallas(rs, data, z, order, scale)  # [order, samples]
    est = float(jnp.dot(jnp.asarray(coeffs, jnp.float32), jnp.sum(mu, axis=1)))
    return 0.5 * est / samples


def ldos_kpm_sharded_pallas(
    rs: RowSharding,
    data,
    site_indices,
    energies,
    order: int = 512,
    kernel: str = "jackson",
    scale: float = None,
):
    """Batched KPM LDOS at ``site_indices`` through the row-sharded Pallas
    kernel — the multi-chip form of
    :func:`bodge_tpu.ops.chebyshev.ldos_kpm_sites` (same probes, same
    reconstruction; all 4·n_sites orbital probes ride one sharded sweep).
    Returns ``[n_sites, n_energies]`` (electron component)."""
    from ..ops.chebyshev import ldos_from_moments, ldos_site_probes, spectral_bound

    if scale is None:
        if _is_packed_operator(data):
            raise ValueError(
                "scale= is required with a pre-packed operator (the spectral "
                "bound needs the complex ELL data; compute it once before "
                "packing, or pass the host data here)"
            )
        scale = float(spectral_bound(data, rs.sk, impl="stencil"))
    site_indices = np.asarray(site_indices, dtype=np.int64)
    # Probe columns are independent; chunk large maps so the kernel's
    # per-step VMEM working set stays feasible (K = 4·n_sites grows with
    # the map — see pallas_spmm.PLANE_KERNEL_VMEM_CAP).  Chunk width is
    # chosen like chebyshev.moments does — the widest feasible of
    # (8, 4, 2, 1) sites per sweep (advisor finding: a hardcoded 8 hit the
    # VMEM cap on very wide planes and raised a misleading error).
    for chunk_sites in (8, 4, 2, 1):
        if plane_layout(rs.sk, BLOCK * chunk_sites) is not None:
            break
    else:
        chunk_sites = 0
    if chunk_sites == 0 or plane_layout(rs.sk, BLOCK * chunk_sites) is None:
        # Even one site (K=4) blows the plane kernel's VMEM budget — say
        # so instead of letting the downstream sweep raise a generic
        # lattice-shape error (advisor finding).
        raise ValueError(
            f"ldos_kpm_sharded_pallas declined: even a single-site probe "
            f"chunk (K=4) exceeds the plane kernel's VMEM working-set cap "
            f"for lattice shape {tuple(rs.sk.shape)}"
        )
    # Pack the operator once for all chunks (advisor finding: packing +
    # device_put per 8-site chunk made large maps pay a full host pack and
    # transfer per 32 probe columns).
    b_sh = data if _is_packed_operator(data) else pack_operator_sharded(rs, data)
    rows = []
    for i0 in range(0, len(site_indices), chunk_sites):
        part = site_indices[i0 : i0 + chunk_sites]
        v0 = ldos_site_probes(rs.sk.n_sites, part, np.complex64)
        mu = moments_sharded_pallas(rs, b_sh, v0, order, scale)
        rows.append(ldos_from_moments(mu, energies, scale, kernel, len(part)))
    return np.concatenate(rows, axis=0)


def dos_kpm_sharded_pallas(
    rs: RowSharding,
    data,
    energies,
    order: int = 512,
    kernel: str = "jackson",
    scale: float = None,
    samples: int = 16,
    key=None,
):
    """Total density of states via the row-sharded Pallas KPM sweep — the
    multi-chip form of :func:`bodge_tpu.ops.chebyshev.dos_kpm` (same
    Rademacher probes for identical keys, same reconstruction).  Completes
    the sharded observable set: SpMM, moments, free energy, LDOS, DOS."""
    from ..ops.chebyshev import reconstruct_density, spectral_bound

    if scale is None:
        if _is_packed_operator(data):
            raise ValueError(
                "scale= is required with a pre-packed operator (compute the "
                "spectral bound once before packing, or pass the host data)"
            )
        scale = float(spectral_bound(data, rs.sk, impl="stencil"))
    z = rademacher_probes(rs.sk.n_sites, samples, key, np.complex64, default_seed=1)
    mu = moments_sharded_pallas(rs, data, z, order, scale)  # [order, samples]
    mu_tr = jnp.sum(mu, axis=1) / samples
    energies = np.array(energies, dtype=float)
    x = np.clip(energies / scale, -0.999999, 0.999999)
    dens = reconstruct_density(mu_tr[:, None], jnp.asarray(x), scale, kernel=kernel)
    return np.asarray(dens[:, 0])
