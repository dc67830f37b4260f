"""Pallas TPU kernel for the block-stencil SpMM.

This is the hand-scheduled native tier of the framework (the reference has
no native code to mirror — SURVEY §2; Pallas kernels are this environment's
equivalent).  Motivation: the XLA roll-einsum stencil
(:func:`bodge_tpu.ops.spmm.spmm_stencil`) re-reads the operand vector once
per slot (up to 7×); this kernel streams the block data once and the
operand ~3× (previous/current/next x-plane), cutting HBM traffic — the
binding resource, since 4×4 blocks are far below MXU size and the kernel
is bandwidth-bound by construction.

Design
------
- **Packed layout.**  Complex data is split into float32 re/im planes and
  laid out with the lattice plane dimension last (lanes):
  ``B: [Lx, 2·S·16, P]``, ``v: [Lx, 2·4·K, P]`` with ``P = pad(Ly·Lz, 128)``.
  Packing happens once per operator (and once per Chebyshev *sweep*, not
  per step) — inner products are invariant under the packing permutation
  and its zero padding, so whole KPM scans can run in packed space.
- **Grid over x-planes.**  Program *i* receives the block plane for x=i
  plus the operand planes for x−1, x, x+1 (index maps with modular wrap:
  the ring wrap *is* the periodic boundary link; open boundaries have zero
  wrap blocks, annihilating the halo contribution).
- **In-plane shifts.**  ±y (and ±z) neighbor access is a lane roll plus a
  boundary-select against the wrap roll, so periodic wrap stays exact
  under zero padding.
- **Complex arithmetic** is four real broadcast-FMA streams on the VPU.

Currently specialized to 2D lattices (Lz == 1, the headline benchmark
shape); other shapes fall back to the XLA stencil via :func:`supported`.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .blocksparse import BLOCK, Skeleton


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def supported(sk: Skeleton) -> bool:
    """Whether the Pallas kernel covers this skeleton.

    Requires the cubic stencil structure, ≥2 x-planes (the grid axis) and a
    non-trivial in-plane extent (1D chains fall back to the XLA stencil —
    a 1-lane plane would waste 127/128 of the VPU).
    """
    Lx, Ly, Lz = sk.shape
    return sk.stencil and Lx > 1 and Ly * Lz > 1


@dataclass(frozen=True, eq=False)
class PackedStencil:
    """Host-side metadata for the packed kernel layout."""

    sk: Skeleton
    K: int
    P: int  # padded plane size (lanes)

    @property
    def shape3(self) -> Tuple[int, int, int]:
        return self.sk.shape


def pack_operator(data, sk: Skeleton):
    """ELL block data ``[N, S, 4, 4]`` → packed ``[Lx, 2·S·16, P]`` float32.

    Host NumPy input is split into re/im planes on the host — the packed
    path must never put a complex buffer on backends without complex
    support (the point of the packed representation).
    """
    Lx, Ly, Lz = sk.shape
    S = sk.n_slots
    P = _round_up(Ly * Lz, 128)
    if isinstance(data, np.ndarray):
        d = data.reshape(Lx, Ly * Lz, S, BLOCK, BLOCK)
        d = np.moveaxis(d, 1, -1)
        out = np.zeros((Lx, 2, S, BLOCK, BLOCK, P), dtype=np.float32)
        out[:, 0, ..., : Ly * Lz] = d.real
        out[:, 1, ..., : Ly * Lz] = d.imag
        return jnp.asarray(out.reshape(Lx, 2 * S * BLOCK * BLOCK, P))
    d = data.reshape(Lx, Ly * Lz, S, BLOCK, BLOCK)
    d = jnp.moveaxis(d, 1, -1)  # [Lx, S, 4, 4, plane]
    out = jnp.zeros((Lx, 2, S, BLOCK, BLOCK, P), dtype=jnp.float32)
    out = out.at[:, 0, :, :, :, : Ly * Lz].set(jnp.real(d).astype(jnp.float32))
    out = out.at[:, 1, :, :, :, : Ly * Lz].set(jnp.imag(d).astype(jnp.float32))
    return out.reshape(Lx, 2 * S * BLOCK * BLOCK, P)


def pack_vector(v, sk: Skeleton):
    """Operand ``[N, 4, K]`` complex → packed ``[Lx, 2·4·K, P]`` float32."""
    Lx, Ly, Lz = sk.shape
    K = v.shape[-1]
    P = _round_up(Ly * Lz, 128)
    if isinstance(v, np.ndarray):
        v3 = np.moveaxis(v.reshape(Lx, Ly * Lz, BLOCK, K), 1, -1)
        out = np.zeros((Lx, 2, BLOCK, K, P), dtype=np.float32)
        out[:, 0, ..., : Ly * Lz] = v3.real
        out[:, 1, ..., : Ly * Lz] = v3.imag
        return jnp.asarray(out.reshape(Lx, 2 * BLOCK * K, P))
    v3 = v.reshape(Lx, Ly * Lz, BLOCK, K)
    v3 = jnp.moveaxis(v3, 1, -1)  # [Lx, 4, K, plane]
    out = jnp.zeros((Lx, 2, BLOCK, K, P), dtype=jnp.float32)
    out = out.at[:, 0, :, :, : Ly * Lz].set(jnp.real(v3).astype(jnp.float32))
    out = out.at[:, 1, :, :, : Ly * Lz].set(jnp.imag(v3).astype(jnp.float32))
    return out.reshape(Lx, 2 * BLOCK * K, P)


def unpack_vector(vp, sk: Skeleton, K: int, dtype):
    """Inverse of :func:`pack_vector`."""
    Lx, Ly, Lz = sk.shape
    P = vp.shape[-1]
    v = vp.reshape(Lx, 2, BLOCK, K, P)[..., : Ly * Lz]
    v = jnp.moveaxis(v, -1, 1)  # [Lx, plane, 2, 4, K]
    cplx = v[:, :, 0].astype(dtype) + 1j * v[:, :, 1].astype(dtype)
    return cplx.reshape(Lx * Ly * Lz, BLOCK, K).astype(dtype)


def _stencil_kernel(sk: Skeleton, K: int, P: int, b_ref, vm_ref, vc_ref, vp_ref, y_ref):
    """One x-plane of the stencil product, all slots, complex via re/im."""
    Lx, Ly, Lz = sk.shape
    S = sk.n_slots
    n_real = Ly * Lz  # == Ly for the 2D specialization

    b = b_ref[0].reshape(2, S, BLOCK, BLOCK, P)
    vc = vc_ref[0].reshape(2, BLOCK, K, P)
    vm = vm_ref[0].reshape(2, BLOCK, K, P)
    vp = vp_ref[0].reshape(2, BLOCK, K, P)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)

    def roll_lanes(x, shift):
        # pltpu.roll requires non-negative shifts; −s ≡ P−s over the padded
        # circular axis.
        return pltpu.roll(x, shift % P, 1)

    def shifted_plane(v, axis, d):
        """In-plane neighbor values with exact periodic wrap.

        The plane is flattened as p = y·Lz + z: a y-shift is a lane roll by
        ±Lz and a z-shift a roll by ±1, each exact away from its own
        boundary; boundary lanes take a wrap roll instead (select), which
        keeps periodic links exact even under zero padding.
        """
        flat = v.reshape(2 * BLOCK * K, P)
        if axis == 1:  # y: stride-Lz roll
            main = roll_lanes(flat, -d * Lz)
            wrap = roll_lanes(flat, d * (Ly - 1) * Lz)
            boundary = (col >= (Ly - 1) * Lz) if d > 0 else (col < Lz)
        else:  # z: unit roll within each y-cell
            main = roll_lanes(flat, -d)
            wrap = roll_lanes(flat, d * (Lz - 1))
            boundary = (col % Lz == Lz - 1) if d > 0 else (col % Lz == 0)
        out = jnp.where(boundary, wrap, main)
        return out.reshape(2, BLOCK, K, P)

    acc_re = jnp.zeros((BLOCK, K, P), dtype=jnp.float32)
    acc_im = jnp.zeros((BLOCK, K, P), dtype=jnp.float32)

    for s, (axis, d) in enumerate(sk.slots):
        if axis < 0:
            src = vc
        elif axis == 0:
            src = vp if d > 0 else vm
        else:  # axis 1 or 2: in-plane lane shift
            src = shifted_plane(vc, axis, d)

        br, bi = b[0, s], b[1, s]  # [4, 4, P]
        sr, si = src[0], src[1]  # [4, K, P]
        # y[a] += Σ_b B[a,b] · v[b]  (complex, broadcast over K and lanes)
        acc_re = acc_re + jnp.sum(
            br[:, :, None, :] * sr[None, :, :, :] - bi[:, :, None, :] * si[None, :, :, :],
            axis=1,
        )
        acc_im = acc_im + jnp.sum(
            br[:, :, None, :] * si[None, :, :, :] + bi[:, :, None, :] * sr[None, :, :, :],
            axis=1,
        )

    y = jnp.stack([acc_re, acc_im]).reshape(1, 2 * BLOCK * K, P)
    y_ref[...] = y


@functools.partial(jax.jit, static_argnames=("sk", "K"))
def spmm_pallas_packed(b_packed, v_packed, sk: Skeleton, K: int):
    """Packed-layout stencil SpMM: ``[Lx, 2·4K, P] → [Lx, 2·4K, P]``."""
    Lx, Ly, Lz = sk.shape
    S = sk.n_slots
    P = b_packed.shape[-1]

    grid = (Lx,)
    b_spec = pl.BlockSpec((1, 2 * S * 16, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    vm_spec = pl.BlockSpec(
        (1, 2 * BLOCK * K, P), lambda i: ((i - 1) % Lx, 0, 0), memory_space=pltpu.VMEM
    )
    vc_spec = pl.BlockSpec((1, 2 * BLOCK * K, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    vp_spec = pl.BlockSpec(
        (1, 2 * BLOCK * K, P), lambda i: ((i + 1) % Lx, 0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec((1, 2 * BLOCK * K, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    bytes_moved = (b_packed.size + 4 * v_packed.size) * 4
    return pl.pallas_call(
        functools.partial(_stencil_kernel, sk, K, P),
        grid=grid,
        in_specs=[b_spec, vm_spec, vc_spec, vp_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(v_packed.shape, jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * sk.nnz_blocks * BLOCK * BLOCK * K * 4,
            bytes_accessed=bytes_moved,
            transcendentals=0,
        ),
        # Mosaic compiles only on TPU; elsewhere (CPU parity tests) run the
        # kernel in the interpreter for bit-level validation.
        interpret=jax.default_backend() != "tpu",
    )(b_packed, v_packed, v_packed, v_packed)


def _chebyshev_step_kernel(
    sk: Skeleton, K: int, P: int, b_ref, vm_ref, vc_ref, vp_ref, tp_ref, inv_ref,
    y_ref, pp_ref
):
    """One x-plane of a fused Chebyshev step + moment partials.

    Computes ``t_next = 2·inv·(H t_cur) − t_prev`` for the plane AND the
    plane's contributions to the doubled-moment inner products
    ``⟨t_cur, t_cur⟩`` and ``⟨t_next, t_cur⟩`` — so a KPM moment sweep needs
    no additional reads of the vectors outside this kernel.
    """
    Lx, Ly, Lz = sk.shape
    S = sk.n_slots

    b = b_ref[0].reshape(2, S, BLOCK, BLOCK, P)
    vc = vc_ref[0].reshape(2, BLOCK, K, P)
    vm = vm_ref[0].reshape(2, BLOCK, K, P)
    vp = vp_ref[0].reshape(2, BLOCK, K, P)
    tp = tp_ref[0].reshape(2, BLOCK, K, P)
    inv = inv_ref[0, 0]

    col = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)

    def roll_lanes(x, shift):
        return pltpu.roll(x, shift % P, 1)

    def shifted_plane(v, axis, d):
        flat = v.reshape(2 * BLOCK * K, P)
        if axis == 1:
            main = roll_lanes(flat, -d * Lz)
            wrap = roll_lanes(flat, d * (Ly - 1) * Lz)
            boundary = (col >= (Ly - 1) * Lz) if d > 0 else (col < Lz)
        else:
            main = roll_lanes(flat, -d)
            wrap = roll_lanes(flat, d * (Lz - 1))
            boundary = (col % Lz == Lz - 1) if d > 0 else (col % Lz == 0)
        out = jnp.where(boundary, wrap, main)
        return out.reshape(2, BLOCK, K, P)

    acc_re = jnp.zeros((BLOCK, K, P), dtype=jnp.float32)
    acc_im = jnp.zeros((BLOCK, K, P), dtype=jnp.float32)

    for s, (axis, d) in enumerate(sk.slots):
        if axis < 0:
            src = vc
        elif axis == 0:
            src = vp if d > 0 else vm
        else:
            src = shifted_plane(vc, axis, d)

        br, bi = b[0, s], b[1, s]
        sr, si = src[0], src[1]
        acc_re = acc_re + jnp.sum(
            br[:, :, None, :] * sr[None, :, :, :] - bi[:, :, None, :] * si[None, :, :, :],
            axis=1,
        )
        acc_im = acc_im + jnp.sum(
            br[:, :, None, :] * si[None, :, :, :] + bi[:, :, None, :] * sr[None, :, :, :],
            axis=1,
        )

    t_next = jnp.stack(
        [2.0 * inv * acc_re - tp[0], 2.0 * inv * acc_im - tp[1]]
    )  # [2, 4, K, P]
    y_ref[...] = t_next.reshape(1, 2 * BLOCK * K, P)

    # Moment partials for this plane: rows 0..K-1 = ⟨t_cur,t_cur⟩ per probe,
    # rows K..2K-1 = ⟨t_next,t_cur⟩ per probe (zero-padded lanes contribute 0).
    cc = jnp.sum(vc[0] * vc[0] + vc[1] * vc[1], axis=(0, 2))  # [K]
    nc = jnp.sum(t_next[0] * vc[0] + t_next[1] * vc[1], axis=(0, 2))  # [K]
    pp = jnp.zeros((1, 1, 128), dtype=jnp.float32)
    pp = pp.at[0, 0, :K].set(cc).at[0, 0, K : 2 * K].set(nc)
    pp_ref[...] = pp


@functools.partial(jax.jit, static_argnames=("sk", "K"))
def chebyshev_step_pallas(b_packed, t_cur, t_prev, inv, sk: Skeleton, K: int):
    """Fused packed Chebyshev step: returns ``(t_next, partials[Lx, 2K])``.

    ``partials[:, :K].sum(0)`` = ⟨t_cur,t_cur⟩ and ``partials[:, K:].sum(0)``
    = ⟨t_next,t_cur⟩ per probe column — the two reductions the doubled-
    moment recursion needs, at zero extra HBM traffic.
    """
    Lx, Ly, Lz = sk.shape
    S = sk.n_slots
    P = b_packed.shape[-1]

    grid = (Lx,)
    b_spec = pl.BlockSpec((1, 2 * S * 16, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    vm_spec = pl.BlockSpec(
        (1, 2 * BLOCK * K, P), lambda i: ((i - 1) % Lx, 0, 0), memory_space=pltpu.VMEM
    )
    vc_spec = pl.BlockSpec((1, 2 * BLOCK * K, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    vp_spec = pl.BlockSpec(
        (1, 2 * BLOCK * K, P), lambda i: ((i + 1) % Lx, 0, 0), memory_space=pltpu.VMEM
    )
    tp_spec = pl.BlockSpec((1, 2 * BLOCK * K, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    inv_spec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    out_specs = (
        pl.BlockSpec((1, 2 * BLOCK * K, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    )

    bytes_moved = (b_packed.size + 3 * t_cur.size + 2 * t_prev.size) * 4
    inv_arr = jnp.asarray(inv, jnp.float32).reshape(1, 1)
    t_next, pp = pl.pallas_call(
        functools.partial(_chebyshev_step_kernel, sk, K, P),
        grid=grid,
        in_specs=[b_spec, vm_spec, vc_spec, vp_spec, tp_spec, inv_spec],
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct(t_cur.shape, jnp.float32),
            jax.ShapeDtypeStruct((Lx, 1, 128), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * sk.nnz_blocks * BLOCK * BLOCK * K * 4,
            bytes_accessed=bytes_moved,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(b_packed, t_cur, t_cur, t_cur, t_prev, inv_arr)
    return t_next, pp.reshape(Lx, 128)[:, : 2 * K]


@functools.partial(jax.jit, static_argnames=("sk", "order", "K"))
def moments_pallas_fused(b_packed, v0_packed, sk: Skeleton, inv, order: int, K: int):
    """KPM moments with the fused step kernel: per Chebyshev order, ONE
    kernel pass computes t_next and both inner products — the minimum-
    traffic formulation of the doubled-moment recursion."""
    Lx = v0_packed.shape[0]
    P = v0_packed.shape[-1]

    def inner(a, b):
        a4 = a.reshape(Lx, 2, BLOCK, K, P)
        b4 = b.reshape(Lx, 2, BLOCK, K, P)
        return jnp.sum(a4 * b4, axis=(0, 1, 2, 4))

    inv_f = jnp.asarray(inv, jnp.float32)
    t0 = v0_packed
    t1, _ = chebyshev_step_pallas(b_packed, t0, jnp.zeros_like(t0), 0.5 * inv_f, sk, K)
    mu0 = inner(v0_packed, t0)
    mu1 = inner(v0_packed, t1)

    steps = max(0, (order - 2 + 1) // 2)
    if steps == 0:
        return jnp.stack([mu0, mu1])[:order]

    def step(carry, _):
        t_prev, t_cur = carry
        t_next, pp = chebyshev_step_pallas(b_packed, t_cur, t_prev, inv_f, sk, K)
        cc = jnp.sum(pp[:, :K], axis=0)
        nc = jnp.sum(pp[:, K:], axis=0)
        alpha = 2.0 * cc - mu0
        beta = 2.0 * nc - mu1
        return (t_cur, t_next), (alpha, beta)

    (_, _), (alphas, betas) = jax.lax.scan(step, (t0, t1), None, length=steps)
    rest = jnp.stack([alphas, betas], axis=1).reshape(2 * steps, K)
    return jnp.concatenate([mu0[None], mu1[None], rest], axis=0)[:order]


def spmm_pallas(data, sk: Skeleton, v):
    """Drop-in SpMM via the Pallas kernel (packs/unpacks per call).

    For repeated application (Chebyshev scans) use :func:`pack_operator` /
    :func:`pack_vector` once and call :func:`spmm_pallas_packed` inside the
    loop instead — packing costs one pass over the data.
    """
    if not supported(sk):
        from .spmm import spmm_stencil

        return spmm_stencil(data, sk, v)
    K = v.shape[-1]
    b_packed = pack_operator(data, sk)
    v_packed = pack_vector(v, sk)
    y_packed = spmm_pallas_packed(b_packed, v_packed, sk, K)
    return unpack_vector(y_packed, sk, K, data.dtype)
