"""Pallas TPU kernels for the block-stencil SpMM.

This is the hand-scheduled native tier of the framework (the reference has
no native code to mirror — SURVEY §2; Pallas kernels are this environment's
equivalent).  Motivation: the XLA roll-einsum stencil
(:func:`bodge_tpu.ops.spmm.spmm_stencil`) re-reads the operand vector once
per slot (up to 7×); these kernels stream the block data exactly once —
the binding resource, since 4×4 blocks are far below MXU size and the
kernel is bandwidth-bound by construction.

Two layouts, chosen automatically per (skeleton, K) by :func:`plan`:

- **Flat resident-vector layout** (primary, small/medium N).  The operand
  is packed as float32 re/im rows over a single *flat site-index lane
  axis*: ``v: [2·4·K, L]`` with guard bands, and the block data as
  ``B: [2·S·16, nb·T]``.  The whole vector stays VMEM-resident across the
  grid (constant index map); the grid streams B in lane chunks of ``T``.
  Every stencil neighbor is a dynamic lane-slice of the resident vector at
  offset ±1/±Lz/±Ly·Lz, with periodic wrap handled by masked slices at the
  wrap offset.  Properties: zero lane padding beyond one 128-tile, B read
  exactly once, operand read ~once, works for any lattice shape (1D/2D/3D,
  open or periodic).  HBM traffic per pass ≈ ``|B| + 3·|v|`` (Chebyshev
  step) — the minimum the recursion admits.
- **Plane layout** (fallback, large N).  Lanes = one x-plane padded to 128
  (``P = pad(Ly·Lz)``), grid over x-planes, halo planes via modular index
  maps, in-plane neighbors via lane rolls.  Used when the vector no longer
  fits in VMEM.

Complex arithmetic is four real broadcast-FMA streams on the VPU.
Inner products are invariant under both packings (permutation + zero
padding), so whole KPM scans run in packed space; packing costs one pass
per *sweep*, not per step.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .blocksparse import BLOCK, Skeleton


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _interpret() -> bool:
    # Mosaic compiles only on TPU; elsewhere (CPU parity tests) run kernels
    # in the interpreter for bit-level validation.
    return jax.default_backend() != "tpu"


# ===========================================================================
# Layout planning.
# ===========================================================================
# VMEM is ~16 MiB/core; keep the resident vector well under half so the
# streamed B chunks can double-buffer comfortably.
FLAT_VECTOR_VMEM_MAX = 7 * 2**20
FLAT_CHUNK = 2048  # lane-chunk target for the flat layout
# Mosaic's default scoped-VMEM limit is a conservative 16 MiB; the flat
# kernel's resident vector is double-buffered by the pipeline, so allow more.
VMEM_LIMIT = 32 * 2**20


@dataclass(frozen=True)
class Layout:
    """Packing plan for a (skeleton, K) pair."""

    mode: str  # "flat" | "planes"
    K: int
    # Flat-mode parameters.
    T: int = 0  # lane chunk
    G: int = 0  # guard lanes each side (multiple of T)
    nb: int = 0  # grid size (lane chunks)
    L: int = 0  # total lanes of the packed vector
    # Plane-mode parameter.
    P: int = 0  # padded plane size


# The plane kernel overtakes the flat resident-vector kernel once the
# lattice is large enough to amortize its per-plane pipeline and its x
# extent is sublane-aligned (measured, docs/perf_notes.md: 128² planes
# 15.3 µs vs flat 22.8; 200² 58.5 vs 62.0; but 64² flat 6.8 vs 9.1).
PLANE_PREFERRED_MIN_SITES = 16384


def plan(sk: Skeleton, K: int) -> Optional[Layout]:
    """Choose the kernel layout for this skeleton and probe count."""
    if not sk.stencil:
        return None
    Lx, Ly, Lz = sk.shape
    N = sk.n_sites
    M = Ly * Lz

    if Lx % 8 == 0 and N >= PLANE_PREFERRED_MIN_SITES:
        lo = plane_layout(sk, K)
        if lo is not None:
            return lo

    T = min(FLAT_CHUNK, _round_up(N, 128))
    if M <= T:
        nb = -(-N // T)
        G = 2 * T  # ≥ T + M: every masked wrap slice stays in range
        L = nb * T + 2 * G
        v_bytes = 2 * BLOCK * K * L * 4
        if v_bytes <= FLAT_VECTOR_VMEM_MAX:
            return Layout(mode="flat", K=K, T=T, G=G, nb=nb, L=L)

    return plane_layout(sk, K)


# Per-plane working-set cap for the plane kernels: the fused step holds
# operator rows plus several [·, 2K·4, P] vector intermediates live, so a
# large probe count K can blow the kernel's scoped-VMEM stack even at one
# plane per grid step (observed: a 576-site LDOS map, K=2304, OOMs Mosaic
# with a 90 MB stack).  The 4× factor is a margin for the live
# intermediates; past the cap callers fall back or chunk the probe
# columns (chebyshev.moments does this automatically).
PLANE_KERNEL_VMEM_CAP = 24 * 2**20


def plane_layout(sk: Skeleton, K: int) -> Optional[Layout]:
    """The plane layout for this skeleton, regardless of size heuristics.

    Used directly by the row-sharded path (x-slabs are sequences of planes,
    so the plane layout is the only one that shards along x) and by tests
    that force plane-mode coverage on small lattices.  Returns None when
    the probe count K makes the kernel's VMEM working set infeasible.
    """
    if not sk.stencil:
        return None
    Lx, Ly, Lz = sk.shape
    M = Ly * Lz
    if Lx > 1 and M > 1:
        P = _round_up(M, 128)
        rows = 2 * sk.n_slots * 16 + 4 * (2 * BLOCK * K) + _pp_rows(K)
        if rows * P * 4 * 4 > PLANE_KERNEL_VMEM_CAP:
            return None
        return Layout(mode="planes", K=K, P=P)
    return None


def supported(sk: Skeleton, K: int = 4) -> bool:
    """Whether a Pallas kernel covers this skeleton (at probe count K)."""
    return plan(sk, K) is not None


def decline_reason(sk: Skeleton, K: int = 4) -> Optional[str]:
    """Why ``plan(sk, K)`` declines, or None when the kernel covers it.

    Distinguishes the two causes (advisor finding, round 3): a non-stencil
    skeleton has no Pallas kernel at all, while a stencil skeleton can
    still be declined when the probe count blows the plane kernel's
    scoped-VMEM working-set cap — the latter is fixable by chunking K.
    """
    if plan(sk, K) is not None:
        return None
    if not sk.stencil:
        return (
            "the skeleton is not a cubic-lattice stencil (generic / "
            "FrozenLattice skeletons run on the XLA gather path)"
        )
    return (
        f"probe count K={K} exceeds the plane kernel's VMEM working-set "
        f"cap for lattice shape {tuple(sk.shape)} (chunk the probe columns)"
    )


# ===========================================================================
# Flat layout: packing.
# ===========================================================================
def _pack_operator_flat(data, sk: Skeleton, lo: Layout, dtype=np.float32):
    """ELL block data ``[N, S, 4, 4]`` → ``[2·S·16, nb·T]`` in ``dtype``
    (float32, or bfloat16 for the half-traffic operator storage)."""
    N, S = sk.cols.shape
    W = lo.nb * lo.T
    if isinstance(data, np.ndarray):
        d = np.moveaxis(data, 0, -1)  # [S, 4, 4, N]
        out = np.zeros((2, S, BLOCK, BLOCK, W), dtype=np.float32)
        out[0, ..., :N] = d.real
        out[1, ..., :N] = d.imag
        packed = out.reshape(2 * S * BLOCK * BLOCK, W)
        return jnp.asarray(packed).astype(dtype)
    d = jnp.moveaxis(data, 0, -1)
    out = jnp.zeros((2, S, BLOCK, BLOCK, W), dtype=jnp.float32)
    out = out.at[0, ..., :N].set(jnp.real(d).astype(jnp.float32))
    out = out.at[1, ..., :N].set(jnp.imag(d).astype(jnp.float32))
    return out.reshape(2 * S * BLOCK * BLOCK, W).astype(dtype)


def _pack_vector_flat(v, sk: Skeleton, lo: Layout):
    """Operand ``[N, 4, K]`` complex → ``[4·2·K, L]`` float32 (guarded).

    Row order is **orbital-major** ``(b, re/im, k)``: the kernel's inner
    FMAs then address one orbital's ``[2K, T]`` slice as contiguous,
    8-aligned sublanes — the layout that lets every multiply-accumulate be
    a same-shape vreg op (the VPU's full-rate path).
    """
    N = sk.n_sites
    K = v.shape[-1]
    G, L = lo.G, lo.L
    if isinstance(v, np.ndarray):
        vv = np.moveaxis(v, 0, -1)  # [4, K, N]
        out = np.zeros((BLOCK, 2, K, L), dtype=np.float32)
        out[:, 0, :, G : G + N] = vv.real
        out[:, 1, :, G : G + N] = vv.imag
        return jnp.asarray(out.reshape(BLOCK * 2 * K, L))
    vv = jnp.moveaxis(v, 0, -1)
    out = jnp.zeros((BLOCK, 2, K, L), dtype=jnp.float32)
    out = out.at[:, 0, :, G : G + N].set(jnp.real(vv).astype(jnp.float32))
    out = out.at[:, 1, :, G : G + N].set(jnp.imag(vv).astype(jnp.float32))
    return out.reshape(BLOCK * 2 * K, L)


def _unpack_vector_flat(vp, sk: Skeleton, K: int, dtype, lo: Layout):
    # Host-side when concrete: complex arithmetic is unsupported on some
    # TPU backends (the packed representation exists precisely to avoid it
    # on device).  Under a jit trace, stay in jnp.
    N = sk.n_sites
    xp = jnp if isinstance(vp, jax.core.Tracer) else np
    v = (vp if xp is jnp else np.asarray(vp)).reshape(BLOCK, 2, K, lo.L)
    v = v[..., lo.G : lo.G + N]
    cplx = v[:, 0].astype(dtype) + 1j * v[:, 1].astype(dtype)
    return xp.moveaxis(cplx, -1, 0).astype(dtype)  # [N, 4, K]


# ===========================================================================
# Flat layout: kernels.
# ===========================================================================
def _flat_sources(sk: Skeleton, lo: Layout, v_ref, i):
    """Yield (slot, src) pairs: the stencil-shifted operand per slot.

    Mosaic requires lane-slice starts to be provably 128-aligned, so all
    reads are *aligned* dynamic windows (block-index × T) combined with
    *static* in-window offsets:

    - one 3T window centred on the chunk serves the diagonal, every main
      shift, and the y/z periodic wraps (all offsets are within ±M ≤ T);
    - each x periodic wrap (offset ±(Lx−1)·M, far outside the window) is
      an aligned 2T window at the statically-known residue.

    Periodic wrap is a masked select; open boundaries need no special
    case — their wrap blocks are structural zeros, so whatever the main
    slice reads there is annihilated.  Guard bands (G = 2T ≥ T + M) keep
    every window in range; the block-index clip is belt-and-braces for
    don't-care chunks far from a boundary.
    """
    Lx, Ly, Lz = sk.shape
    M = Ly * Lz
    T, G, L = lo.T, lo.G, lo.L
    Lb = L // T
    g = G // T

    # Aligned T windows around this chunk; all in-window shifts are then
    # cheap lane rolls + boundary selects (measured ~free on the VPU,
    # unlike unaligned lane slices, which relayout catastrophically).
    prv = v_ref[:, pl.ds((i - 1) * T, T)]
    vc = v_ref[:, pl.ds(i * T, T)]
    nxt = v_ref[:, pl.ds((i + 1) * T, T)]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    p = (i - g) * T + lane  # global site id per lane

    def shifted(off):
        """Values at site p+off (static |off| ≤ T): roll + neighbor spill."""
        if off == 0:
            return vc
        if off > 0:
            main = pltpu.roll(vc, T - off, 1)
            spill = pltpu.roll(nxt, T - off, 1)
            return jnp.where(lane < T - off, main, spill)
        o = -off
        main = pltpu.roll(vc, o, 1)
        spill = pltpu.roll(prv, o, 1)
        return jnp.where(lane >= o, main, spill)

    def far(off_w):
        """Values at site p+off_w for arbitrary static off_w: aligned 2T
        window + in-window roll by the static residue."""
        r = off_w % T
        blocks = jnp.clip(i + (off_w - r) // T, 0, Lb - 2)
        win = v_ref[:, pl.ds(blocks * T, 2 * T)]
        return pltpu.roll(win, (2 * T - r) % (2 * T), 1)[:, :T]

    for s, (axis, d) in enumerate(sk.slots):
        if axis < 0:  # diagonal
            yield s, vc
            continue
        if axis == 0:
            main = shifted(d * M)
            wrap = far(-d * (Lx - 1) * M)
            mask = (p >= (Lx - 1) * M) if d > 0 else (p < M)
        elif axis == 1:
            main = shifted(d * Lz)
            wrap = shifted(-d * (Ly - 1) * Lz)
            q = p % M
            mask = (q >= (Ly - 1) * Lz) if d > 0 else (q < Lz)
        else:
            main = shifted(d)
            wrap = shifted(-d * (Lz - 1))
            q = p % Lz
            mask = (q == Lz - 1) if d > 0 else (q == 0)
        yield s, jnp.where(mask, wrap, main)


def _flat_matvec(sk: Skeleton, lo: Layout, b_ref, v_ref, i):
    """acc = (H v) for one lane chunk.

    Returns (``accs``: list of BLOCK arrays ``[2K, T]`` — output rows per
    orbital ``a`` in (re/im, k) order — and ``vc``: the chunk's own operand
    values ``[4·2K, T]``).

    Formulation: every B entry is one sublane row ``[1, T]`` broadcast
    against the orbital slice ``u = v[b] : [2K, T]`` — the [1,T]-row
    broadcast is free on the VPU, and both FMAs are full-rate same-shape
    vreg ops.  The complex cross terms come from one signed half-swap of
    ``u`` per (slot, b): ``usw = [−x_im; x_re]``, so

        acc_a += Re(B[a,b])·u + Im(B[a,b])·usw
               = [Re(B)x_re − Im(B)x_im ; Re(B)x_im + Im(B)x_re]  ✓
    """
    S = sk.n_slots
    K, T = lo.K, lo.T
    # B may be stored bf16 (half HBM traffic); compute is always f32.
    bb = b_ref[...].astype(jnp.float32)  # [2·S·16, T]; row = ri·(16S) + s·16 + a·4 + c

    accs = [jnp.zeros((2 * K, T), dtype=jnp.float32) for _ in range(BLOCK)]
    vc = None
    for s, src in _flat_sources(sk, lo, v_ref, i):
        if s == 0:
            vc = src
        sv = src.reshape(BLOCK, 2 * K, T)
        for c in range(BLOCK):
            u = sv[c]  # [2K, T] = [x_re(K); x_im(K)]
            usw = jnp.concatenate([-u[K:], u[:K]], axis=0)
            for a in range(BLOCK):
                wr = bb[s * 16 + a * BLOCK + c][None]  # [1, T]
                wi = bb[16 * S + s * 16 + a * BLOCK + c][None]
                accs[a] = accs[a] + wr * u + wi * usw
    return accs, vc


def _flat_spmm_kernel(sk: Skeleton, lo: Layout, b_ref, v_ref, y_ref):
    # The grid covers the guard blocks too (zero-filled): every block of the
    # output buffer must be written, or uninitialized guard memory (possibly
    # NaN bit patterns) would poison downstream packed inner products.
    i = pl.program_id(0)
    g = lo.G // lo.T
    is_guard = jnp.logical_or(i < g, i >= lo.nb + g)

    @pl.when(is_guard)
    def _():
        y_ref[...] = jnp.zeros(y_ref.shape, jnp.float32)

    @pl.when(jnp.logical_not(is_guard))
    def _():
        accs, _ = _flat_matvec(sk, lo, b_ref, v_ref, i)
        y_ref[...] = jnp.concatenate(accs, axis=0)  # rows (a, re/im, k)


def _pp_rows(K: int) -> int:
    """Sublane rows of the per-chunk moment-partial output (8-aligned)."""
    return _round_up(2 * K, 8)


def _flat_cheb_kernel(sk: Skeleton, lo: Layout, b_ref, v_ref, tp_ref, inv_ref, y_ref, pp_ref):
    """Fused Chebyshev step + per-chunk moment partials.

    ``t_next = 2·inv·(H t_cur) − t_prev`` for the chunk AND the chunk's
    contributions to ⟨t_cur,t_cur⟩ / ⟨t_next,t_cur⟩ — so a KPM moment
    sweep needs no reads of the vectors outside this kernel.

    The partials stay *per-lane* (``[2K, T]`` rows: cc then nc): cross-lane
    reductions are slow on the VPU, so the final lane sum happens outside
    the kernel on a tiny array (measured: the in-kernel lane reduction was
    ~2× the whole kernel's runtime).
    """
    K, T = lo.K, lo.T
    i = pl.program_id(0)
    g = lo.G // T
    is_guard = jnp.logical_or(i < g, i >= lo.nb + g)

    @pl.when(is_guard)
    def _():
        y_ref[...] = jnp.zeros(y_ref.shape, jnp.float32)
        pp_ref[...] = jnp.zeros(pp_ref.shape, jnp.float32)

    @pl.when(jnp.logical_not(is_guard))
    def _():
        accs, vc = _flat_matvec(sk, lo, b_ref, v_ref, i)
        tp = tp_ref[...].reshape(BLOCK, 2 * K, T)
        inv = inv_ref[0, 0]
        two_inv = 2.0 * inv
        t_next = jnp.concatenate(
            [two_inv * accs[a] - tp[a] for a in range(BLOCK)], axis=0
        )  # [4·2K, T], rows (a, re/im, k)
        y_ref[...] = t_next

        v4 = vc.reshape(BLOCK, 2, K, T)
        n4 = t_next.reshape(BLOCK, 2, K, T)
        cc = jnp.sum(v4 * v4, axis=(0, 1))  # [K, T] lane partials ⟨t_cur,t_cur⟩
        nc = jnp.sum(n4 * v4, axis=(0, 1))  # [K, T] lane partials ⟨t_next,t_cur⟩
        rows = _pp_rows(K)
        pads = [jnp.zeros((rows - 2 * K, T), jnp.float32)] if rows > 2 * K else []
        pp_ref[...] = jnp.concatenate([cc, nc] + pads, axis=0).reshape(1, rows, T)


def _flat_specs(sk: Skeleton, lo: Layout):
    S = sk.n_slots
    K, T, G, nb = lo.K, lo.T, lo.G, lo.nb
    g = G // T  # guard blocks each side

    # Guard grid steps clamp to an adjacent interior B block — consecutive
    # duplicate indices are not re-fetched, so the zero-fill steps are free.
    def b_map(i):
        return (0, jnp.clip(i - g, 0, nb - 1))

    b_spec = pl.BlockSpec((2 * S * 16, T), b_map, memory_space=pltpu.VMEM)
    # Constant index map: the operand vector is fetched once and stays
    # VMEM-resident across the whole grid.
    v_spec = pl.BlockSpec((2 * BLOCK * K, lo.L), lambda i: (0, 0), memory_space=pltpu.VMEM)
    # Grid step i handles lane block i of the guarded array directly
    # (interior blocks are g..g+nb−1, guard blocks are zero-filled).
    chunk_spec = pl.BlockSpec((2 * BLOCK * K, T), lambda i: (0, i), memory_space=pltpu.VMEM)
    return b_spec, v_spec, chunk_spec


@functools.partial(jax.jit, static_argnames=("sk", "K"))
def _flat_spmm(b_packed, v_packed, sk: Skeleton, K: int):
    lo = plan(sk, K)
    b_spec, v_spec, chunk_spec = _flat_specs(sk, lo)
    bytes_moved = b_packed.size * b_packed.dtype.itemsize + 2 * v_packed.size * 4
    return pl.pallas_call(
        functools.partial(_flat_spmm_kernel, sk, lo),
        grid=(lo.L // lo.T,),
        in_specs=[b_spec, v_spec],
        out_specs=chunk_spec,
        out_shape=jax.ShapeDtypeStruct(v_packed.shape, jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * sk.nnz_blocks * BLOCK * BLOCK * K * 4,
            bytes_accessed=bytes_moved,
            transcendentals=0,
        ),
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT
        ),
    )(b_packed, v_packed)


@functools.partial(jax.jit, static_argnames=("sk", "K"))
def _flat_cheb_step(b_packed, t_cur, t_prev, inv, sk: Skeleton, K: int):
    lo = plan(sk, K)
    n_steps = lo.L // lo.T
    rows = _pp_rows(K)
    b_spec, v_spec, chunk_spec = _flat_specs(sk, lo)
    inv_spec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    pp_spec = pl.BlockSpec((1, rows, lo.T), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    inv_arr = jnp.asarray(inv, jnp.float32).reshape(1, 1)
    bytes_moved = b_packed.size * b_packed.dtype.itemsize + 3 * t_cur.size * 4
    t_next, pp = pl.pallas_call(
        functools.partial(_flat_cheb_kernel, sk, lo),
        grid=(n_steps,),
        in_specs=[b_spec, v_spec, chunk_spec, inv_spec],
        out_specs=(chunk_spec, pp_spec),
        out_shape=(
            jax.ShapeDtypeStruct(t_cur.shape, jnp.float32),
            jax.ShapeDtypeStruct((n_steps, rows, lo.T), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * sk.nnz_blocks * BLOCK * BLOCK * K * 4,
            bytes_accessed=bytes_moved,
            transcendentals=0,
        ),
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT
        ),
    )(b_packed, t_cur, t_prev, inv_arr)
    # Final lane reduction of the per-lane partials in XLA (tiny array).
    return t_next, jnp.sum(pp[:, : 2 * K, :], axis=-1)


# ===========================================================================
# Plane layout (fallback for vectors too large to keep VMEM-resident).
# ===========================================================================
def _pack_operator_planes(data, sk: Skeleton, lo: Layout, dtype=np.float32):
    """ELL block data ``[N, S, 4, 4]`` → packed ``[Lx, 2·S·16, P]`` in
    ``dtype`` (float32, or bfloat16 for half-traffic operator storage — the
    kernel upcasts blocks to f32 on load, so accumulation precision is
    unchanged)."""
    import ml_dtypes

    Lx, Ly, Lz = sk.shape
    S = sk.n_slots
    P = lo.P
    np_dtype = np.float32 if dtype in (np.float32, jnp.float32) else ml_dtypes.bfloat16
    if isinstance(data, np.ndarray):
        d = data.reshape(Lx, Ly * Lz, S, BLOCK, BLOCK)
        d = np.moveaxis(d, 1, -1)
        out = np.zeros((Lx, 2, S, BLOCK, BLOCK, P), dtype=np_dtype)
        out[:, 0, ..., : Ly * Lz] = d.real.astype(np_dtype)
        out[:, 1, ..., : Ly * Lz] = d.imag.astype(np_dtype)
        return jnp.asarray(out.reshape(Lx, 2 * S * BLOCK * BLOCK, P))
    d = data.reshape(Lx, Ly * Lz, S, BLOCK, BLOCK)
    d = jnp.moveaxis(d, 1, -1)  # [Lx, S, 4, 4, plane]
    jdt = jnp.float32 if np_dtype is np.float32 else jnp.bfloat16
    out = jnp.zeros((Lx, 2, S, BLOCK, BLOCK, P), dtype=jdt)
    out = out.at[:, 0, :, :, :, : Ly * Lz].set(jnp.real(d).astype(jdt))
    out = out.at[:, 1, :, :, :, : Ly * Lz].set(jnp.imag(d).astype(jdt))
    return out.reshape(Lx, 2 * S * BLOCK * BLOCK, P)


def plane_packed_insert_swave(b_packed, delta_real, sk: Skeleton):
    """Insert a REAL on-site s-wave field Δ_i·jσ2 directly into a
    plane-packed operator ``[Lx, 2·S·16, P]`` — complex-free and traceable.

    The packed-space equivalent of
    :func:`bodge_tpu.models.selfconsistency.data_with_onsite_swave` for a
    real gap field: with jσ2 = [[0,1],[-1,0]] the pairing block Δ·jσ2 and
    its Hermitian partner are purely real, so the insertion touches only
    the re-plane rows of the diagonal slot (slot 0).  This is what lets
    the self-consistency loop run end-to-end on backends without complex
    support (the axon TPU tunnel): the traced graph never materializes a
    complex array.  All eight pairing positions are written (zeros
    included), matching the wholesale sub-block ``.set`` of the complex
    path.  Differentiable in ``delta_real``.
    """
    Lx, Ly, Lz = sk.shape
    M = Ly * Lz
    S = sk.n_slots
    P = b_packed.shape[-1]
    d = jnp.reshape(delta_real.astype(jnp.float32), (Lx, M))
    if P > M:
        d = jnp.pad(d, ((0, 0), (0, P - M)))
    z = jnp.zeros_like(d)
    b = b_packed.reshape(Lx, 2, S, BLOCK, BLOCK, P)
    # blk = Δ·jσ2 at rows 0:2 × cols 2:4; blkH at rows 2:4 × cols 0:2.
    for reim, a, cb, val in (
        (0, 0, 2, z), (0, 0, 3, d), (0, 1, 2, -d), (0, 1, 3, z),
        (0, 2, 0, z), (0, 2, 1, -d), (0, 3, 0, d), (0, 3, 1, z),
        (1, 0, 2, z), (1, 0, 3, z), (1, 1, 2, z), (1, 1, 3, z),
        (1, 2, 0, z), (1, 2, 1, z), (1, 3, 0, z), (1, 3, 1, z),
    ):
        b = b.at[:, reim, 0, a, cb].set(val.astype(b.dtype))
    return b.reshape(Lx, 2 * S * BLOCK * BLOCK, P)


def plane_packed_insert_bond(b_packed, m, sk: Skeleton, struct):
    """Insert a REAL bond-singlet pairing field into a plane-packed
    operator ``[Lx, 2·S·16, P]`` — complex-free and traceable.

    Generalizes :func:`plane_packed_insert_swave` to *every* slot:
    ``m: [N, S]`` (real, traced) holds the pairing amplitude per
    (row, slot) — zero for slots the field does not touch — and
    ``struct: [S, 2, 2]`` (host complex constants) the per-slot singlet
    structure, e.g. ±jσ2 for the d_{x²−y²} form factor.  The Hermitian
    partner blocks use struct[trans_slot[s]]† so the inserted operator is
    exactly Hermitian for any symmetric ``m``.  All pairing sub-block
    positions are (over)written.  Differentiable in ``m``; the traced
    graph stays real, which is what lets d-wave gap equations run on TPU
    backends without complex support.
    """
    Lx, Ly, Lz = sk.shape
    M = Ly * Lz
    S = sk.n_slots
    P = b_packed.shape[-1]
    struct = np.asarray(struct, np.complex128)
    structH = np.conj(np.swapaxes(struct[np.asarray(sk.trans_slot)], -1, -2))

    mm = jnp.moveaxis(jnp.reshape(m.astype(jnp.float32), (Lx, M, S)), 1, -1)
    if P > M:
        mm = jnp.pad(mm, ((0, 0), (0, 0), (0, P - M)))  # [Lx, S, P]
    b = b_packed.reshape(Lx, 2, S, BLOCK, BLOCK, P)
    for s in range(S):
        ms = mm[:, s]
        for a in range(2):
            for cb in range(2):
                b = b.at[:, 0, s, a, 2 + cb].set(
                    (ms * float(struct[s, a, cb].real)).astype(b.dtype)
                )
                b = b.at[:, 1, s, a, 2 + cb].set(
                    (ms * float(struct[s, a, cb].imag)).astype(b.dtype)
                )
                b = b.at[:, 0, s, 2 + a, cb].set(
                    (ms * float(structH[s, a, cb].real)).astype(b.dtype)
                )
                b = b.at[:, 1, s, 2 + a, cb].set(
                    (ms * float(structH[s, a, cb].imag)).astype(b.dtype)
                )
    return b.reshape(Lx, 2 * S * BLOCK * BLOCK, P)


def _pack_vector_planes(v, sk: Skeleton, lo: Layout):
    """Operand ``[N, 4, K]`` complex → packed ``[Lx, 4·2·K, P]`` float32.

    Row order is **orbital-major** ``(b, re/im, k)`` — the same order as the
    flat layout: each orbital's ``2K`` rows are contiguous, so with K=4 an
    orbital slice ``[XB, 2K, P]`` is whole (8,128) sublane tiles and every
    kernel FMA runs at full VPU rate.  (The previous ``(re/im, b, k)`` order
    forced half-tile ``[XB, K, P]`` operands — measured 49% vs 80% of the
    HBM roof against the flat kernel on identical work.)
    """
    Lx, Ly, Lz = sk.shape
    K = v.shape[-1]
    P = lo.P
    if isinstance(v, np.ndarray):
        v3 = np.moveaxis(v.reshape(Lx, Ly * Lz, BLOCK, K), 1, -1)  # [Lx, 4, K, plane]
        out = np.zeros((Lx, BLOCK, 2, K, P), dtype=np.float32)
        out[:, :, 0, :, : Ly * Lz] = v3.real
        out[:, :, 1, :, : Ly * Lz] = v3.imag
        return jnp.asarray(out.reshape(Lx, BLOCK * 2 * K, P))
    v3 = v.reshape(Lx, Ly * Lz, BLOCK, K)
    v3 = jnp.moveaxis(v3, 1, -1)  # [Lx, 4, K, plane]
    out = jnp.zeros((Lx, BLOCK, 2, K, P), dtype=jnp.float32)
    out = out.at[:, :, 0, :, : Ly * Lz].set(jnp.real(v3).astype(jnp.float32))
    out = out.at[:, :, 1, :, : Ly * Lz].set(jnp.imag(v3).astype(jnp.float32))
    return out.reshape(Lx, BLOCK * 2 * K, P)


def _unpack_vector_planes(vp, sk: Skeleton, K: int, dtype, lo: Layout):
    Lx, Ly, Lz = sk.shape
    P = vp.shape[-1]
    xp = jnp if isinstance(vp, jax.core.Tracer) else np
    v = (vp if xp is jnp else np.asarray(vp)).reshape(Lx, BLOCK, 2, K, P)
    v = v[..., : Ly * Lz]
    v = xp.moveaxis(v, -1, 1)  # [Lx, plane, 4, 2, K]
    cplx = v[:, :, :, 0].astype(dtype) + 1j * v[:, :, :, 1].astype(dtype)
    return cplx.reshape(Lx * Ly * Lz, BLOCK, K).astype(dtype)


def _pick_xb(Lx: int, S: int, K: int, P: int, vmem_budget: int = 20 * 2**20) -> int:
    """Planes per grid step for the blocked plane kernels.

    One plane per step makes the pipeline overhead dominate at large Lx
    (measured 17% of roof at 1000×1000 vs 79% for the flat layout), so we
    process XB planes per step.  XB must divide Lx (the circular ±x index
    maps and the in-block shift-by-concat are only exact without padding),
    and the per-step working set (operator + 3 vector blocks + outputs,
    double-buffered) must fit comfortably in VMEM.

    Preference order is measured, not monotone (scripts/_planebench.py sweep on
    the 1000×1000 config): a SUBLANE-TILE-ALIGNED leading block dim wins
    decisively — XB=8 runs at 89% of the traffic roof vs 62% at XB=5 and
    71% at XB=10 (unaligned leading dims fragment both the DMAs and the
    vreg tiling), and even sizes beat odd (XB=10 at 67% > XB=4 at 61% >
    XB=5 at 57%).  So: 8 first (the measured optimum), then the larger
    multiple of 8, then even sizes largest-first, then odd — within the
    VMEM budget.
    """
    step_rows = 2 * S * 16 + 4 * (2 * BLOCK * K) + _pp_rows(K)
    for xb in (8, 16, 14, 12, 10, 6, 4, 2, 7, 5, 3):
        if Lx % xb == 0 and 2 * xb * step_rows * P * 4 <= vmem_budget:
            return xb
    return 1


def _shifted_plane_rows(sk: Skeleton, P: int, flat, col, axis: int, d: int):
    """In-plane neighbor values with exact periodic wrap, on [rows, P].

    The plane is flattened as p = y·Lz + z: a y-shift is a lane roll by
    ±Lz and a z-shift a roll by ±1, each exact away from its own boundary;
    boundary lanes take a wrap roll instead (select), which keeps periodic
    links exact even under zero padding.  ``pltpu.roll`` requires
    non-negative shifts; −s ≡ P−s over the padded circular axis.
    """
    _, Ly, Lz = sk.shape
    if axis == 1:  # y: stride-Lz roll
        main = pltpu.roll(flat, (-d * Lz) % P, 1)
        wrap = pltpu.roll(flat, (d * (Ly - 1) * Lz) % P, 1)
        boundary = (col >= (Ly - 1) * Lz) if d > 0 else (col < Lz)
    else:  # z: unit roll within each y-cell
        main = pltpu.roll(flat, (-d) % P, 1)
        wrap = pltpu.roll(flat, (d * (Lz - 1)) % P, 1)
        boundary = (col % Lz == Lz - 1) if d > 0 else (col % Lz == 0)
    return jnp.where(boundary, wrap, main)


def _plane_stencil_body(sk: Skeleton, K: int, P: int, XB: int, bload, vm, vc, vp):
    """Stencil product for a block of XB x-planes (re/im f32 arithmetic).

    All operands stay in their packed row layouts — ``vc: [XB, 4·2K, P]``
    (the block's own planes, rows orbital-major ``(b, re/im, k)``),
    ``vm``/``vp: [1, 4·2K, P]`` (one halo plane per side) — and the operator
    is read row-by-row through ``bload(c, s, a, bb) → [XB, P]``.  Multi-axis
    reshapes of the big operator block make Mosaic materialize retiled
    copies on the kernel stack (41 MB of scoped VMEM at P=1024, XB=4 — an
    OOM); row slicing keeps every temporary at one vreg-shaped array.

    Complex cross terms use the flat kernel's half-swap formulation: per
    source orbital ``u = [x_re(K); x_im(K)] : [XB, 2K, P]`` (whole sublane
    tiles at K=4) and ``usw = [−x_im; x_re]``, so

        acc_a += Re(B[a,b])·u + Im(B[a,b])·usw
               = [Re·x_re − Im·x_im ; Re·x_im + Im·x_re]  ✓

    — two full-rate same-shape FMAs per (slot, b, a), against the previous
    four half-tile ``[XB, K, P]`` FMAs (measured 49% → full-tile v2 of the
    plane kernel; the flat kernel with this structure runs at 80% of roof).
    Returns ``[XB, 4·2K, P]`` in the same row order.
    """
    R2 = 2 * K
    Rv = BLOCK * R2
    col = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)

    # ±x neighbors of every plane in the block: interior planes shift
    # within the block (sublane-axis concat), edge planes take the halo.
    if XB > 1:
        v_xm = jnp.concatenate([vm, vc[: XB - 1]], axis=0)
        v_xp = jnp.concatenate([vc[1:], vp], axis=0)
    else:
        v_xm, v_xp = vm, vp

    def sources():
        for s, (axis, d) in enumerate(sk.slots):
            if axis < 0:
                yield s, vc
            elif axis == 0:
                yield s, (v_xp if d > 0 else v_xm)
            else:  # axis 1 or 2: in-plane lane shift (collapse is layout-free)
                flat = vc.reshape(XB * Rv, P)
                yield s, _shifted_plane_rows(sk, P, flat, col, axis, d).reshape(
                    XB, Rv, P
                )

    # Row order of the packed layout: (a, re/im, k).
    return _accumulate_slots(sk, K, P, XB, bload, sources())  # [XB, 4·2K, P]


def _bload_from_ref(b_ref, sk: Skeleton):
    """Operator row reader: packed row index is ((c·S + s)·4 + a)·4 + bb."""
    S = sk.n_slots

    def bload(c, s, a, bb):
        r = ((c * S + s) * BLOCK + a) * BLOCK + bb
        return b_ref[:, r, :].astype(jnp.float32)

    return bload


def _accumulate_slots(sk: Skeleton, K: int, W: int, XB: int, bload, sources):
    """The shared full-tile FMA loop over stencil slots.

    ``sources``: iterable of ``(slot, src[XB, 4·2K, W])``; ``bload(c, s, a,
    cb) → [XB, W]``.  Returns ``[XB, 4·2K, W]`` in row order (a, re/im, k).
    See :func:`_plane_stencil_body` for the half-swap complex formulation.
    """
    R2 = 2 * K
    accs = [jnp.zeros((XB, R2, W), dtype=jnp.float32) for _ in range(BLOCK)]
    for s, src in sources:
        for bb in range(BLOCK):
            u = src[:, bb * R2 : (bb + 1) * R2, :]
            usw = jnp.concatenate([-u[:, K:], u[:, :K]], axis=1)
            for a in range(BLOCK):
                wr = bload(0, s, a, bb)[:, None, :]
                wi = bload(1, s, a, bb)[:, None, :]
                accs[a] = accs[a] + wr * u + wi * usw
    return jnp.concatenate(accs, axis=1)


# ---------------------------------------------------------------------------
# Lane-tiled plane form (large P).
# ---------------------------------------------------------------------------
# EXPERIMENTAL (opt-in via BODGE_PLANE_TILED=1) — kept with its tests as
# a documented investigation, not the default.  Hypothesis at the time:
# the size-dependent efficiency drop of the untiled kernel (94.8% of the
# traffic roof at P=512 → 53.6% at P=1024, same minutes) was per-step
# VMEM pressure degrading the double-buffered pipeline; this form bounds
# VMEM by adding a second grid axis over PB-lane chunks of each plane
# while keeping the sublane-aligned XB=8 x-block (in-plane shifts read a
# 128-lane neighbor chunk per side; the periodic y-wrap is rebuilt from
# the plane's edge chunks with one dynamic lane roll).  The interleaved
# A/B (scripts/_abtest2.py) FALSIFIED the hypothesis: tiled runs ~10% slower
# than untiled in both f32 and bf16 at 1000×1000 (per-step VMEM was not
# the bottleneck; the lane-tiled B fetches fragment the DMA stream).
# See docs/perf_notes.md for the full campaign.

TILE_PB_TARGET = 512
# Double-buffered per-step budget the untiled kernel must exceed before
# the tiled form takes over (empirically ~16 MiB VMEM minus scratch).
TILE_VMEM_BUDGET = 13 * 2**20
_TILE_C = 128  # neighbor/wrap chunk lanes (the lane-tile granule)


def _tile_plan(sk: Skeleton, K: int, P: int) -> Optional[Tuple[int, int]]:
    """``(XB, PB)`` for the lane-tiled plane kernel, or None if it does
    not apply (non-stencil, Lx not 8-divisible, in-plane shifts or the
    wrap bands exceeding the 128-lane chunks, or no proper PB divisor)."""
    Lx, Ly, Lz = sk.shape
    M = Ly * Lz
    if not sk.stencil or Lx % 8 != 0:
        return None
    if Lz > _TILE_C - (P - M):  # wrap band must stay inside the edge chunk
        return None
    for PB in range(min(P - _TILE_C, TILE_PB_TARGET), _TILE_C - 1, -_TILE_C):
        if P % PB == 0:
            return 8, PB
    return None


def _plane_cheb_kernel_tiled(
    sk: Skeleton, K: int, P: int, XB: int, PB: int,
    b_ref, vm_ref, vc_ref, vp_ref, vl_ref, vr_ref, w0_ref, wL_ref,
    tp_ref, inv_ref, y_ref, pp_ref,
):
    Lx, Ly, Lz = sk.shape
    C = _TILE_C
    NC = P // C
    Rv = 2 * BLOCK * K
    j = pl.program_id(1)
    vc = vc_ref[...]
    vl = vl_ref[...]
    vr = vr_ref[...]
    col = j * PB + jax.lax.broadcasted_iota(jnp.int32, (1, PB), 1)  # global plane lane

    if XB > 1:
        v_xm = jnp.concatenate([vm_ref[...], vc[: XB - 1]], axis=0)
        v_xp = jnp.concatenate([vc[1:], vp_ref[...]], axis=0)
    else:
        v_xm, v_xp = vm_ref[...], vp_ref[...]

    def shifted(off):
        """Value at plane lane col+off (static |off| ≤ C): static lane
        concat of the chunk with the matching edge of a neighbor chunk."""
        if off == 0:
            return vc
        if off > 0:
            return jnp.concatenate([vc[:, :, off:], vr[:, :, :off]], axis=-1)
        o = -off
        return jnp.concatenate([vl[:, :, C - o :], vc[:, :, : PB - o]], axis=-1)

    def ywrap(d):
        """Periodic-y partner values: lane q reads plane[q − d·(Ly−1)·Lz],
        whose source band lives in the plane's first (d>0) / last (d<0)
        C-lane chunk; place it with one dynamic lane roll."""
        src = w0_ref[...] if d > 0 else wL_ref[...]
        if PB > C:
            src = jnp.concatenate(
                [src, jnp.zeros((XB, Rv, PB - C), jnp.float32)], axis=-1
            )
        if d > 0:
            r = ((Ly - 1) * Lz - j * PB) % PB
        else:
            r = (-(j * PB + (Ly - 1) * Lz - (NC - 1) * C)) % PB
        return pltpu.roll(src, r, 2)

    def sources():
        for s, (axis, d) in enumerate(sk.slots):
            if axis < 0:
                yield s, vc
            elif axis == 0:
                yield s, (v_xp if d > 0 else v_xm)
            elif axis == 1:
                main = shifted(d * Lz)
                wrap = ywrap(d)
                mask = (col >= (Ly - 1) * Lz) if d > 0 else (col < Lz)
                yield s, jnp.where(mask, wrap, main)
            else:
                main = shifted(d)
                wrap = shifted(-d * (Lz - 1))
                qz = col % Lz
                mask = (qz == Lz - 1) if d > 0 else (qz == 0)
                yield s, jnp.where(mask, wrap, main)

    hv = _accumulate_slots(sk, K, PB, XB, _bload_from_ref(b_ref, sk), sources())
    _cheb_tail(sk, K, PB, XB, hv, vc, tp_ref[...], inv_ref[0, 0], y_ref, pp_ref)


@functools.partial(jax.jit, static_argnames=("sk", "K"))
def _plane_cheb_step_tiled(b_packed, t_cur, t_prev, inv, sk: Skeleton, K: int):
    """Lane-tiled fused Chebyshev step (same contract as
    :func:`_plane_cheb_step`): ``(t_next, partials[Lx, 2K])``."""
    Lx, Ly, Lz = sk.shape
    S = sk.n_slots
    P = b_packed.shape[-1]
    XB, PB = _tile_plan(sk, K, P)
    C = _TILE_C
    NC = P // C
    ratio = PB // C
    NBl = P // PB
    Rv = 2 * BLOCK * K
    rows = _pp_rows(K)

    grid = (Lx // XB, NBl)
    vmem = pltpu.VMEM
    b_spec = pl.BlockSpec((XB, 2 * S * 16, PB), lambda i, j: (i, 0, j), memory_space=vmem)
    vc_spec = pl.BlockSpec((XB, Rv, PB), lambda i, j: (i, 0, j), memory_space=vmem)
    vm_spec = pl.BlockSpec((1, Rv, PB), lambda i, j: ((XB * i - 1) % Lx, 0, j), memory_space=vmem)
    vp_spec = pl.BlockSpec((1, Rv, PB), lambda i, j: ((XB * i + XB) % Lx, 0, j), memory_space=vmem)
    vl_spec = pl.BlockSpec(
        (XB, Rv, C), lambda i, j: (i, 0, jnp.maximum(j * ratio - 1, 0)), memory_space=vmem
    )
    vr_spec = pl.BlockSpec(
        (XB, Rv, C),
        lambda i, j: (i, 0, jnp.minimum(j * ratio + ratio, NC - 1)),
        memory_space=vmem,
    )
    w0_spec = pl.BlockSpec((XB, Rv, C), lambda i, j: (i, 0, 0), memory_space=vmem)
    wL_spec = pl.BlockSpec((XB, Rv, C), lambda i, j: (i, 0, NC - 1), memory_space=vmem)
    tp_spec = pl.BlockSpec((XB, Rv, PB), lambda i, j: (i, 0, j), memory_space=vmem)
    inv_spec = pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM)
    out_specs = (
        pl.BlockSpec((XB, Rv, PB), lambda i, j: (i, 0, j), memory_space=vmem),
        pl.BlockSpec((XB, rows, PB), lambda i, j: (i, 0, j), memory_space=vmem),
    )

    bytes_moved = b_packed.size * b_packed.dtype.itemsize + 3 * t_cur.size * 4
    inv_arr = jnp.asarray(inv, jnp.float32).reshape(1, 1)
    t_next, pp = pl.pallas_call(
        functools.partial(_plane_cheb_kernel_tiled, sk, K, P, XB, PB),
        grid=grid,
        in_specs=[b_spec, vm_spec, vc_spec, vp_spec, vl_spec, vr_spec,
                  w0_spec, wL_spec, tp_spec, inv_spec],
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct(t_cur.shape, jnp.float32),
            jax.ShapeDtypeStruct((Lx, rows, P), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * sk.nnz_blocks * BLOCK * BLOCK * K * 4,
            bytes_accessed=bytes_moved,
            transcendentals=0,
        ),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT
        ),
        interpret=_interpret(),
    )(b_packed, t_cur, t_cur, t_cur, t_cur, t_cur, t_cur, t_cur, t_prev, inv_arr)
    return t_next, jnp.sum(pp[:, : 2 * K, :], axis=-1)


def _use_tiled_plane(sk: Skeleton, K: int, P: int) -> bool:
    """Opt-in only (BODGE_PLANE_TILED=1): the interleaved A/B measured the
    tiled form ~10% slower than the untiled kernel, so it never
    auto-dispatches.  The env knob keeps it drivable for experiments."""
    import os

    if os.environ.get("BODGE_PLANE_TILED") != "1":
        return False
    return _tile_plan(sk, K, P) is not None


def _plane_stencil_kernel(
    sk: Skeleton, K: int, P: int, XB: int, b_ref, vm_ref, vc_ref, vp_ref, y_ref
):
    """Blocked stencil product, circular ±x index maps (single device)."""
    y_ref[...] = _plane_stencil_body(
        sk, K, P, XB, _bload_from_ref(b_ref, sk), vm_ref[...], vc_ref[...], vp_ref[...]
    )


@functools.partial(jax.jit, static_argnames=("sk", "K"))
def _plane_spmm(b_packed, v_packed, sk: Skeleton, K: int):
    """Packed-layout stencil SpMM: ``[Lx, 2·4K, P] → [Lx, 2·4K, P]``.

    The grid walks BLOCKS of XB planes; the ±x halo planes arrive as
    single-plane inputs through circular element-granular index maps, and
    the vector is fetched ≈(1 + 2/XB)× instead of 3× per application.
    """
    Lx, Ly, Lz = sk.shape
    S = sk.n_slots
    P = b_packed.shape[-1]
    XB = _pick_xb(Lx, S, K, P)
    Rv = 2 * BLOCK * K

    grid = (Lx // XB,)
    b_spec = pl.BlockSpec((XB, 2 * S * 16, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    vm_spec = pl.BlockSpec(
        (1, Rv, P), lambda i: ((XB * i - 1) % Lx, 0, 0), memory_space=pltpu.VMEM
    )
    vc_spec = pl.BlockSpec((XB, Rv, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    vp_spec = pl.BlockSpec(
        (1, Rv, P), lambda i: ((XB * i + XB) % Lx, 0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec((XB, Rv, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    bytes_moved = b_packed.size * b_packed.dtype.itemsize + ((2 + 2 * Lx // XB) * Rv * P + v_packed.size) * 4
    return pl.pallas_call(
        functools.partial(_plane_stencil_kernel, sk, K, P, XB),
        grid=grid,
        in_specs=[b_spec, vm_spec, vc_spec, vp_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(v_packed.shape, jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * sk.nnz_blocks * BLOCK * BLOCK * K * 4,
            bytes_accessed=bytes_moved,
            transcendentals=0,
        ),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT
        ),
        interpret=_interpret(),
    )(b_packed, v_packed, v_packed, v_packed)


def _cheb_tail(sk: Skeleton, K: int, P: int, XB: int, hv, vc, tp, inv, y_ref, pp_ref):
    """Shared tail of the fused Chebyshev kernels: recursion update + moment
    partials, all in the flat row layout.

    Moment partials per plane, kept PER LANE: rows 0..K-1 = ⟨t_cur,t_cur⟩,
    rows K..2K-1 = ⟨t_next,t_cur⟩ (padded lanes are zero).  The lane
    reduction happens outside the kernel — cross-lane reductions are slow
    on the VPU (measured ~2× the kernel runtime on the flat layout), and
    an in-kernel scatter placement does not lower in Mosaic.
    """
    t_next = 2.0 * inv * hv - tp  # [XB, 4·2K, P]
    y_ref[...] = t_next

    # Accumulate over orbitals at full-tile [XB, 2K, P] shape, then fold the
    # re/im halves into the K-row partials at the end (one cheap half-tile
    # add each, instead of half-tile FMAs throughout).
    R2 = 2 * K
    w_cc = jnp.zeros((XB, R2, P), dtype=jnp.float32)
    w_nc = jnp.zeros((XB, R2, P), dtype=jnp.float32)
    for bb in range(BLOCK):
        u = vc[:, bb * R2 : (bb + 1) * R2, :]
        w_cc = w_cc + u * u
        w_nc = w_nc + t_next[:, bb * R2 : (bb + 1) * R2, :] * u
    cc = w_cc[:, :K] + w_cc[:, K:]
    nc = w_nc[:, :K] + w_nc[:, K:]
    rows = _pp_rows(K)
    pads = (
        [jnp.zeros((XB, rows - 2 * K, P), jnp.float32)] if rows > 2 * K else []
    )
    pp_ref[...] = jnp.concatenate([cc, nc] + pads, axis=1)


def _plane_cheb_kernel(
    sk: Skeleton, K: int, P: int, XB: int, b_ref, vm_ref, vc_ref, vp_ref, tp_ref,
    inv_ref, y_ref, pp_ref
):
    """A block of XB x-planes of a fused Chebyshev step + moment partials.

    Computes ``t_next = 2·inv·(H t_cur) − t_prev`` for the block AND its
    contributions to the doubled-moment inner products ``⟨t_cur, t_cur⟩``
    and ``⟨t_next, t_cur⟩`` — so a KPM moment sweep needs no additional
    reads of the vectors outside this kernel.
    """
    vc = vc_ref[...]
    hv = _plane_stencil_body(
        sk, K, P, XB, _bload_from_ref(b_ref, sk), vm_ref[...], vc, vp_ref[...]
    )
    _cheb_tail(sk, K, P, XB, hv, vc, tp_ref[...], inv_ref[0, 0], y_ref, pp_ref)


@functools.partial(jax.jit, static_argnames=("sk", "K"))
def _plane_cheb_step(b_packed, t_cur, t_prev, inv, sk: Skeleton, K: int):
    """Fused packed Chebyshev step: returns ``(t_next, partials[Lx, 2K])``."""
    Lx, Ly, Lz = sk.shape
    S = sk.n_slots
    P = b_packed.shape[-1]
    XB = _pick_xb(Lx, S, K, P)
    Rv = 2 * BLOCK * K

    grid = (Lx // XB,)
    b_spec = pl.BlockSpec((XB, 2 * S * 16, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    vm_spec = pl.BlockSpec(
        (1, Rv, P), lambda i: ((XB * i - 1) % Lx, 0, 0), memory_space=pltpu.VMEM
    )
    vc_spec = pl.BlockSpec((XB, Rv, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    vp_spec = pl.BlockSpec(
        (1, Rv, P), lambda i: ((XB * i + XB) % Lx, 0, 0), memory_space=pltpu.VMEM
    )
    tp_spec = pl.BlockSpec((XB, Rv, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    inv_spec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    rows = _pp_rows(K)
    out_specs = (
        pl.BlockSpec((XB, Rv, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((XB, rows, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    )

    bytes_moved = b_packed.size * b_packed.dtype.itemsize + (2 * t_cur.size + t_prev.size) * 4
    inv_arr = jnp.asarray(inv, jnp.float32).reshape(1, 1)
    t_next, pp = pl.pallas_call(
        functools.partial(_plane_cheb_kernel, sk, K, P, XB),
        grid=grid,
        in_specs=[b_spec, vm_spec, vc_spec, vp_spec, tp_spec, inv_spec],
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct(t_cur.shape, jnp.float32),
            jax.ShapeDtypeStruct((Lx, rows, P), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * sk.nnz_blocks * BLOCK * BLOCK * K * 4,
            bytes_accessed=bytes_moved,
            transcendentals=0,
        ),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT
        ),
        interpret=_interpret(),
    )(b_packed, t_cur, t_cur, t_cur, t_prev, inv_arr)
    # Lane reduction of the per-lane partials in XLA (tiny array).
    return t_next, jnp.sum(pp[:, : 2 * K, :], axis=-1)


# ===========================================================================
# Plane layout, halo form (row-sharded local slabs).
# ===========================================================================
# The sharded SpMM partitions x-planes over a device mesh; the ONE plane of
# neighbor data needed per side is delivered by a `ppermute` ring in the
# caller (bodge_tpu/parallel/pallas_sharded.py) as separate single-plane
# arrays ``hm``/``hp`` — NOT concatenated into an extended operand, which
# would copy the whole slab every step.  The kernels walk blocks of XB
# planes like the single-device path; the first/last grid step swaps its
# out-of-range ±x input for the halo plane (a predicated select — both
# candidate planes are tiny).  The ring wrap delivers the periodic partner
# planes at the global boundary, so periodic and open boundaries work
# unmodified (open wrap blocks are structural zeros).


def _plane_stencil_kernel_halo(
    sk: Skeleton, K: int, P: int, XB: int, nb: int,
    b_ref, vm_ref, vc_ref, vp_ref, hm_ref, hp_ref, y_ref
):
    i = pl.program_id(0)
    vm = jnp.where(i == 0, hm_ref[...], vm_ref[...])
    vp = jnp.where(i == nb - 1, hp_ref[...], vp_ref[...])
    y_ref[...] = _plane_stencil_body(
        sk, K, P, XB, _bload_from_ref(b_ref, sk), vm, vc_ref[...], vp
    )


def _halo_specs(Lxl: int, XB: int, S: int, K: int, P: int):
    Rv = 2 * BLOCK * K
    b_spec = pl.BlockSpec((XB, 2 * S * 16, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    # Interior ±x planes come from the local slab with CLAMPED element maps;
    # the out-of-range fetch at the first/last step is discarded by the
    # kernel's predicated select in favor of the halo plane.
    vm_spec = pl.BlockSpec(
        (1, Rv, P), lambda i: (jnp.maximum(XB * i - 1, 0), 0, 0), memory_space=pltpu.VMEM
    )
    vc_spec = pl.BlockSpec((XB, Rv, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    vp_spec = pl.BlockSpec(
        (1, Rv, P),
        lambda i: (jnp.minimum(XB * i + XB, Lxl - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    h_spec = pl.BlockSpec((1, Rv, P), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    return b_spec, vm_spec, vc_spec, vp_spec, h_spec


@functools.partial(jax.jit, static_argnames=("sk", "K", "Lxl"))
def _plane_spmm_halo(b_local, v_local, hm, hp, sk: Skeleton, K: int, Lxl: int):
    """Local-slab stencil SpMM: ``[Lxl, 2·4K, P] (+2 halo planes) → [Lxl, …]``."""
    S = sk.n_slots
    P = b_local.shape[-1]
    XB = _pick_xb(Lxl, S, K, P)
    nb = Lxl // XB
    Rv = 2 * BLOCK * K

    b_spec, vm_spec, vc_spec, vp_spec, h_spec = _halo_specs(Lxl, XB, S, K, P)
    out_spec = pl.BlockSpec((XB, Rv, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    bytes_moved = b_local.size * b_local.dtype.itemsize + 2 * v_local.size * 4
    return pl.pallas_call(
        functools.partial(_plane_stencil_kernel_halo, sk, K, P, XB, nb),
        grid=(nb,),
        in_specs=[b_spec, vm_spec, vc_spec, vp_spec, h_spec, h_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((Lxl, Rv, P), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * (sk.nnz_blocks // max(1, sk.shape[0] // Lxl)) * BLOCK * BLOCK * K * 4,
            bytes_accessed=bytes_moved,
            transcendentals=0,
        ),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT
        ),
        interpret=_interpret(),
    )(b_local, v_local, v_local, v_local, hm, hp)


def _plane_cheb_kernel_halo(
    sk: Skeleton, K: int, P: int, XB: int, nb: int,
    b_ref, vm_ref, vc_ref, vp_ref, hm_ref, hp_ref, tp_ref, inv_ref, y_ref, pp_ref
):
    i = pl.program_id(0)
    vm = jnp.where(i == 0, hm_ref[...], vm_ref[...])
    vp = jnp.where(i == nb - 1, hp_ref[...], vp_ref[...])
    vc = vc_ref[...]
    hv = _plane_stencil_body(sk, K, P, XB, _bload_from_ref(b_ref, sk), vm, vc, vp)
    _cheb_tail(sk, K, P, XB, hv, vc, tp_ref[...], inv_ref[0, 0], y_ref, pp_ref)


@functools.partial(jax.jit, static_argnames=("sk", "K", "Lxl"))
def _plane_cheb_step_halo(b_local, v_local, hm, hp, t_prev, inv, sk: Skeleton, K: int, Lxl: int):
    """Local-slab fused Chebyshev step: ``(t_next[Lxl], partials[Lxl, 2K])``.

    ``v_local: [Lxl, 2·4K, P]`` is the local t_cur slab; ``hm``/``hp`` the
    single ppermute-delivered halo plane per side; ``t_prev`` the plain
    local slab.  Partials are per-plane (caller psums over the mesh axis
    after the local plane sum).
    """
    S = sk.n_slots
    P = b_local.shape[-1]
    XB = _pick_xb(Lxl, S, K, P)
    nb = Lxl // XB
    Rv = 2 * BLOCK * K

    b_spec, vm_spec, vc_spec, vp_spec, h_spec = _halo_specs(Lxl, XB, S, K, P)
    tp_spec = pl.BlockSpec((XB, Rv, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    inv_spec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    rows = _pp_rows(K)
    out_specs = (
        pl.BlockSpec((XB, Rv, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((XB, rows, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    )

    bytes_moved = b_local.size * b_local.dtype.itemsize + 3 * v_local.size * 4
    inv_arr = jnp.asarray(inv, jnp.float32).reshape(1, 1)
    t_next, pp = pl.pallas_call(
        functools.partial(_plane_cheb_kernel_halo, sk, K, P, XB, nb),
        grid=(nb,),
        in_specs=[b_spec, vm_spec, vc_spec, vp_spec, h_spec, h_spec, tp_spec, inv_spec],
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct((Lxl, Rv, P), jnp.float32),
            jax.ShapeDtypeStruct((Lxl, rows, P), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (sk.nnz_blocks // max(1, sk.shape[0] // Lxl)) * BLOCK * BLOCK * K * 4,
            bytes_accessed=bytes_moved,
            transcendentals=0,
        ),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT
        ),
        interpret=_interpret(),
    )(b_local, v_local, v_local, v_local, hm, hp, t_prev, inv_arr)
    return t_next, jnp.sum(pp[:, : 2 * K, :], axis=-1)


# ===========================================================================
# Differentiable halo forms (Pallas forward, jnp-reference backward).
# ===========================================================================
# pallas_call has no autodiff rule, so the row-sharded self-consistency
# step (gradient of a KPM free-energy trace w.r.t. the operator blocks —
# the "training step" of this domain) could previously only run on the
# XLA einsum path.  Here each halo kernel gets a `jax.custom_vjp` wrapper:
# the forward pass IS the hand-scheduled kernel; the backward pass is the
# XLA-derived VJP of a line-for-line jnp restatement of the same packed
# arithmetic (below).  Correctness is by construction — the reference is
# validated against the kernel in interpret mode by tests — and the
# surrounding shard_map/scan machinery transposes the `ppermute` halo
# exchange automatically (it is linear), so reverse-mode "just works"
# across the device mesh.


def _shifted_plane_rows_ref(sk: Skeleton, P: int, flat, col, axis: int, d: int):
    """jnp restatement of :func:`_shifted_plane_rows` (same shifts mod P)."""
    _, Ly, Lz = sk.shape
    if axis == 1:
        main = jnp.roll(flat, (-d * Lz) % P, axis=-1)
        wrap = jnp.roll(flat, (d * (Ly - 1) * Lz) % P, axis=-1)
        boundary = (col >= (Ly - 1) * Lz) if d > 0 else (col < Lz)
    else:
        main = jnp.roll(flat, (-d) % P, axis=-1)
        wrap = jnp.roll(flat, (d * (Lz - 1)) % P, axis=-1)
        boundary = (col % Lz == Lz - 1) if d > 0 else (col % Lz == 0)
    return jnp.where(boundary, wrap, main)


def _plane_stencil_halo_ref(sk: Skeleton, K: int, b, v, hm, hp):
    """jnp restatement of the halo stencil product over the WHOLE local slab
    (the blocked kernel's grid structure collapses: v_xm/v_xp across block
    edges and the first/last halo select are together just one concat).

    ``b: [Lxl, 2·S·16, P]``, ``v: [Lxl, 4·2K, P]``, ``hm``/``hp``:
    ``[1, 4·2K, P]`` → ``[Lxl, 4·2K, P]``.
    """
    S = sk.n_slots
    P = v.shape[-1]
    R2 = 2 * K
    Rv = BLOCK * R2
    Lxl = v.shape[0]
    bb32 = b.astype(jnp.float32)
    col = jnp.arange(P, dtype=jnp.int32)[None, :]

    v_xm = jnp.concatenate([hm, v[: Lxl - 1]], axis=0)
    v_xp = jnp.concatenate([v[1:], hp], axis=0)

    accs = [jnp.zeros((Lxl, R2, P), dtype=jnp.float32) for _ in range(BLOCK)]
    for s, (axis, d) in enumerate(sk.slots):
        if axis < 0:
            src = v
        elif axis == 0:
            src = v_xp if d > 0 else v_xm
        else:
            flat = v.reshape(Lxl * Rv, P)
            src = _shifted_plane_rows_ref(sk, P, flat, col, axis, d).reshape(Lxl, Rv, P)
        for cb in range(BLOCK):
            u = src[:, cb * R2 : (cb + 1) * R2, :]
            usw = jnp.concatenate([-u[:, K:], u[:, :K]], axis=1)
            for a in range(BLOCK):
                wr = bb32[:, ((0 * S + s) * BLOCK + a) * BLOCK + cb, :][:, None, :]
                wi = bb32[:, ((1 * S + s) * BLOCK + a) * BLOCK + cb, :][:, None, :]
                accs[a] = accs[a] + wr * u + wi * usw
    return jnp.concatenate(accs, axis=1)


def _plane_cheb_step_halo_ref(sk: Skeleton, K: int, b, v, hm, hp, tp, inv):
    """jnp restatement of :func:`_plane_cheb_step_halo` (same outputs:
    ``(t_next[Lxl, 4·2K, P], partials[Lxl, 2K])``)."""
    hv = _plane_stencil_halo_ref(sk, K, b, v, hm, hp)
    t_next = 2.0 * inv * hv - tp
    Lxl, P = v.shape[0], v.shape[-1]
    v5 = v.reshape(Lxl, BLOCK, 2, K, P)
    n5 = t_next.reshape(Lxl, BLOCK, 2, K, P)
    cc = jnp.sum(v5 * v5, axis=(1, 2, 4))
    nc = jnp.sum(n5 * v5, axis=(1, 2, 4))
    return t_next, jnp.concatenate([cc, nc], axis=1)


def _flat_stencil_ref(sk: Skeleton, K: int, lo: Layout, b, v):
    """jnp restatement of the FLAT stencil product over the whole guarded
    lane axis (the chunked kernel's windows collapse to global lane rolls).

    ``b: [2·S·16, W]`` (W = nb·T site columns, no guards),
    ``v: [4·2K, L]`` (L = W + 2G guarded lanes) → ``[4·2K, L]``.

    The operator rows are zero-padded into lane space (guard columns = 0),
    so guard lanes and rolled-in garbage annihilate exactly like the
    kernel's structural zeros — no output masking needed.
    """
    Lx, Ly, Lz = sk.shape
    M = Ly * Lz
    S = sk.n_slots
    G, L = lo.G, lo.L
    R2 = 2 * K
    bb32 = b.astype(jnp.float32)
    bw = jnp.pad(bb32, ((0, 0), (G, G)))  # [2·S·16, L], site s at lane s+G

    lane = jnp.arange(L, dtype=jnp.int32)[None, :]
    p = lane - G  # global site id per lane (interior lanes only)

    def shifted(off):
        return jnp.roll(v, -off, axis=-1)

    accs = [jnp.zeros((R2, L), dtype=jnp.float32) for _ in range(BLOCK)]
    for s, (axis, d) in enumerate(sk.slots):
        if axis < 0:
            src = v
        else:
            if axis == 0:
                main, wrap = shifted(d * M), shifted(-d * (Lx - 1) * M)
                mask = (p >= (Lx - 1) * M) if d > 0 else (p < M)
            elif axis == 1:
                main, wrap = shifted(d * Lz), shifted(-d * (Ly - 1) * Lz)
                q = p % M
                mask = (q >= (Ly - 1) * Lz) if d > 0 else (q < Lz)
            else:
                main, wrap = shifted(d), shifted(-d * (Lz - 1))
                q = p % Lz
                mask = (q == Lz - 1) if d > 0 else (q == 0)
            src = jnp.where(mask, wrap, main)
        for cb in range(BLOCK):
            u = src[cb * R2 : (cb + 1) * R2]
            usw = jnp.concatenate([-u[K:], u[:K]], axis=0)
            for a in range(BLOCK):
                wr = bw[s * 16 + a * BLOCK + cb][None]
                wi = bw[16 * S + s * 16 + a * BLOCK + cb][None]
                accs[a] = accs[a] + wr * u + wi * usw
    return jnp.concatenate(accs, axis=0)


def _flat_cheb_step_ref(sk: Skeleton, K: int, lo: Layout, b, v, tp, inv):
    """jnp restatement of :func:`_flat_cheb_step` (same outputs:
    ``(t_next[4·2K, L], partials[L//T, 2K])``).

    Guard chunks are zeroed like the kernel's explicit zero-fill — the
    kernel's outputs there are CONSTANT zero regardless of inputs, so the
    restatement must be too or its VJP would leak spurious gradient
    through the guards."""
    hv = _flat_stencil_ref(sk, K, lo, b, v)
    t_next = 2.0 * inv * hv - tp
    L, T, G = lo.L, lo.T, lo.G
    lane = jnp.arange(L, dtype=jnp.int32)[None, :]
    interior = (lane >= G) & (lane < G + lo.nb * T)
    t_next = jnp.where(interior, t_next, 0.0)
    v4 = v.reshape(BLOCK, 2, K, L)
    n4 = t_next.reshape(BLOCK, 2, K, L)
    vi = jnp.where(interior, 1.0, 0.0)
    cc = jnp.sum(v4 * v4 * vi, axis=(0, 1)).reshape(K, L // T, T).sum(-1).T
    nc = jnp.sum(n4 * v4 * vi, axis=(0, 1)).reshape(K, L // T, T).sum(-1).T
    return t_next, jnp.concatenate([cc, nc], axis=1)


@functools.lru_cache(maxsize=None)
def cheb_step_pallas_ad(sk: Skeleton, K: int):
    """Differentiable single-device fused Chebyshev step (layout-dispatched):
    Pallas forward, jnp-reference backward.  Same contract as
    :func:`chebyshev_step_pallas` — ``(t_next, partials[chunks, 2K])``.

    The plane layout's circular ±x index maps are the halo reference with
    the wrapped boundary planes of the operand itself as the halos.
    """
    lo = plan(sk, K)
    if lo.mode == "flat":
        ref = lambda b, t, p, inv: _flat_cheb_step_ref(sk, K, lo, b, t, p, inv)
    else:
        ref = lambda b, t, p, inv: _plane_cheb_step_halo_ref(
            sk, K, b, t, t[-1:], t[:1], p, inv
        )

    @jax.custom_vjp
    def step(b, t_cur, t_prev, inv):
        return chebyshev_step_pallas(b, t_cur, t_prev, inv, sk, K)

    def fwd(b, t_cur, t_prev, inv):
        out = chebyshev_step_pallas(b, t_cur, t_prev, inv, sk, K)
        return out, (b, t_cur, t_prev, inv)

    def bwd(res, ct):
        _, vjp = jax.vjp(ref, *res)
        return vjp(ct)

    step.defvjp(fwd, bwd)
    return step


@functools.lru_cache(maxsize=None)
def plane_spmm_halo_ad(sk: Skeleton, K: int, Lxl: int):
    """Differentiable local-slab SpMM: Pallas forward, jnp-VJP backward."""

    @jax.custom_vjp
    def step(b, v, hm, hp):
        return _plane_spmm_halo(b, v, hm, hp, sk, K, Lxl)

    def fwd(b, v, hm, hp):
        return _plane_spmm_halo(b, v, hm, hp, sk, K, Lxl), (b, v, hm, hp)

    def bwd(res, ct):
        _, vjp = jax.vjp(lambda *a: _plane_stencil_halo_ref(sk, K, *a), *res)
        return vjp(ct)

    step.defvjp(fwd, bwd)
    return step


@functools.lru_cache(maxsize=None)
def plane_cheb_step_halo_ad(sk: Skeleton, K: int, Lxl: int):
    """Differentiable fused local-slab Chebyshev step (t_next + moment
    partials): Pallas forward, jnp-VJP backward.  The backward recomputes
    the reference forward (rematerialization — the standard trade on TPU,
    where HBM residency is the scarce resource, not FLOPs)."""

    @jax.custom_vjp
    def step(b, v, hm, hp, tp, inv):
        return _plane_cheb_step_halo(b, v, hm, hp, tp, inv, sk, K, Lxl)

    def fwd(b, v, hm, hp, tp, inv):
        out = _plane_cheb_step_halo(b, v, hm, hp, tp, inv, sk, K, Lxl)
        return out, (b, v, hm, hp, tp, inv)

    def bwd(res, ct):
        _, vjp = jax.vjp(lambda *a: _plane_cheb_step_halo_ref(sk, K, *a), *res)
        return vjp(ct)

    step.defvjp(fwd, bwd)
    return step


# ===========================================================================
# Public entry points (layout-dispatching).
# ===========================================================================
def pack_operator(data, sk: Skeleton, K: int = 4, operator_dtype=None, layout: Layout = None):
    """ELL block data ``[N, S, 4, 4]`` → packed float32 kernel layout.

    Host NumPy input is split into re/im planes on the host — the packed
    path must never put a complex buffer on backends without complex
    support (the point of the packed representation).  ``K`` selects the
    layout plan and must match the probe count used for the vectors; pass
    an explicit ``layout`` (e.g. :func:`plane_layout`) to override the
    automatic choice.
    """
    lo = layout or plan(sk, K)
    dtype = operator_dtype if operator_dtype is not None else np.float32
    if lo.mode == "flat":
        return _pack_operator_flat(data, sk, lo, dtype=dtype)
    return _pack_operator_planes(data, sk, lo, dtype=dtype)


def pack_vector(v, sk: Skeleton, layout: Layout = None):
    """Operand ``[N, 4, K]`` complex → packed float32 kernel layout."""
    lo = layout or plan(sk, int(v.shape[-1]))
    if lo.mode == "flat":
        return _pack_vector_flat(v, sk, lo)
    return _pack_vector_planes(v, sk, lo)


def unpack_vector(vp, sk: Skeleton, K: int, dtype, layout: Layout = None):
    """Inverse of :func:`pack_vector`."""
    lo = layout or plan(sk, K)
    if lo.mode == "flat":
        return _unpack_vector_flat(vp, sk, K, dtype, lo)
    return _unpack_vector_planes(vp, sk, K, dtype, lo)


def spmm_pallas_packed(b_packed, v_packed, sk: Skeleton, K: int):
    """Packed-layout stencil SpMM (same packed layout in and out)."""
    lo = plan(sk, K)
    if lo.mode == "flat":
        return _flat_spmm(b_packed, v_packed, sk, K)
    return _plane_spmm(b_packed, v_packed, sk, K)


def chebyshev_step_pallas(b_packed, t_cur, t_prev, inv, sk: Skeleton, K: int):
    """Fused packed Chebyshev step: ``(t_next, partials[chunks, 2K])``.

    ``partials[:, :K].sum(0)`` = ⟨t_cur,t_cur⟩ and ``partials[:, K:].sum(0)``
    = ⟨t_next,t_cur⟩ per probe column — the two reductions the doubled-
    moment recursion needs, at zero extra HBM traffic.
    """
    lo = plan(sk, K)
    if lo.mode == "flat":
        return _flat_cheb_step(b_packed, t_cur, t_prev, inv, sk, K)
    if _use_tiled_plane(sk, K, b_packed.shape[-1]):
        return _plane_cheb_step_tiled(b_packed, t_cur, t_prev, inv, sk, K)
    return _plane_cheb_step(b_packed, t_cur, t_prev, inv, sk, K)


def _packed_inner(a, b, sk: Skeleton, K: int):
    """⟨a, b⟩ per probe column in packed space (invariant under packing).

    Guard/pad lanes of ``b`` must be zero (true for any packed vector);
    ``a``'s guards may hold garbage (kernel outputs leave them unwritten).
    """
    lo = plan(sk, K)
    if lo.mode == "flat":
        a4 = a.reshape(BLOCK, 2, K, lo.L)
        b4 = b.reshape(BLOCK, 2, K, lo.L)
        return jnp.sum(a4 * b4, axis=(0, 1, 3))
    Lx = a.shape[0]
    a4 = a.reshape(Lx, BLOCK, 2, K, lo.P)
    b4 = b.reshape(Lx, BLOCK, 2, K, lo.P)
    return jnp.sum(a4 * b4, axis=(0, 1, 2, 4))


def _moments_fused_body(step_fn, b_packed, v0_packed, inv, order: int, K: int):
    """Shared doubled-moment recursion over any fused-step implementation."""
    inv_f = jnp.asarray(inv, jnp.float32)
    t0 = v0_packed
    # The half-scaled first step gives t1 = H̃ t0 AND, via the in-kernel
    # partials, μ0 = ⟨t0,t0⟩ and μ1 = ⟨t1,t0⟩ for free.
    t1, pp0 = step_fn(b_packed, t0, jnp.zeros_like(t0), 0.5 * inv_f)
    mu0 = jnp.sum(pp0[:, :K], axis=0)
    mu1 = jnp.sum(pp0[:, K:], axis=0)

    steps = max(0, (order - 2 + 1) // 2)
    if steps == 0:
        return jnp.stack([mu0, mu1])[:order]

    def step(carry, _):
        t_prev, t_cur = carry
        t_next, pp = step_fn(b_packed, t_cur, t_prev, inv_f)
        cc = jnp.sum(pp[:, :K], axis=0)
        nc = jnp.sum(pp[:, K:], axis=0)
        alpha = 2.0 * cc - mu0
        beta = 2.0 * nc - mu1
        return (t_cur, t_next), (alpha, beta)

    (_, _), (alphas, betas) = jax.lax.scan(step, (t0, t1), None, length=steps)
    rest = jnp.stack([alphas, betas], axis=1).reshape(2 * steps, K)
    return jnp.concatenate([mu0[None], mu1[None], rest], axis=0)[:order]


@functools.partial(jax.jit, static_argnames=("sk", "order", "K"))
def moments_pallas_fused(b_packed, v0_packed, sk: Skeleton, inv, order: int, K: int):
    """KPM moments with the fused step kernel: per Chebyshev order, ONE
    kernel pass computes t_next and both inner products — the minimum-
    traffic formulation of the doubled-moment recursion."""
    step_fn = lambda b, t, p, i: chebyshev_step_pallas(b, t, p, i, sk, K)
    return _moments_fused_body(step_fn, b_packed, v0_packed, inv, order, K)


@functools.partial(jax.jit, static_argnames=("sk", "order", "K"))
def moments_pallas_fused_ad(b_packed, v0_packed, sk: Skeleton, inv, order: int, K: int):
    """Differentiable :func:`moments_pallas_fused`: identical forward
    values (same kernels), with reverse-mode flowing through the steps'
    custom VJPs — gradients w.r.t. the packed operator and the probes.
    Backward rematerializes each step from the jnp reference (memory-lean;
    the scan checkpoints only the two carry vectors per step)."""
    step_fn = cheb_step_pallas_ad(sk, K)
    return _moments_fused_body(step_fn, b_packed, v0_packed, inv, order, K)


def spmm_pallas(data, sk: Skeleton, v):
    """Drop-in SpMM via the Pallas kernel (packs/unpacks per call).

    For repeated application (Chebyshev scans) use :func:`pack_operator` /
    :func:`pack_vector` once and call :func:`spmm_pallas_packed` inside the
    loop instead — packing costs one pass over the data.
    """
    K = int(v.shape[-1])
    if plan(sk, K) is None:
        from .spmm import spmm

        return spmm(data, sk, v, impl="stencil")  # gather for non-stencil sk
    b_packed = pack_operator(data, sk, K)
    v_packed = pack_vector(v, sk)
    y_packed = spmm_pallas_packed(b_packed, v_packed, sk, K)
    return unpack_vector(y_packed, sk, K, data.dtype)
