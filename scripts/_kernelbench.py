#!/usr/bin/env python
"""Micro-benchmark decomposing the flat Pallas Chebyshev kernel's runtime.

Variants (all share the flat packed layout and BlockSpecs of
bodge_tpu/ops/pallas_spmm.py, so their *pipelines* are identical — the
differences isolate compute stages):

  stream    DMA-only ceiling: fetch B chunk + resident v, write a copy.
  noshift   full FMA work but every slot reads the unshifted chunk
            (isolates the stencil-shift cost).
  noB       shifts + FMA loop with constant scalars instead of B rows
            (isolates the B row-extraction/broadcast cost).
  v0        current production kernel (_flat_spmm).
  v0cheb    current fused Chebyshev step (+ moment partials).
  v1        B-tile formulation: B packed as [8,T] (Re a0..3 / Im a0..3)
            tiles per (slot, col-orbital); operand rows splatted instead
            of B rows; one sublane rotate per k at the end.
  v1cheb    v1 + Chebyshev update + in-kernel moment partials.

Run on TPU:   python _kernelbench.py [L] [order]
On CPU it runs in interpret mode and only checks correctness.
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bodge_tpu import CubicLattice, Hamiltonian, jσ2, σ0
from bodge_tpu.ops.blocksparse import BLOCK
from bodge_tpu.ops import pallas_spmm as ps

L = int(sys.argv[1]) if len(sys.argv) > 1 else 200
ORDER = int(sys.argv[2]) if len(sys.argv) > 2 else 128
K = 4

INTERP = jax.default_backend() != "tpu"


def build(L):
    lattice = CubicLattice((L, L, 1))
    system = Hamiltonian(lattice)
    rng = np.random.default_rng(0)
    pot = rng.normal(size=lattice.size)

    def onsite(ci):
        idx = ci[:, 2] + ci[:, 1] * 1 + ci[:, 0] * L  # z + y*Lz + x*Ly*Lz, Lz=1
        return (-0.5 + 0.1 * pot[idx])[:, None, None] * σ0

    system.assemble(
        onsite=onsite,
        pairing_onsite=lambda ci: 0.4 * jσ2,
        hopping=lambda ci, cj: np.where(
            (np.abs(ci - cj).max(axis=1) == 1)[:, None, None], -1.0 * σ0, 0
        ),
        check=False,
    )
    return lattice, system


lattice, system = build(L)
sk = system.skeleton
# This harness decomposes the FLAT kernel; plan() now prefers the plane
# layout at this size, so opt the policy out for the whole process.
ps.PLANE_PREFERRED_MIN_SITES = 10**12
lo = ps.plan(sk, K)
assert lo is not None and lo.mode == "flat", f"need flat layout, got {lo}"
N = lattice.size
S = sk.n_slots
print(f"L={L} N={N} S={S} T={lo.T} nb={lo.nb} L_lanes={lo.L}", file=sys.stderr)

data = system.host_data()
b0 = ps.pack_operator(data, sk, K)
v0 = np.zeros((N, BLOCK, K), dtype=system.dtype)
v0[N // 2, np.arange(K) % BLOCK, np.arange(K)] = 1.0
vp = ps.pack_vector(v0, sk)
inv = jnp.asarray(0.37, jnp.float32)

b_spec, v_spec, chunk_spec = ps._flat_specs(sk, lo)
GRID = (lo.L // lo.T,)
CP = None if INTERP else pltpu.CompilerParams(vmem_limit_bytes=ps.VMEM_LIMIT)


def pcall(kernel, nout=1, extra_in=(), extra_out=()):
    outs = (chunk_spec,) + tuple(extra_out)
    oshape = (jax.ShapeDtypeStruct(vp.shape, jnp.float32),) + tuple(
        jax.ShapeDtypeStruct(s, jnp.float32) for s in ()
    )
    return pl.pallas_call(
        kernel,
        grid=GRID,
        in_specs=[b_spec, v_spec] + list(extra_in),
        out_specs=outs if nout > 1 else chunk_spec,
        out_shape=(oshape if nout > 1 else oshape[0]),
        interpret=INTERP,
        compiler_params=CP,
    )


# --------------------------------------------------------------- stream
def k_stream(b_ref, v_ref, y_ref):
    i = pl.program_id(0)
    y_ref[...] = v_ref[:, pl.ds(i * lo.T, lo.T)] + b_ref[0, 0]


stream = jax.jit(lambda b, v: pcall(k_stream)(b, v))


# --------------------------------------------------------------- noshift / noB
def k_fma(mode, b_ref, v_ref, y_ref):
    i = pl.program_id(0)
    T = lo.T
    bb = b_ref[...]
    vc = v_ref[:, pl.ds(i * T, T)]
    accs = [jnp.zeros((2 * K, T), jnp.float32) for _ in range(BLOCK)]
    if mode == "noshift":
        sources = [(s, vc) for s in range(S)]
    else:
        sources = list(ps._flat_sources(sk, lo, v_ref, i))
    for s, src in sources:
        sv = src.reshape(BLOCK, 2 * K, T)
        for c in range(BLOCK):
            u = sv[c]
            usw = jnp.concatenate([-u[K:], u[:K]], axis=0)
            for a in range(BLOCK):
                if mode == "noB":
                    accs[a] = accs[a] + 0.5 * u + 0.25 * usw
                else:
                    wr = bb[s * 16 + a * BLOCK + c][None]
                    wi = bb[16 * S + s * 16 + a * BLOCK + c][None]
                    accs[a] = accs[a] + wr * u + wi * usw
    y_ref[...] = jnp.concatenate(accs, axis=0)


noshift = jax.jit(lambda b, v: pcall(functools.partial(k_fma, "noshift"))(b, v))
noB = jax.jit(lambda b, v: pcall(functools.partial(k_fma, "noB"))(b, v))

# --------------------------------------------------------------- v0
v0_spmm = jax.jit(lambda b, v: ps._flat_spmm(b, v, sk, K))
v0_cheb = jax.jit(lambda b, t, p: ps._flat_cheb_step(b, t, p, inv, sk, K)[0])


# --------------------------------------------------------------- v1 packing
def pack_operator_v1(data):
    """[N,S,4,4] -> [S*4c*8, W]: per (s,c) an 8-row tile (Re a0..3, Im a0..3)."""
    Nn, Ss = sk.cols.shape
    W = lo.nb * lo.T
    d = np.moveaxis(np.asarray(data), 0, -1)  # [S,4a,4c,N]
    out = np.zeros((Ss, BLOCK, 2, BLOCK, W), dtype=np.float32)  # [s,c,ri,a,W]
    out[:, :, 0, :, :N] = np.moveaxis(d.real, 1, 2)  # [S,c,a,N]
    out[:, :, 1, :, :N] = np.moveaxis(d.imag, 1, 2)
    return jnp.asarray(out.reshape(Ss * BLOCK * 2 * BLOCK, W))


b1 = pack_operator_v1(data)
b1_spec = pl.BlockSpec((S * BLOCK * 2 * BLOCK, lo.T),
                       b_spec.index_map, memory_space=pltpu.VMEM)


def _v1_accumulate(b_ref, v_ref, i):
    """Core v1 FMA loop: returns (accA, accB) lists per k, plus vc."""
    T = lo.T
    bb = b_ref[...]  # rows: ((s,c),(ri,a))
    accA = [jnp.zeros((2 * BLOCK, T), jnp.float32) for _ in range(K)]
    accB = [jnp.zeros((2 * BLOCK, T), jnp.float32) for _ in range(K)]
    vc = None
    for s, src in ps._flat_sources(sk, lo, v_ref, i):
        if s == 0:
            vc = src
        for c in range(BLOCK):
            W = bb[(s * BLOCK + c) * 8:(s * BLOCK + c) * 8 + 8]  # [8,T]
            for k in range(K):
                ur = src[c * 2 * K + k][None]  # [1,T]
                ui = src[c * 2 * K + K + k][None]
                accA[k] = accA[k] + W * ur
                accB[k] = accB[k] + W * ui
    return accA, accB, vc


def _v1_outputs(accA, accB):
    """Combine accA/accB into output rows (a, re/im, k)."""
    outs = []
    for a in range(BLOCK):
        rows = []
        for k in range(K):
            rows.append(accA[k][a] - accB[k][BLOCK + a])  # re
        for k in range(K):
            rows.append(accB[k][a] + accA[k][BLOCK + a])  # im
        outs.append(jnp.stack(rows))
    return jnp.concatenate(outs, axis=0)  # [4*2K, T]


def k_v1(b_ref, v_ref, y_ref):
    i = pl.program_id(0)
    g = lo.G // lo.T
    is_guard = jnp.logical_or(i < g, i >= lo.nb + g)

    @pl.when(is_guard)
    def _():
        y_ref[...] = jnp.zeros(y_ref.shape, jnp.float32)

    @pl.when(jnp.logical_not(is_guard))
    def _():
        accA, accB, _ = _v1_accumulate(b_ref, v_ref, i)
        y_ref[...] = _v1_outputs(accA, accB)


def k_v1_cheb(b_ref, v_ref, tp_ref, inv_ref, y_ref, pp_ref):
    i = pl.program_id(0)
    g = lo.G // lo.T
    is_guard = jnp.logical_or(i < g, i >= lo.nb + g)

    @pl.when(is_guard)
    def _():
        y_ref[...] = jnp.zeros(y_ref.shape, jnp.float32)
        pp_ref[...] = jnp.zeros(pp_ref.shape, jnp.float32)

    @pl.when(jnp.logical_not(is_guard))
    def _():
        accA, accB, vc = _v1_accumulate(b_ref, v_ref, i)
        hv = _v1_outputs(accA, accB)
        two_inv = 2.0 * inv_ref[0, 0]
        t_next = two_inv * hv - tp_ref[...]
        y_ref[...] = t_next
        v4 = vc.reshape(BLOCK, 2, K, lo.T)
        n4 = t_next.reshape(BLOCK, 2, K, lo.T)
        cc = jnp.sum(v4 * v4, axis=(0, 1))
        nc = jnp.sum(n4 * v4, axis=(0, 1))
        rows = ps._pp_rows(K)
        pads = ([jnp.zeros((rows - 2 * K, lo.T), jnp.float32)]
                if rows > 2 * K else [])
        pp_ref[...] = jnp.concatenate([cc, nc] + pads, axis=0).reshape(1, rows, lo.T)


v1 = jax.jit(lambda b, v: pl.pallas_call(
    k_v1, grid=GRID, in_specs=[b1_spec, v_spec], out_specs=chunk_spec,
    out_shape=jax.ShapeDtypeStruct(vp.shape, jnp.float32),
    interpret=INTERP, compiler_params=CP)(b, v))

_rows = ps._pp_rows(K)
_pp_spec = pl.BlockSpec((1, _rows, lo.T), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
_inv_spec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)


def v1_cheb_raw(b, t, p, iv):
    return pl.pallas_call(
        k_v1_cheb, grid=GRID,
        in_specs=[b1_spec, v_spec, chunk_spec, _inv_spec],
        out_specs=(chunk_spec, _pp_spec),
        out_shape=(jax.ShapeDtypeStruct(vp.shape, jnp.float32),
                   jax.ShapeDtypeStruct((GRID[0], _rows, lo.T), jnp.float32)),
        interpret=INTERP, compiler_params=CP,
    )(b, t, p, jnp.asarray(iv, jnp.float32).reshape(1, 1))


v1_cheb = jax.jit(lambda b, t, p: v1_cheb_raw(b, t, p, inv)[0])


# --------------------------------------------------------------- correctness
ref = np.asarray(v0_spmm(b0, vp))
for name, fn, bop in [("noshift", noshift, b0), ("noB", noB, b0), ("v1", v1, b1)]:
    out = np.asarray(fn(bop, vp))
    if name == "v1":
        err = float(np.abs(out - ref).max())
        print(f"correctness v1 vs v0: max|Δ| = {err:.3e}", file=sys.stderr)
        assert err < 1e-4 * max(1.0, float(np.abs(ref).max()))
    else:
        assert np.isfinite(out).all()

ref_c = np.asarray(v0_cheb(b0, vp, vp))
out_c = np.asarray(v1_cheb(b1, vp, vp))
err = float(np.abs(out_c - ref_c).max())
print(f"correctness v1cheb vs v0cheb: max|Δ| = {err:.3e}", file=sys.stderr)
assert err < 1e-4 * max(1.0, float(np.abs(ref_c).max()))
print("CORRECTNESS OK", file=sys.stderr)

if INTERP:
    print("interpret mode: skipping timing", file=sys.stderr)
    sys.exit(0)


# --------------------------------------------------------------- timing
def scan2(fn, bop):
    @functools.partial(jax.jit, static_argnames=("n",))
    def run(b, v, n):
        def step(carry, _):
            t_prev, t_cur = carry
            return (t_cur, fn(b, t_cur)), None
        (_, out), _ = jax.lax.scan(step, (v, v), None, length=n)
        return out.ravel()[0]
    return lambda n: float(run(bop, vp, n))


def scan3(fn, bop):
    @functools.partial(jax.jit, static_argnames=("n",))
    def run(b, v, n):
        def step(carry, _):
            t_prev, t_cur = carry
            return (t_cur, fn(b, t_cur, t_prev)), None
        (_, out), _ = jax.lax.scan(step, (v, v), None, length=n)
        return out.ravel()[0]
    return lambda n: float(run(bop, vp, n))


def slope(runner, n1, n2, reps=4):
    best = float("inf")
    runner(n1); runner(n2)  # compile both
    for _ in range(reps):
        t0 = time.perf_counter(); runner(n1); t1 = time.perf_counter()
        runner(n2); t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (n2 - n1))
    return best

bytes_B = b0.size * 4
bytes_v = vp.size * 4
cases = [
    ("stream", scan2(lambda b, t: stream(b, t), b0), bytes_B + 2 * bytes_v),
    ("noB", scan2(lambda b, t: noB(b, t), b0), bytes_B + 2 * bytes_v),
    ("noshift", scan2(lambda b, t: noshift(b, t), b0), bytes_B + 2 * bytes_v),
    ("v0", scan2(lambda b, t: v0_spmm(b, t), b0), bytes_B + 2 * bytes_v),
    ("v1", scan2(lambda b, t: v1(b, t), b1), bytes_B + 2 * bytes_v),
    ("v0cheb", scan3(lambda b, t, p: v0_cheb(b, t, p), b0), bytes_B + 3 * bytes_v),
    ("v1cheb", scan3(lambda b, t, p: v1_cheb(b, t, p), b1), bytes_B + 3 * bytes_v),
]
BW = 819e9
for name, runner, nbytes in cases:
    t = slope(runner, ORDER, 4 * ORDER)
    gbps = nbytes / t / 1e9
    print(f"{name:9s} {t*1e6:9.1f} µs/step  {gbps:7.1f} GB/s  "
          f"{100*nbytes/t/BW:5.1f}% roof")
