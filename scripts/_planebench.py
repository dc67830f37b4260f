#!/usr/bin/env python
"""Micro-benchmark decomposing the PLANE-layout fused Chebyshev kernel.

The v2 full-tile rewrite halved the VPU work but only moved 1000×1000 from
49% → 53% of the HBM roof, so the bottleneck is the DMA pipeline, not
compute.  Variants isolate the stages:

  stream[XB]   DMA-only ceiling with the production BlockSpecs: fetch
               B/vm/vc/vp/tp blocks, write y = vc + b[0,0,0] and zero pp.
  cheb[XB]     production fused step at a forced planes-per-step XB.

Run on TPU:   python _planebench.py [L] [order]
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

L = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
ORDER = int(sys.argv[2]) if len(sys.argv) > 2 else 32
K = 4
INTERP = jax.default_backend() != "tpu"


def build(L):
    lattice = CubicLattice((L, L, 1))
    system = Hamiltonian(lattice)
    system.assemble(
        onsite=lambda ci: -0.5 * σ0,
        pairing_onsite=lambda ci: 0.4 * jσ2,
        hopping=lambda ci, cj: np.where(
            (np.abs(ci - cj).max(axis=1) == 1)[:, None, None], -1.0 * σ0, 0
        ),
        check=False,
    )
    return lattice, system


lattice, system = build(L)
sk = system.skeleton
lo = ps.plane_layout(sk, K)
N = lattice.size
S = sk.n_slots
P = lo.P
Rv = 2 * BLOCK * K
print(f"L={L} N={N} S={S} P={P} default XB={ps._pick_xb(L, S, K, P)}", file=sys.stderr)

data = system.host_data()
b0 = ps.pack_operator(data, sk, K, layout=lo)
v0 = np.zeros((N, BLOCK, K), dtype=system.dtype)
v0[N // 2, np.arange(K) % BLOCK, np.arange(K)] = 1.0
vp = ps.pack_vector(v0, sk, layout=lo)
inv = jnp.asarray(0.37, jnp.float32)
CP = None if INTERP else pltpu.CompilerParams(vmem_limit_bytes=ps.VMEM_LIMIT)


def specs(XB):
    rows = ps._pp_rows(K)
    b_spec = pl.BlockSpec((XB, 2 * S * 16, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    vm_spec = pl.BlockSpec((1, Rv, P), lambda i: ((XB * i - 1) % L, 0, 0), memory_space=pltpu.VMEM)
    vc_spec = pl.BlockSpec((XB, Rv, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    vp_spec = pl.BlockSpec((1, Rv, P), lambda i: ((XB * i + XB) % L, 0, 0), memory_space=pltpu.VMEM)
    tp_spec = pl.BlockSpec((XB, Rv, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    inv_spec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    y_spec = pl.BlockSpec((XB, Rv, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    pp_spec = pl.BlockSpec((XB, rows, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return b_spec, vm_spec, vc_spec, vp_spec, tp_spec, inv_spec, y_spec, pp_spec


def make_cheb(XB):
    """Production fused step at forced XB."""
    rows = ps._pp_rows(K)
    b_spec, vm_spec, vc_spec, vp_spec, tp_spec, inv_spec, y_spec, pp_spec = specs(XB)

    def kernel(b_ref, vm_ref, vc_ref, vp_ref, tp_ref, inv_ref, y_ref, pp_ref):
        vc = vc_ref[...]
        hv = ps._plane_stencil_body(
            sk, K, P, XB, ps._bload_from_ref(b_ref, sk), vm_ref[...], vc, vp_ref[...]
        )
        ps._cheb_tail(sk, K, P, XB, hv, vc, tp_ref[...], inv_ref[0, 0], y_ref, pp_ref)

    def call(b, t, p):
        t_next, pp = pl.pallas_call(
            kernel,
            grid=(L // XB,),
            in_specs=[b_spec, vm_spec, vc_spec, vp_spec, tp_spec, inv_spec],
            out_specs=(y_spec, pp_spec),
            out_shape=(
                jax.ShapeDtypeStruct(t.shape, jnp.float32),
                jax.ShapeDtypeStruct((L, rows, P), jnp.float32),
            ),
            interpret=INTERP,
            compiler_params=CP,
        )(b, t, t, t, p, jnp.asarray(inv, jnp.float32).reshape(1, 1))
        return t_next

    return call


def make_stream(XB):
    """DMA-only ceiling with identical block traffic."""
    rows = ps._pp_rows(K)
    b_spec, vm_spec, vc_spec, vp_spec, tp_spec, inv_spec, y_spec, pp_spec = specs(XB)

    def kernel(b_ref, vm_ref, vc_ref, vp_ref, tp_ref, inv_ref, y_ref, pp_ref):
        # Touch every input so no DMA is elided; single cheap FMA chain.
        s = (
            b_ref[0, 0, 0]
            + vm_ref[0, 0, 0]
            + vp_ref[0, 0, 0]
            + tp_ref[0, 0, 0]
            + inv_ref[0, 0]
        )
        y_ref[...] = vc_ref[...] + s
        pp_ref[...] = jnp.zeros(pp_ref.shape, jnp.float32)

    def call(b, t, p):
        t_next, pp = pl.pallas_call(
            kernel,
            grid=(L // XB,),
            in_specs=[b_spec, vm_spec, vc_spec, vp_spec, tp_spec, inv_spec],
            out_specs=(y_spec, pp_spec),
            out_shape=(
                jax.ShapeDtypeStruct(t.shape, jnp.float32),
                jax.ShapeDtypeStruct((L, rows, P), jnp.float32),
            ),
            interpret=INTERP,
            compiler_params=CP,
        )(b, t, t, t, p, jnp.asarray(inv, jnp.float32).reshape(1, 1))
        return t_next

    return call


def make_cheb_bulk(XB):
    """Production specs, but the operator block is materialized with ONE
    bulk load (the flat kernel's pattern) and row-sliced as a value,
    instead of 2·S·16 separate ref reads per grid step."""
    rows = ps._pp_rows(K)
    b_spec, vm_spec, vc_spec, vp_spec, tp_spec, inv_spec, y_spec, pp_spec = specs(XB)

    def kernel(b_ref, vm_ref, vc_ref, vp_ref, tp_ref, inv_ref, y_ref, pp_ref):
        S = sk.n_slots
        bb = b_ref[...].astype(jnp.float32)

        def bload(c, s, a, cb):
            return bb[:, ((c * S + s) * 4 + a) * 4 + cb, :]

        vc = vc_ref[...]
        hv = ps._plane_stencil_body(sk, K, P, XB, bload, vm_ref[...], vc, vp_ref[...])
        ps._cheb_tail(sk, K, P, XB, hv, vc, tp_ref[...], inv_ref[0, 0], y_ref, pp_ref)

    def call(b, t, p):
        t_next, pp = pl.pallas_call(
            kernel,
            grid=(L // XB,),
            in_specs=[b_spec, vm_spec, vc_spec, vp_spec, tp_spec, inv_spec],
            out_specs=(y_spec, pp_spec),
            out_shape=(
                jax.ShapeDtypeStruct(t.shape, jnp.float32),
                jax.ShapeDtypeStruct((L, rows, P), jnp.float32),
            ),
            interpret=INTERP,
            compiler_params=CP,
        )(b, t, t, t, p, jnp.asarray(inv, jnp.float32).reshape(1, 1))
        return t_next

    return call


def make_cheb_ext(XB):
    """Merged-fetch variant: ONE extended (XB+2)-plane window replaces the
    three vm/vc/vp fetches (start clamped at the array ends; the two wrap
    planes arrive through constant-map single-plane inputs, fetched once).
    Tests whether per-step DMA count is what holds the pipeline at ~59%."""
    from jax._src.pallas.core import Element

    rows = ps._pp_rows(K)
    nsteps = L // XB
    # Overlapping (XB+2)-plane windows need ELEMENT-indexed leading dim
    # (Blocked index maps are in block units, so overlap is inexpressible).
    ext_spec = pl.BlockSpec(
        (Element(XB + 2), Rv, P),
        lambda i: (jnp.clip(XB * i - 1, 0, L - XB - 2), 0, 0),
        memory_space=pltpu.VMEM,
    )
    b_spec = pl.BlockSpec((XB, 2 * S * 16, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    tp_spec = pl.BlockSpec((XB, Rv, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    wl_spec = pl.BlockSpec((1, Rv, P), lambda i: (L - 1, 0, 0), memory_space=pltpu.VMEM)
    wr_spec = pl.BlockSpec((1, Rv, P), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    inv_spec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    y_spec = pl.BlockSpec((XB, Rv, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    pp_spec = pl.BlockSpec((XB, rows, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    def kernel(b_ref, ext_ref, wl_ref, wr_ref, tp_ref, inv_ref, y_ref, pp_ref):
        i = pl.program_id(0)
        ext = ext_ref[...]
        first = i == 0
        last = i == nsteps - 1
        # Offset of vc within ext: 0 at the first step (clamped), 2 at the
        # last (clamped), 1 in the interior.
        vc = jnp.where(
            first, ext[0:XB], jnp.where(last, ext[2 : XB + 2], ext[1 : XB + 1])
        )
        vm = jnp.where(first, wl_ref[...], jnp.where(last, ext[1:2], ext[0:1]))
        vp = jnp.where(
            last, wr_ref[...], jnp.where(first, ext[XB : XB + 1], ext[XB + 1 : XB + 2])
        )
        hv = ps._plane_stencil_body(
            sk, K, P, XB, ps._bload_from_ref(b_ref, sk), vm, vc, vp
        )
        ps._cheb_tail(sk, K, P, XB, hv, vc, tp_ref[...], inv_ref[0, 0], y_ref, pp_ref)

    def call(b, t, p):
        t_next, pp = pl.pallas_call(
            kernel,
            grid=(nsteps,),
            in_specs=[b_spec, ext_spec, wl_spec, wr_spec, tp_spec, inv_spec],
            out_specs=(y_spec, pp_spec),
            out_shape=(
                jax.ShapeDtypeStruct(t.shape, jnp.float32),
                jax.ShapeDtypeStruct((L, rows, P), jnp.float32),
            ),
            interpret=INTERP,
            compiler_params=CP,
        )(b, t, t, t, p, jnp.asarray(inv, jnp.float32).reshape(1, 1))
        return t_next

    return call


def scan3(fn):
    @functools.partial(jax.jit, static_argnames=("n",))
    def run(b, v, n):
        def step(carry, _):
            t_prev, t_cur = carry
            return (t_cur, fn(b, t_cur, t_prev)), None
        (_, out), _ = jax.lax.scan(step, (v, v), None, length=n)
        return out.ravel()[0]
    return lambda n: float(run(b0, vp, n))


def slope(runner, n1, n2, reps=3):
    best = float("inf")
    runner(n1); runner(n2)
    for _ in range(reps):
        t0 = time.perf_counter(); runner(n1); t1 = time.perf_counter()
        runner(n2); t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (n2 - n1))
    return best


bytes_B = b0.size * 4
bytes_v = vp.size * 4
rows = ps._pp_rows(K)


def report(name, XB, t):
    nb = bytes_B + 3 * bytes_v + (2 + 2 / XB) * 0  # counted model below
    # Actual per-application traffic: B + vc + vm + vp + tp + y + pp.
    actual = bytes_B + (1 + 2.0 / XB + 1 + 1) * bytes_v + L * rows * P * 4
    model = bytes_B + 3 * bytes_v  # the bench's roofline model
    print(
        f"{name:12s} XB={XB}  {t*1e6:9.1f} µs/step  "
        f"actual {actual/t/1e9:6.1f} GB/s ({100*actual/t/819e9:5.1f}%)  "
        f"model {model/t/1e9:6.1f} GB/s ({100*model/t/819e9:5.1f}%)"
    )


candidates = [xb for xb in (10, 8, 5, 4, 2) if L % xb == 0]
if INTERP:
    # Correctness only: forced-XB kernels vs production step.
    want = np.asarray(ps._plane_cheb_step(b0, vp, vp, inv, sk, K)[0])
    for XB in candidates[:2]:
        got = np.asarray(make_cheb(XB)(b0, vp, vp))
        assert np.allclose(got, want, atol=1e-4), XB
        got_e = np.asarray(make_cheb_ext(XB)(b0, vp, vp))
        assert np.allclose(got_e, want, atol=1e-4), ("ext", XB)
    print("CORRECTNESS OK (interpret)", file=sys.stderr)
    sys.exit(0)

for XB in candidates:
    step_rows = 2 * S * 16 + 4 * Rv + rows
    vmem = 2 * XB * step_rows * P * 4
    if vmem > 28 * 2**20:
        print(f"skip XB={XB}: est {vmem/2**20:.0f} MiB VMEM", file=sys.stderr)
        continue
    for name, maker in (
        ("stream", make_stream),
        ("cheb", make_cheb),
        ("cheb_ext", make_cheb_ext),
        ("cheb_bulk", make_cheb_bulk),
    ):
        try:
            t = slope(scan3(maker(XB)), ORDER, 2 * ORDER)
            report(name, XB, t)
        except Exception as e:
            print(f"{name} XB={XB} failed: {type(e).__name__}: {str(e)[:120]}",
                  file=sys.stderr)
