"""Iterative interior/extremal eigensolver on the block-sparse SpMM.

[NEW SCOPE] — the reference computes the positive BdG spectrum *exactly* by
dense LAPACK factorization with ``subset_by_value=(0, ∞)``
(``bodge/hamiltonian.py:229``), an O(dim³) host solve.  The observables most
physics queries need, however, are the **few states nearest the Fermi
level** — minigaps (``reference tests/test_physics.py:342-387``), edge
states (``:300-339``), gap magnitudes — and for those this module provides
the TPU-native answer: **Chebyshev-filtered subspace iteration** driven by
the fused Pallas Chebyshev kernels.

Algorithm (Chebyshev-accelerated subspace iteration with Rayleigh–Ritz,
the block/filtered relative of thick-restart Lanczos — see Saad, *Numerical
Methods for Large Eigenvalue Problems*, ch. 5 & 7):

1.  Map spec(H) into [−1, 1] via the power-iteration bound `a` (same
    machinery as KPM).
2.  Apply an **even monotone low-pass filter in λ = |ε|²** (plateau 1 up
    to an adaptive cutoff at the block's own spectral boundary, Gaussian
    roll-off above), expanded in Chebyshev polynomials via a DCT, to a
    block of b = nev + buffer vectors.  Monotonicity guarantees the
    lowest states can never be filtered out; each application is `order`
    fused Pallas Chebyshev steps — the identical hot kernel the KPM
    layer uses, so the solver inherits its roofline performance.
3.  Orthonormalize, then Rayleigh–Ritz **in float64 on the host** against
    the exact ELL operator (one cheap host SpMM per iteration): signed
    Ritz values θ, rotated basis, per-column residuals ‖H y − θ y‖.
4.  Adapt σ and the expansion order from the current Ritz spectrum
    (sharpest filter the order budget can resolve) and iterate until the
    wanted residuals converge.

The device does all O(order · nnz · b) filtering work in f32; the host does
only O(dim · b²) dense algebra in f64, so Ritz values of converged states
carry O(residual²/gap) error — far below the 1e-6 parity gate against the
banded LAPACK solver (:mod:`bodge_tpu.ops.banded`).

Entry points: :func:`lowest_eigenstates` (nev lowest-|ε| signed eigenpairs)
and the ``method="lanczos"`` paths of ``Hamiltonian.diagonalize`` /
``eigenvalues`` / ``free_energy`` built on it.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .blocksparse import BLOCK, Skeleton
from .chebyshev import (
    _host,
    _is_planar,
    _operator_storage,
    _resolve_impl,
    _upgrade_to_pallas,
    jackson_kernel,
    spectral_bound,
)
from .spmm import spmm

# Expansion-order buckets: orders are rounded up to one of these so each
# chunk width compiles at most len(_ORDER_BUCKETS) scan programs; filter
# coefficients are traced values, so reshaping σ between iterations is free.
# High buckets exist because resolving dense gap-edge clusters (van Hove
# pile-up: level spacings ∝ 1/L²) legitimately needs orders in the tens of
# thousands — each step is one fused Pallas kernel pass, so a 32k-order
# sweep is seconds of device time.
_ORDER_BUCKETS = (
    64, 96, 128, 192, 256, 384, 512, 768, 1024, 1536, 2048,
    3072, 4096, 6144, 8192, 12288, 16384, 24576, 32768, 49152, 65536,
    98304, 131072,
)

# Chebyshev resolution constant: a degree-M expansion resolves spectral
# features down to width ≈ _RES_C / M (in the scaled variable) before
# truncation error dominates.
_RES_C = 7.0


def _bucket_order(order: int) -> int:
    for b in _ORDER_BUCKETS:
        if order <= b:
            return b
    return _ORDER_BUCKETS[-1]


def _filter_scan_body(H, v0, coeffs):
    """y = Σ_m c_m T_m(H̃) v0 by the three-term recursion (traced coeffs)."""
    t0 = v0
    t1 = H(v0)
    y = coeffs[0] * t0 + coeffs[1] * t1

    def step(carry, c):
        t_prev, t_cur, acc = carry
        t_next = 2.0 * H(t_cur) - t_prev
        return (t_cur, t_next, acc + c * t_next), None

    (_, _, y), _ = lax.scan(step, (t0, t1, y), coeffs[2:])
    return y


@functools.partial(jax.jit, static_argnames=("sk", "order", "impl"))
def _filter_apply_xla(data, sk: Skeleton, v0, coeffs, inv, order: int, impl: str):
    H = lambda v: spmm(data, sk, v, impl=impl) * inv
    return _filter_scan_body(H, v0, coeffs)


@functools.partial(jax.jit, static_argnames=("sk", "order"))
def _filter_apply_planar(dp, sk: Skeleton, vp, coeffs, inv, order: int):
    from . import planar as pl_ops

    H = lambda v: pl_ops.spmm_planar(dp, sk, v) * inv
    return _filter_scan_body(H, vp, coeffs)


@functools.partial(jax.jit, static_argnames=("sk", "order", "K"))
def _filter_apply_packed(b_packed, v0p, coeffs, inv, sk: Skeleton, order: int, K: int):
    """Filter application in the fused Pallas packed layout.

    Each recursion step is ONE fused kernel pass (`chebyshev_step_pallas`,
    minimum HBM traffic); the coefficient axpy runs as an XLA-fused
    elementwise update on the packed carry."""
    from .pallas_spmm import chebyshev_step_pallas

    inv_f = jnp.asarray(inv, jnp.float32)
    cf = jnp.asarray(coeffs, jnp.float32)
    t0 = v0p
    # Half-scaled first step gives t1 = H̃ t0 (the _moments_fused_body trick).
    t1, _ = chebyshev_step_pallas(b_packed, t0, jnp.zeros_like(t0), 0.5 * inv_f, sk, K)
    y = cf[0] * t0 + cf[1] * t1

    def step(carry, c):
        t_prev, t_cur, acc = carry
        t_next, _ = chebyshev_step_pallas(b_packed, t_cur, t_prev, inv_f, sk, K)
        return (t_cur, t_next, acc + c * t_next), None

    (_, _, y), _ = lax.scan(step, (t0, t1, y), cf[2:])
    return y


@functools.partial(jax.jit, static_argnames=("sk", "gl", "order", "K"))
def _filter_apply_gather(b, off, v0p, coeffs, inv, sk: Skeleton, gl, order: int, K: int):
    from .pallas_gather import spmm_gather_packed

    inv_f = jnp.asarray(inv, jnp.float32)
    cf = jnp.asarray(coeffs, jnp.float32)
    H = lambda v: spmm_gather_packed(b, off, v, sk, gl, K) * inv_f
    return _filter_scan_body(H, v0p, cf)


class _FilterEngine:
    """Caches the device-resident operator across filter applications.

    Chunks wide blocks into kernel-feasible column groups (the same policy
    as :func:`bodge_tpu.ops.chebyshev.moments`) so one packed operator
    serves the whole subspace iteration.
    """

    def __init__(self, data, sk: Skeleton, impl: Optional[str], operator_dtype=None):
        auto = impl in (None, "auto")
        impl = _resolve_impl(impl)
        self.sk = sk
        self.dtype = np.complex64 if _is_planar(data) else np.dtype(data.dtype)
        if auto:
            impl = _upgrade_to_pallas(impl, data, 8, sk)
        self.impl = impl
        self.chunk = None

        if impl == "pallas":
            from .pallas_spmm import pack_operator, plan, supported

            kc = next((k for k in (32, 16, 8, 4) if supported(sk, k)), None)
            if kc is None:
                self.impl = impl = "stencil" if sk.stencil else "gather"
            else:
                self.chunk = kc
                self._layout = plan(sk, kc)
                self._b_packed = pack_operator(
                    data, sk, kc, operator_dtype=_operator_storage(operator_dtype),
                    layout=self._layout,
                )
        if impl == "pallas_gather":
            from .pallas_gather import (
                pack_gather_offsets,
                pack_gather_operator,
                plan_gather,
            )

            kc = next((k for k in (32, 16, 8, 4) if plan_gather(sk, k)), None)
            if kc is None:
                self.impl = impl = "stencil" if sk.stencil else "gather"
            else:
                self.chunk = kc
                self._gl = plan_gather(sk, kc)
                self._b_gather = pack_gather_operator(
                    _host(data), sk, self._gl,
                    operator_dtype=_operator_storage(operator_dtype),
                )
                self._off = pack_gather_offsets(sk, self._gl)
        if impl == "planar":
            from . import planar as pl_ops

            self._dp = data if _is_planar(data) else pl_ops.to_planar(_host(data))
        elif impl in ("stencil", "gather"):
            self._data = jnp.asarray(data)

    def apply(self, V: np.ndarray, coeffs: np.ndarray, inv_scale: float) -> np.ndarray:
        """Filtered block Σ_m c_m T_m(H̃) V for host ``V: [N, 4, b]``."""
        order = _bucket_order(len(coeffs))
        cpad = np.zeros(order, dtype=np.float64)
        cpad[: len(coeffs)] = coeffs
        b = V.shape[-1]

        if self.impl == "pallas":
            from .pallas_spmm import pack_vector, unpack_vector

            kc = self.chunk
            outs = []
            for i0 in range(0, b, kc):
                cols = V[..., i0 : i0 + kc]
                pad = kc - cols.shape[-1]
                if pad:
                    cols = np.concatenate(
                        [cols, np.zeros(cols.shape[:-1] + (pad,), cols.dtype)], axis=-1
                    )
                vp = pack_vector(cols, self.sk, layout=self._layout)
                yp = _filter_apply_packed(
                    self._b_packed, vp, jnp.asarray(cpad, jnp.float32),
                    jnp.float32(inv_scale), self.sk, order, kc,
                )
                y = np.asarray(
                    unpack_vector(yp, self.sk, kc, self.dtype, layout=self._layout)
                )
                outs.append(y[..., : kc - pad] if pad else y)
            return np.concatenate(outs, axis=-1)

        if self.impl == "pallas_gather":
            from .pallas_gather import pack_gather_vector, unpack_gather_vector

            kc = self.chunk
            outs = []
            for i0 in range(0, b, kc):
                cols = V[..., i0 : i0 + kc]
                pad = kc - cols.shape[-1]
                if pad:
                    cols = np.concatenate(
                        [cols, np.zeros(cols.shape[:-1] + (pad,), cols.dtype)], axis=-1
                    )
                vp = pack_gather_vector(cols.astype(self.dtype), self.sk, self._gl)
                yp = _filter_apply_gather(
                    self._b_gather, self._off, vp, jnp.asarray(cpad, jnp.float32),
                    jnp.float32(inv_scale), self.sk, self._gl, order, kc,
                )
                y = np.asarray(
                    unpack_gather_vector(yp, self.sk, self._gl, kc, self.dtype)
                )
                outs.append(y[..., : kc - pad] if pad else y)
            return np.concatenate(outs, axis=-1)

        if self.impl == "planar":
            from . import planar as pl_ops

            vp = pl_ops.to_planar(np.ascontiguousarray(V.astype(self.dtype)))
            yp = _filter_apply_planar(
                self._dp, self.sk, vp, jnp.asarray(cpad, jnp.float32),
                jnp.float32(inv_scale), order,
            )
            return np.asarray(pl_ops.from_planar(yp, self.dtype))

        rdtype = np.zeros((), self.dtype).real.dtype
        y = _filter_apply_xla(
            self._data, self.sk, jnp.asarray(V.astype(self.dtype)),
            jnp.asarray(cpad, rdtype), jnp.asarray(inv_scale, rdtype),
            order, self.impl,
        )
        return np.asarray(y)


def _host_spmm_f64(data: np.ndarray, sk: Skeleton, V: np.ndarray) -> np.ndarray:
    """Exact complex128 host SpMM ``H @ V`` for the Rayleigh–Ritz stage.

    Slot-chunked so peak temporary memory stays O(N · 4 · b)."""
    N, S = sk.cols.shape
    Vc = V.astype(np.complex128, copy=False)
    Y = np.zeros_like(Vc)
    d = np.asarray(data).astype(np.complex128, copy=False)
    for s in range(S):
        valid = sk.cols[:, s] >= 0
        safe = np.where(valid, sk.cols[:, s], 0)
        contrib = np.einsum("nab,nbk->nak", d[:, s], Vc[safe], optimize=True)
        if not valid.all():
            contrib[~valid] = 0.0
        Y += contrib
    return Y


def _cheb_coeffs_dct(fn, order: int) -> np.ndarray:
    """Chebyshev coefficients via a DCT — O(M log M), so orders in the
    tens of thousands stay cheap (the dense cosine-matrix quadrature in
    :func:`chebyshev_coefficients` is O(M²) memory)."""
    from scipy.fft import dct

    Q = max(2 * order, 256)
    theta = np.pi * (np.arange(Q) + 0.5) / Q
    fx = fn(np.cos(theta))
    c = dct(fx, type=2, norm=None) / Q  # c_m = (2/Q) Σ f(cosθ_j) cos(mθ_j)
    c[0] /= 2.0
    return c[:order]


def _lowpass_coeffs(lam_c: float, w_lam: float, order: int) -> np.ndarray:
    """Jackson-damped even low-pass filter in λ = x²:

        f(x) = 1                               for x² ≤ λ_c
               exp(−((x² − λ_c)/w_λ)²)         for x² > λ_c

    Monotone non-increasing in |x| — the lowest-|ε| states always carry
    the maximum weight, so the filter can never suppress (and thereby
    lose) a wanted state, regardless of how wrong the current λ_c
    estimate is.  The plateau value 1 also removes the f32 dynamic-range
    problem a zero-centered Gaussian has for large-gap spectra.

    Odd coefficients are identically zero for an even target; they are
    zeroed explicitly so float quadrature noise cannot leak odd terms
    (which would break the ±ε symmetry of the filtered block)."""

    def f(x):
        ex = np.maximum(x * x - lam_c, 0.0) / w_lam
        return np.exp(-(ex**2))

    c = _cheb_coeffs_dct(f, order)
    c *= jackson_kernel(order)
    c[1::2] = 0.0
    return c


def _select_wanted(theta: np.ndarray, res: np.ndarray, nev: int):
    """Wanted-state selection from a ρ²-sorted signed RR output.

    Ranking ρ² alone is residual-inflated (it demotes a not-yet-converged
    member of a lower level below converged higher ones); ranking |θ|
    alone is mixture-unsafe.  "Genuine" must be judged RELATIVE to the
    pair's folded magnitude ρ = √(θ²+‖r‖²): a partially sign-mixed pair
    has ⟨H̃⟩ pulled toward zero and ‖r‖ ≈ ρ, so it would both pass any
    loose absolute threshold *and* win the |θ| sort over the true gap
    states (the round-5 L=100 failure mode: mixtures at θ=0.391 with
    ‖r‖=0.049 beat the true 0.39999 gap).  Rank genuine pairs
    (res < 0.3ρ, or absolutely small for zero modes) by |θ|; fall back
    to ρ² order until enough pairs are distinguishable."""
    rho = np.sqrt(theta**2 + res**2)
    genuine = np.where((res < 0.3 * rho) | (res < 1e-3))[0]
    if len(genuine) >= nev:
        sel = genuine[np.argsort(np.abs(theta[genuine]), kind="stable")]
    else:
        sel = np.arange(len(theta))
    return genuine, sel[:nev]


def _signed_rayleigh_ritz(hspmm, Q: np.ndarray, W: np.ndarray):
    """Exact signed Rayleigh–Ritz on span{Q, H̃Q}.

    ``Q`` must have orthonormal columns and ``W = H̃Q``.  The augmentation
    resolves the ±ε sign structure exactly: an even spectral filter leaves
    the block as arbitrary particle–hole mixtures inside each ±|ε| shell,
    and span{q, H̃q} contains the separate ± components of any mixture.

    Ranking |θ| alone is unsafe: a junk direction (mixture of high-|ε|
    states with random signs) has ⟨H̃⟩ ≈ 0 and would outrank genuine
    gap-edge states.  The folded Rayleigh quotient ρ² = ⟨x|H̃²|x⟩ =
    θ² + ‖r‖² is variationally bounded below by the true squared gap, so
    sorting by ρ² can never promote junk above a genuine low-|ε| state.

    Host-flops layout (the 2-core host is the large-system bottleneck):
    the augmentation is orthonormalized by CGS(×2)+QR against Q instead
    of an SVD of [Q, W], and residual norms come from the Gram matrix
    ‖r_j‖² = (Uᴴ·HCᴴHC·U)_jj − θ_j² instead of a full residual GEMM.

    Returns ``(theta, X, rnorm)`` ρ²-sorted (scaled units)."""
    Wp = W.copy()
    for _ in range(2):
        Wp -= Q @ (Q.conj().T @ Wp)
    Qw, Rw = np.linalg.qr(Wp)
    dR = np.abs(np.diag(Rw))
    # ABSOLUTE cutoff (H̃-scaled units, ‖W‖ ≤ 1): a near-dependent column
    # whose QR remainder is ~1e-13 amplifies its 1e-15-level Q-leakage to
    # 1e-2 when normalized — one such column destroyed C's orthonormality
    # at 5e-3 and degraded EVERY Ritz pair of a converged basis.  Columns
    # below 1e-8 carry no usable augmentation direction (the useful ones
    # are residual directions, norm ≈ the Ritz residual).
    keep = dR > 1e-8
    Qw = Qw[:, keep]
    if Qw.shape[1]:
        # Kept near-threshold directions still leak O(1e-7·√m); one more
        # projection sweep + re-QR pushes C's orthonormality to ~1e-12.
        Qw -= Q @ (Q.conj().T @ Qw)
        Qw, _ = np.linalg.qr(Qw)
    C = np.concatenate([Q, Qw], axis=1)
    HC = hspmm(C)
    T = C.conj().T @ HC
    T = 0.5 * (T + T.conj().T)
    G2 = HC.conj().T @ HC
    G2 = 0.5 * (G2 + G2.conj().T)
    th, U = np.linalg.eigh(T)
    rho2 = np.real(np.einsum("ij,ik,kj->j", U.conj(), G2, U, optimize=True))
    rn = np.sqrt(np.maximum(rho2 - th**2, 0.0))
    X = C @ U
    idx = np.argsort(th**2 + rn**2, kind="stable")
    return th[idx], X[:, idx], rn[idx]


def lowest_eigenstates(
    data,
    sk: Skeleton,
    nev: int,
    *,
    tol: float = 2e-8,
    max_iter: int = 20,
    max_order: int = 131072,
    polish: int = 1,
    block: Optional[int] = None,
    max_block: Optional[int] = None,
    impl: Optional[str] = None,
    operator_dtype=None,
    scale: Optional[float] = None,
    seed: int = 7,
    full_output: bool = False,
):
    """The ``nev`` lowest-|ε| eigenpairs of the BdG operator.

    Returns ``(E, X)`` with ``E: [nev]`` signed eigenvalues sorted
    ascending and ``X: [4N, nev]`` orthonormal eigenvector columns
    (LAPACK column convention), or ``(E, X, info)`` with
    ``full_output=True``.  By particle–hole symmetry the set contains the
    ±ε partners, so ``nev = 2k`` yields the k smallest positive states.

    Each round applies one device-side f32 Chebyshev filter sweep to a
    block of ``block`` vectors, then an exact float64 signed
    Rayleigh–Ritz on span{Q, H̃Q} (see the module docstring).  ``tol``
    gates the *eigenvalue stability* between rounds in units of the
    spectral scale: iteration stops once every wanted θ moves by less
    than ``tol·scale``.  Because the variational eigenvalue error scales
    as the *square* of the block's out-of-subspace weight, converged
    eigenvalues match the exact banded LAPACK solver far inside 1e-6 even
    for dense gap-edge clusters with level spacings near 1e-6·scale.

    Reference analog: ``scipy.linalg.eigh(..., subset_by_value=(0, ∞))``
    (``bodge/hamiltonian.py:229``) — exact but O(dim³) on the host; this
    routine is O(iters · order · nnz · b) on the device plus
    O(iters · dim · b²) float64 dense algebra on the host.
    """
    N = sk.n_sites
    dim = N * BLOCK
    if nev < 1:
        raise ValueError("nev must be >= 1")
    b = block or min(dim, max(nev + max(nev // 2, 8), 16))
    b = min(b, dim)
    # Ceiling for adaptive block growth (dense-cluster handling); the
    # host-side dense algebra is O(dim·b²), so the cap keeps it bounded.
    # Pass max_block to raise it when a near-degenerate window is wider
    # than 8·nev states (e.g. the clean 100×100 gap edge: ~130 states
    # within the max-order filter resolution).
    b_max = max_block or min(dim // 4, max(8 * nev, 128))

    if _is_planar(data):
        raise ValueError(
            "lowest_eigenstates expects complex ELL block data (host or "
            "device); planar-packed operators are produced internally"
        )
    host_data = _host(data)

    # Tiny systems: the subspace would be a sizable fraction of the whole
    # space — a direct dense host solve is both faster and exact.
    if b * 4 >= dim or dim <= 512:
        from .blocksparse import ell_to_dense

        E, X = np.linalg.eigh(ell_to_dense(host_data, sk))
        idx = np.argsort(np.abs(E), kind="stable")[:nev]
        idx = idx[np.argsort(E[idx], kind="stable")]
        info = {"iterations": 0, "residuals": np.zeros(nev), "method": "dense-fallback"}
        return (E[idx], X[:, idx], info) if full_output else (E[idx], X[:, idx])

    if scale is None:
        scale = spectral_bound(data, sk, impl=impl)
    inv_scale = 1.0 / scale

    engine = _FilterEngine(data, sk, impl, operator_dtype=operator_dtype)

    rng = np.random.default_rng(seed)
    V = (
        rng.standard_normal((N, BLOCK, b)) + 1j * rng.standard_normal((N, BLOCK, b))
    ).astype(np.complex128)

    def hspmm(M2d: np.ndarray) -> np.ndarray:
        cols = M2d.shape[1]
        return (
            _host_spmm_f64(host_data, sk, M2d.reshape(N, BLOCK, cols)).reshape(
                dim, cols
            )
            * inv_scale
        )

    # Filtered subspace iteration.  Each round: one device-side f32 filter
    # application (the O(order·nnz·b) work), then an exact float64 signed
    # Rayleigh–Ritz on span{Q, H̃Q}.  The filter's job is to purge "junk"
    # (weight outside the low-|ε| region) — measured decay ≈4× per
    # application down to an f32-noise floor of ~1e-5 — while the exact RR
    # resolves everything *inside* the captured region (dense gap-edge
    # clusters included) to machine precision.  Variational eigenvalue
    # error scales as junk², so θ converges far below the junk floor; the
    # convergence test is therefore eigenvalue *stability*, not residual
    # (which saturates at ~junk·‖H‖).
    # Iteration 0: a soft monotone low-pass (no spectral information yet).
    lam_c, w_lam, sigma_x, order = 0.0, 0.09, 0.3, 256
    spmm_count = 0
    history = []
    theta = X = res = None
    prev_wanted = None
    converged = False
    stuck = 0  # consecutive stagnant rounds at max order AND max block
    prev_res = None

    for it in range(max_iter):
        coeffs = _lowpass_coeffs(lam_c, w_lam, order)
        Y = engine.apply(V, coeffs, inv_scale)  # [N, 4, b] complex64-ish
        spmm_count += _bucket_order(order)

        Q, _ = np.linalg.qr(Y.reshape(dim, b).astype(np.complex128))
        W = hspmm(Q)

        # Steer the filter from the FOLDED Ritz values (eigenvalues of
        # Bᴴ H̃² B = WᴴW): monotone and spurious-free, unlike signed Ritz
        # values which sign-mix inside degenerate ±ε shells.
        T2 = W.conj().T @ W
        T2 = 0.5 * (T2 + T2.conj().T)
        lam = np.linalg.eigvalsh(T2)
        x_edge = float(np.sqrt(max(lam[min(nev, b) - 1], 0.0)))
        x_buf = float(np.sqrt(max(lam[-1], 0.0)))

        theta, X, res = _signed_rayleigh_ritz(hspmm, Q, W)
        genuine, wanted_idx = _select_wanted(theta, res, nev)
        wanted = np.sort(theta[wanted_idx])
        wanted_res = res[wanted_idx].max()
        history.append((sigma_x, order, float(wanted_res), float(x_edge), b))
        if os.environ.get("BODGE_LANCZOS_VERBOSE"):
            import sys

            print(
                f"[lanczos] it={it} b={b} order={order} σ={sigma_x:.2e} "
                f"x_edge={x_edge:.5f} x_buf={x_buf:.5f} res={wanted_res:.2e} "
                f"genuine={len(genuine)}",
                file=sys.stderr, flush=True,
            )

        if prev_wanted is not None:
            dtheta = np.abs(wanted - prev_wanted).max()
            if dtheta < tol and wanted_res < 5e-4:
                converged = True
                break
        prev_wanted = wanted

        # --- adapt the filter --------------------------------------------
        # The filter's only job is to suppress weight ABOVE the block's
        # own boundary (everything below is resolved exactly by the RR),
        # so the sharpness target is the b-boundary gap.  σ = gap/3 gives
        # ~1e-4 suppression per application at the buffer edge — measured
        # necessary: a lazier 10×/pass target (gap/1.5) converged the
        # 100×100 window at only ~1.3×/iteration because refresh columns
        # and intra-window shuffling re-inject weight every round.
        sigma_res = max(_RES_C / max_order, _RES_C / (4.0 * dim))
        sigma_target = max((x_buf - x_edge) / 3.0, 1e-12)
        sigma_x = float(np.clip(sigma_target, sigma_res, 0.5))
        order = _bucket_order(int(np.ceil(_RES_C / sigma_x)))
        sigma_x = max(sigma_x, _RES_C / order / 4.0)
        # One-sided low-pass in λ = x²: cutoff half an edge-width above
        # the (variational, hence from-above) wanted-edge estimate.
        w_lam = max(2.0 * x_edge * sigma_x, sigma_x**2)
        lam_c = x_edge**2 + 0.5 * w_lam

        # --- adapt the block size ----------------------------------------
        # Dense spectral clusters (the van Hove pile-up at a 2D gap edge:
        # level spacings ∝ 1/L²) defeat any *fixed* block: if the buffer
        # edge x_buf is within the filter's resolution of the wanted edge,
        # the block converges to an arbitrary subspace of the cluster
        # instead of the lowest states.  Grow the block until the boundary
        # sticks out beyond what the order budget can discriminate; the
        # augmented RR already produced ~2b Ritz vectors, so the
        # next-lowest ones extend the block for free.
        # Growth is preferred over extreme order escalation: in a van Hove
        # ladder the block-boundary gap grows ~quadratically with b, so
        # doubling the block cuts the required order ~4× — cheaper than
        # 10k+-order sweeps once host RR cost (∝ b²) is weighed in.
        b_new = b
        grow_at = max(sigma_res, _RES_C / min(max_order, 8192))
        if sigma_target < grow_at and b < b_max and it + 1 < max_iter:
            b_new = int(min(b_max, max(b + 8, (3 * b // 2 + 7) // 8 * 8)))
        elif (
            sigma_target < sigma_res
            and b >= b_max
            and prev_res is not None
            and wanted_res > 0.7 * prev_res
        ):
            # Resolution wall: the block boundary sits inside the filter's
            # discriminable width at max order and max block AND the
            # residual has stopped improving — more rounds cannot help;
            # stop early and report the honest state instead of burning
            # the budget.  (A nominally resolution-capped filter can still
            # converge at ~0.4×/pass — only stagnation proves the wall.)
            stuck += 1
            if stuck >= 3:
                break
        else:
            stuck = 0
        prev_res = wanted_res
        # A polynomial filter maps span → span: any direction the block
        # ever loses (e.g. an unconverged member of a degenerate multiplet
        # cut by truncation) can never be regenerated from within.  A few
        # fresh random columns per round re-seed such directions; the
        # filter + ρ²-ranked RR clean them up within an iteration.
        r_fresh = max(4, b_new // 8)
        keep = min(b_new - r_fresh, X.shape[1])
        extra = rng.standard_normal((dim, b_new - keep)) + 1j * (
            rng.standard_normal((dim, b_new - keep))
        )
        V = np.concatenate([X[:, :keep], extra], axis=1)
        b = b_new
        V = V.reshape(N, BLOCK, b)

    # Final exact polish: Krylov-augmented f64 RR rounds on the (now
    # junk-clean) subspace.  The filter's f32 noise floors the block
    # accuracy at ~√order·1e-7 (3.6e-5 at order 131k), and the main
    # loop's RR squeezes the eigenvalue error to ~res²/gap_eff — observed
    # 3.1e-6 at the 100×100 headline, just above the 1e-6 parity gate.
    # Each polish round re-expands with exact H̃ images and re-solves,
    # gaining another res factor.  The FULL current subspace is kept
    # (capped) — truncating to a wanted neighborhood can drop a member of
    # a near-degenerate multiplet whose vector then cannot be recovered.
    for _ in range(polish):
        q = min(X.shape[1], 768)
        Yp, _ = np.linalg.qr(X[:, :q])
        theta, X, res = _signed_rayleigh_ritz(hspmm, Yp, hspmm(Yp))
        genuine, wanted_idx = _select_wanted(theta, res, nev)

    E, Xw, res_w = (
        theta[wanted_idx] * scale,
        X[:, wanted_idx],
        res[wanted_idx] * scale,
    )
    asc = np.argsort(E, kind="stable")
    E, Xw, res_w = E[asc], Xw[:, asc], res_w[asc]
    info = {
        "iterations": len(history),
        "residuals": res_w / scale,
        "scale": scale,
        "spmm_applications": spmm_count,
        "history": history,
        "impl": engine.impl,
        "method": "chebyshev-filtered subspace iteration",
        "converged": converged,
    }
    if not converged:
        import warnings

        warnings.warn(
            f"lowest_eigenstates: eigenvalues not stabilized to "
            f"tol={tol:g}·scale within {len(history)} filter iterations "
            f"(max rel. residual {float((res_w / scale).max()):.2e})",
            RuntimeWarning,
            stacklevel=2,
        )
    return (E, Xw, info) if full_output else (E, Xw)
