"""Planar (split-complex) device compute path: float32 re/im planes.

TPU hardware has no native complex arithmetic — XLA lowers complex ops to
real pairs, and on some PJRT backends (notably the tunnelled-TPU plugin
this build targets) many complex lowerings are *unimplemented or
unreliable*: complex `lax.scan` carries, chained complex dynamic-update-
slices, and complex `eigh` all fail with ``UNIMPLEMENTED`` while their f32
counterparts run fine.  Splitting complex data into explicit (re, im)
float32 planes is therefore both the robust and the performance-native
representation for the device path (it is exactly what the Pallas kernel
already does internally).

Representation:

    operator  ``dp: [2, N, S, 4, 4] float32``   (plane 0 = Re, 1 = Im)
    vectors   ``vp: [2, N, 4, K] float32``

Complex semantics are recovered on the host boundary.  The dense
eigensolver uses the standard real-equivalent embedding of a Hermitian
matrix H = R + iI:

    A = [[R, -I], [I, R]]   (real symmetric, 2d × 2d)

whose spectrum is that of H with every eigenvalue doubled, and whose
eigenvector (u; v) maps to the complex eigenvector u + iv.

Reference analog: none (the reference runs complex128 on CPU/LAPACK,
``bodge/hamiltonian.py:228-230``); this is the [NEW SCOPE] TPU-native
numeric tier.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .blocksparse import BLOCK, Skeleton

REAL_DTYPE = jnp.float32


# ---------------------------------------------------------------------------
# Representation converters (host boundary).
# ---------------------------------------------------------------------------
def to_planar(data) -> jnp.ndarray:
    """Complex array (host or device) → planar ``[2, ...]`` float32.

    Host NumPy input is split on the host so the device never sees a
    complex buffer.
    """
    if isinstance(data, np.ndarray):
        out = np.empty((2,) + data.shape, dtype=np.float32)
        out[0] = data.real
        out[1] = data.imag
        return jnp.asarray(out)
    return jnp.stack(
        [jnp.real(data).astype(REAL_DTYPE), jnp.imag(data).astype(REAL_DTYPE)]
    )


def from_planar(vp, dtype=np.complex64) -> np.ndarray:
    """Planar ``[2, ...]`` → complex NumPy array."""
    vp = np.asarray(vp)
    return (vp[0] + 1j * vp[1]).astype(dtype)


# ---------------------------------------------------------------------------
# SpMM
# ---------------------------------------------------------------------------
def spmm_planar_stencil(dp, sk: Skeleton, vp):
    """Stencil SpMM in planar form: ``y = H @ v`` with H = Hre + i·Him.

    ``dp: [2, N, S, 4, 4]``, ``vp: [2, N, 4, K]`` → ``[2, N, 4, K]``.
    Four real einsum streams per slot; wrap-around rolls carry periodic
    links exactly as in the complex stencil (:func:`spmm.spmm_stencil`).
    """
    Lx, Ly, Lz = sk.shape
    K = vp.shape[-1]
    v3 = vp.reshape(2, Lx, Ly, Lz, BLOCK, K)
    d3 = dp.reshape(2, Lx, Ly, Lz, sk.n_slots, BLOCK, BLOCK)

    def acc(y, b, v):
        # (yr, yi) += (br + i bi) @ (vr + i vi)
        br, bi = b[0], b[1]
        vr, vi = v[0], v[1]
        yr = y[0] + jnp.einsum("xyzab,xyzbk->xyzak", br, vr) - jnp.einsum(
            "xyzab,xyzbk->xyzak", bi, vi
        )
        yi = y[1] + jnp.einsum("xyzab,xyzbk->xyzak", br, vi) + jnp.einsum(
            "xyzab,xyzbk->xyzak", bi, vr
        )
        return (yr, yi)

    zero = jnp.zeros(v3.shape[1:], dtype=vp.dtype)
    y = (zero, zero)
    y = acc(y, d3[:, ..., 0, :, :], v3)
    for s, (axis, d) in enumerate(sk.slots):
        if axis < 0:
            continue
        shifted = jnp.roll(v3, shift=-d, axis=1 + axis)
        y = acc(y, d3[:, ..., s, :, :], shifted)

    return jnp.stack(y).reshape(2, -1, BLOCK, K)


def spmm_planar_gather(dp, sk: Skeleton, vp):
    """Gather-based planar SpMM for non-stencil skeletons."""
    safe_cols = np.where(sk.valid, sk.cols, 0)
    g = vp[:, safe_cols]  # [2, N, S, 4, K]
    br, bi = dp[0], dp[1]
    vr, vi = g[0], g[1]
    yr = jnp.einsum("nsab,nsbk->nak", br, vr) - jnp.einsum("nsab,nsbk->nak", bi, vi)
    yi = jnp.einsum("nsab,nsbk->nak", br, vi) + jnp.einsum("nsab,nsbk->nak", bi, vr)
    return jnp.stack([yr, yi])


def spmm_planar(dp, sk: Skeleton, vp):
    if sk.stencil:
        return spmm_planar_stencil(dp, sk, vp)
    return spmm_planar_gather(dp, sk, vp)


# ---------------------------------------------------------------------------
# KPM moment scans (planar carries are plain f32 — scan-safe everywhere).
# ---------------------------------------------------------------------------
def _inner_planar(a, b):
    """Re⟨a|b⟩ per probe column: ``[2, N, 4, K] × [2, N, 4, K] → [K]``."""
    return jnp.sum(a[0] * b[0] + a[1] * b[1], axis=(0, 1))


@partial(jax.jit, static_argnames=("sk", "order"))
def moments_planar(dp, sk: Skeleton, vp, inv_scale, order: int):
    """Chebyshev moments μ_m[k] with the doubled-moment recursion."""
    from .chebyshev import _doubled_moment_scan

    def H(v):
        return spmm_planar(dp, sk, v) * inv_scale

    return _doubled_moment_scan(H, _inner_planar, vp, order)


@partial(jax.jit, static_argnames=("sk", "order"))
def trace_fn_planar(dp, sk: Skeleton, probes, coeffs, inv_scale, order: int):
    """Σ_m c_m Σ_k ⟨z_k|T_m(H̃)|z_k⟩ (trace-estimator scan)."""
    from .chebyshev import _doubled_moment_scan

    def H(v):
        return spmm_planar(dp, sk, v) * inv_scale

    def inner(a, b):
        return jnp.sum(a[0] * b[0] + a[1] * b[1])

    mu = _doubled_moment_scan(H, inner, probes, order)
    return jnp.dot(coeffs[: mu.shape[0]], mu)


@partial(jax.jit, static_argnames=("sk", "iters"))
def _power_iteration_planar(dp, sk: Skeleton, vp, iters: int):
    def step(v, _):
        w = spmm_planar(dp, sk, v)
        norm = jnp.sqrt(jnp.sum(w[0] ** 2 + w[1] ** 2))
        return w / norm, norm

    v0 = vp / jnp.sqrt(jnp.sum(vp[0] ** 2 + vp[1] ** 2))
    _, norms = lax.scan(step, v0, None, length=iters)
    return norms[-1]


def spectral_bound_planar(dp, sk: Skeleton, iters: int = 60, seed: int = 0) -> float:
    """‖H‖₂ estimate by planar power iteration (+5% headroom)."""
    rng = np.random.default_rng(seed)
    vp = jnp.asarray(rng.normal(size=(2, sk.n_sites, BLOCK, 1)).astype(np.float32))
    return float(_power_iteration_planar(dp, sk, vp, iters)) * 1.05


# ---------------------------------------------------------------------------
# Assembly (device-side symmetry writes, all-f32)
# ---------------------------------------------------------------------------
@lru_cache(maxsize=64)
def _assemble_kernel_planar(sk: Skeleton, has_onsite, has_pair_onsite, has_hop,
                            has_pair, reset):
    """Planar analog of the complex assembly kernel: H-block writes become
    paired re/im writes (−conj(v) → (−re, +im); v† → (reᵀ, −imᵀ))."""
    valid_masks = [
        (sk.cols[:, s] >= 0)[:, None, None] for s in range(sk.n_slots)
    ]

    def fn(dp, onsite_v, pair_onsite_v, hop_v, pair_v, pair_rev_v):
        if reset:
            dp = jnp.zeros_like(dp)
        if has_onsite:
            o = onsite_v  # [2, N, 2, 2]
            dp = dp.at[0, :, 0, 0:2, 0:2].set(o[0])
            dp = dp.at[1, :, 0, 0:2, 0:2].set(o[1])
            dp = dp.at[0, :, 0, 2:4, 2:4].set(-o[0])
            dp = dp.at[1, :, 0, 2:4, 2:4].set(o[1])
        if has_pair_onsite:
            p = pair_onsite_v
            pT = jnp.swapaxes(p, -1, -2)
            dp = dp.at[0, :, 0, 0:2, 2:4].set(p[0])
            dp = dp.at[1, :, 0, 0:2, 2:4].set(p[1])
            dp = dp.at[0, :, 0, 2:4, 0:2].set(pT[0])
            dp = dp.at[1, :, 0, 2:4, 0:2].set(-pT[1])
        for s in range(1, sk.n_slots):
            mask = valid_masks[s]
            if not mask.any():
                continue
            k = s - 1
            if has_hop:
                hr = jnp.where(mask, hop_v[0, k], dp[0, :, s, 0:2, 0:2])
                hi = jnp.where(mask, hop_v[1, k], dp[1, :, s, 0:2, 0:2])
                dp = dp.at[0, :, s, 0:2, 0:2].set(hr)
                dp = dp.at[1, :, s, 0:2, 0:2].set(hi)
                dp = dp.at[0, :, s, 2:4, 2:4].set(
                    jnp.where(mask, -hr, dp[0, :, s, 2:4, 2:4])
                )
                dp = dp.at[1, :, s, 2:4, 2:4].set(
                    jnp.where(mask, hi, dp[1, :, s, 2:4, 2:4])
                )
            if has_pair:
                pr = jnp.where(mask, pair_v[0, k], dp[0, :, s, 0:2, 2:4])
                pi = jnp.where(mask, pair_v[1, k], dp[1, :, s, 0:2, 2:4])
                rT = jnp.swapaxes(pair_rev_v[:, k], -1, -2)
                dp = dp.at[0, :, s, 0:2, 2:4].set(pr)
                dp = dp.at[1, :, s, 0:2, 2:4].set(pi)
                dp = dp.at[0, :, s, 2:4, 0:2].set(
                    jnp.where(mask, rT[0], dp[0, :, s, 2:4, 0:2])
                )
                dp = dp.at[1, :, s, 2:4, 0:2].set(
                    jnp.where(mask, -rT[1], dp[1, :, s, 2:4, 0:2])
                )
        return dp

    return jax.jit(fn)


# ---------------------------------------------------------------------------
# Hermiticity check
# ---------------------------------------------------------------------------
@lru_cache(maxsize=1)
def _herm_planar_jit():
    def impl(dp, sk: Skeleton):
        safe_cols = np.where(sk.valid, sk.cols, 0)
        trans = sk.trans_slot if sk.trans_slot.ndim == 2 else sk.trans_slot[None, :]
        mirror = dp[:, safe_cols, trans]  # [2, N, S, 4, 4]
        mT = jnp.swapaxes(mirror, -1, -2)
        dr = dp[0] - mT[0]
        di = dp[1] + mT[1]
        diff = jnp.sqrt(dr * dr + di * di)
        return jnp.max(diff * sk.valid[..., None, None])

    return jax.jit(impl, static_argnames=("sk",))


def hermiticity_error_planar(dp, sk: Skeleton):
    """max elementwise |H−H†| (true complex modulus from the re/im planes) —
    the same quantity the reference gates at 1e-6
    (``bodge/hamiltonian.py:121-122``)."""
    return _herm_planar_jit()(dp, sk)


# ---------------------------------------------------------------------------
# Dense spectra via the real-equivalent embedding
# ---------------------------------------------------------------------------
def dense_embedding(dp, sk: Skeleton):
    """Planar ELL → real-symmetric embedding ``A = [[R, −I], [I, R]]``.

    ``A`` is ``[2d, 2d]`` float32 with d = 4N; its spectrum is spec(H)
    doubled.
    """
    N, S = sk.cols.shape
    d = sk.matrix_dim
    rows, slots = np.nonzero(sk.valid)
    cols = sk.cols[rows, slots]

    dense = jnp.zeros((2, N, BLOCK, N, BLOCK), dtype=dp.dtype)
    # Non-adjacent advanced indices move their axis to the front: the
    # target slice is [nnz, 2, 4, 4], so the blocks need the same layout.
    dense = dense.at[:, rows, :, cols, :].set(
        jnp.moveaxis(dp[:, rows, slots], 0, 1)
    )
    R = dense[0].reshape(d, d)
    I = dense[1].reshape(d, d)
    top = jnp.concatenate([R, -I], axis=1)
    bot = jnp.concatenate([I, R], axis=1)
    return jnp.concatenate([top, bot], axis=0)


@jax.jit
def _eigvalsh_f32(A):
    return jnp.linalg.eigvalsh(A)


def eigvalsh_planar(dp, sk: Skeleton) -> np.ndarray:
    """All eigenvalues of H (each once), ascending, via the embedding."""
    A = dense_embedding(dp, sk)
    E2 = np.asarray(_eigvalsh_f32(A))
    # Every eigenvalue of H appears exactly twice in ascending E2; taking
    # every second entry recovers spec(H) regardless of intra-pair order.
    return E2[0::2]


@jax.jit
def _eigh_f32(A):
    return jnp.linalg.eigh(A)


def eigh_planar(dp, sk: Skeleton):
    """(E, X) of H via the embedding; X reconstructed as u + iv.

    Within the artificial 2-fold doubling any real eigenvector maps to the
    same complex eigenvector up to a complex scalar, so taking every second
    embedding vector gives a valid complex eigenbasis for simple
    eigenvalues.  For *physically* degenerate multiplets the mapped vectors
    are re-orthonormalized on the host (complex QR over each cluster).
    """
    d = sk.matrix_dim
    A = dense_embedding(dp, sk)
    E2, V2 = _eigh_f32(A)
    E2 = np.asarray(E2)
    V2 = np.asarray(V2)
    E = E2[0::2]
    X = (V2[:d, 0::2] + 1j * V2[d:, 0::2]).astype(np.complex64)
    X /= np.linalg.norm(X, axis=0, keepdims=True)

    # Degenerate clusters: the naive every-second pick can be complex-
    # linearly dependent inside a physical multiplet.  Rebuild each cluster
    # from ALL 2m embedding vectors: their complex images span exactly the
    # m-dimensional eigenspace, so the m leading left singular vectors are
    # an orthonormal eigenbasis.
    tol = max(1e-4, 1e-6 * max(1.0, float(np.max(np.abs(E)))))
    start = 0
    for k in range(1, len(E) + 1):
        if k == len(E) or E[k] - E[start] > tol:
            m = k - start
            if m > 1:
                C = (
                    V2[:d, 2 * start : 2 * k] + 1j * V2[d:, 2 * start : 2 * k]
                ).astype(np.complex64)
                Q, _, _ = np.linalg.svd(C, full_matrices=False)
                X[:, start:k] = Q[:, :m]
            start = k
    return E, X
