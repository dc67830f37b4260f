"""Dense spectral solvers: diagonalization, free energy, exact-resolvent LDOS.

These are the XLA equivalents of the reference's dense solver layer:

- ``eigh_positive``: `jnp.linalg.eigh` + positive-spectrum extraction.  JAX
  has no ``subset_by_value`` (reference: ``bodge/hamiltonian.py:228-230``),
  so we compute the full spectrum and keep the upper half — by particle-hole
  symmetry the BdG spectrum comes in ±ε pairs, so the ascending upper half
  *is* the positive subset, with static shapes that jit cleanly.
- ``free_energy_from_spectrum``: F = U − T·S with U = −½Σε and
  S = Σ log(1+e^(−ε/T)) over positive ε (``bodge/hamiltonian.py:305-319``,
  Appendix C of Ouassou et al. PRB 109, 174506).
- ``ldos_exact``: the reference computes LDOS by solving
  [(ε+iΓ)I − H] X = B with a sparse LU per energy
  (``bodge/hamiltonian.py:323-387``).  Sparse LU has no TPU analog; for the
  same *exact* observable we evaluate the resolvent spectrally:
  G_αα(ε+iΓ) = Σ_n |X_{iα,n}|² / (ε+iΓ−E_n), which is identical to the
  solve because both compute the exact diagonal resolvent elements.
  ρ(+ε) comes from the electron components and ρ(−ε) from the hole
  components at the same positive ε (particle-hole trick, reference
  ``hamiltonian.py:349, 377-382``).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from .blocksparse import BLOCK


@partial(jax.jit, static_argnames=())
def _eigh(H):
    return jnp.linalg.eigh(H)


def eigh_positive(H):
    """Eigenvalues/vectors of Hermitian ``H``, restricted to the upper half.

    Returns ``(E, X)`` with E ascending, ``X[:, n]`` the eigenvector of
    ``E[n]``; exactly ``dim/2`` pairs are returned (Nambu doubling).
    """
    E, X = _eigh(H)
    half = H.shape[-1] // 2
    return E[half:], X[:, half:]


def free_energy_from_spectrum(E_pos, temperature: float):
    """Landau free energy from the positive BdG spectrum."""
    T = float(temperature)
    if T < 0:
        raise ValueError("Expected non-negative temperature!")
    U = -0.5 * jnp.sum(E_pos)
    if T == 0:
        return U
    S = jnp.sum(jnp.log1p(jnp.exp(-E_pos / T)))
    return U - T * S


@jax.jit
def _resolvent_ldos(E, w_e, w_h, energies, gammas):
    """ρ(±ε_n) from spectral weights at one site.

    Args:
        E: full spectrum ``[4N]``.
        w_e / w_h: electron / hole weights ``[4N]`` at the probed site
            (|X|² summed over spin).
        energies: positive probe energies ``[M]``.
        gammas: Lorentzian broadenings ``[M]``.

    Returns:
        ``(ρ_plus, ρ_minus)`` each ``[M]``.
    """
    z = energies[:, None] + 1j * gammas[:, None]  # [M, 1]
    denom = z - E[None, :]  # [M, 4N]
    G_e = jnp.sum(w_e[None, :] / denom, axis=1)
    G_h = jnp.sum(w_h[None, :] / denom, axis=1)
    ρ_plus = -jnp.imag(G_e) / jnp.pi
    ρ_minus = -jnp.imag(G_h) / jnp.pi
    return ρ_plus, ρ_minus


def ldos_from_spectrum(E, X, site_index: int, energies) -> np.ndarray:
    """LDOS at one site from a precomputed full eigendecomposition.

    Mirrors the reference's observable and broadening convention: probe
    energies are deduplicated by |ε| and the broadening is the grid spacing
    Γ = gradient(ε) (``bodge/hamiltonian.py:349-352``).
    """
    energies = np.array(energies, dtype=float)
    ε = np.unique(np.abs(energies))
    Γ = np.gradient(ε)

    i0 = BLOCK * site_index
    amp2 = jnp.abs(X[i0 : i0 + 4, :]) ** 2  # [4, 4N]
    w_e = amp2[0] + amp2[1]
    w_h = amp2[2] + amp2[3]

    ρ_plus, ρ_minus = _resolvent_ldos(E, w_e, w_h, jnp.asarray(ε), jnp.asarray(Γ))
    ρ_plus = np.asarray(ρ_plus)
    ρ_minus = np.asarray(ρ_minus)

    table = {}
    for k, ε_k in enumerate(ε):
        table[+ε_k] = ρ_plus[k]
        table[-ε_k] = ρ_minus[k]
    return np.array([table[ε_k] for ε_k in energies])


def ldos_exact(H_dense, site_index: int, energies) -> np.ndarray:
    """Local density of states at one site, exact to numerical precision."""
    E, X = _eigh(H_dense)
    return ldos_from_spectrum(E, X, site_index, energies)
