#!/usr/bin/env python
"""Generic (user-defined) lattices on the TPU fast path.

Any :class:`bodge_tpu.Lattice` subclass — not just ``CubicLattice`` —
gets a hand-scheduled kernel: the RCM-banded gather kernel
(`bodge_tpu/ops/pallas_gather.py`) relabels sites by reverse
Cuthill–McKee and turns neighbor access into a one-hot MXU matmul,
measured ~20–30× faster than the XLA fallback it replaces.  Auto-selected
on TPU; force it anywhere with ``impl="pallas_gather"``.

Here: a Möbius-style ring with a twist defect — a graph no cubic stencil
describes — assembled through the reference-style ``with`` DSL and probed
via KPM LDOS through the gather kernel.
"""
import numpy as np

from bodge_tpu import Hamiltonian, Lattice, jσ2, σ0
from bodge_tpu.ops import chebyshev as kpm


class TwistedRing(Lattice):
    """Ring of n sites with one long-range chord (a twist defect)."""

    def __init__(self, n, chord_at=0, chord_span=None):
        super().__init__((n, 1, 1))
        self.chord = (chord_at, (chord_at + (chord_span or n // 3)) % n)

    def index(self, coord):
        x = coord[0]
        if not (0 <= x < self.shape[0]) or coord[1] or coord[2]:
            raise ValueError(f"Coordinate {coord} out of bounds")
        return x

    def sites(self):
        for x in range(self.shape[0]):
            yield (x, 0, 0)

    def bonds(self):
        n = self.shape[0]
        for x in range(n - 1):
            yield (x, 0, 0), (x + 1, 0, 0)
            yield (x + 1, 0, 0), (x, 0, 0)
        a, b = self.chord
        yield (a, 0, 0), (b, 0, 0)
        yield (b, 0, 0), (a, 0, 0)

    def edges(self):
        n = self.shape[0]
        yield (0, 0, 0), (n - 1, 0, 0)
        yield (n - 1, 0, 0), (0, 0, 0)


def main():
    n = 240
    lattice = TwistedRing(n)
    system = Hamiltonian(lattice)
    with system as (H, Δ):
        for i in lattice.sites():
            H[i, i] = -0.5 * σ0
            Δ[i, i] = 0.3 * jσ2
        for i, j in lattice.bonds():
            H[i, j] = -1.0 * σ0
        for i, j in lattice.edges():
            H[i, j] = -1.0 * σ0

    sk = system.skeleton
    assert not sk.stencil  # generic graph → gather path

    energies = np.linspace(-1.5, 1.5, 61)
    # On TPU this auto-upgrades to the gather kernel; impl= forces it
    # everywhere (interpret mode on CPU).
    ρ = kpm.ldos_kpm(system.host_data(), sk, n // 2, energies,
                     order=1024, impl="pallas_gather")
    inside = ρ[np.abs(energies) < 0.2].mean()
    outside = ρ[np.abs(energies) > 0.5].mean()
    print(f"in-gap LDOS : {inside:.4f}")
    print(f"band LDOS   : {outside:.4f}")
    print(f"gap contrast: {outside / max(inside, 1e-6):.0f}x  "
          f"(s-wave gap resolved through the gather kernel)")


if __name__ == "__main__":
    main()
