#!/usr/bin/env python
"""Zero-energy LDOS map of a pₓ-wave superconductor: topological edge modes.

Builds a 2D pₓ-wave superconductor and computes the zero-energy local
density of states across the whole lattice in ONE batched KPM sweep
(every site's orbitals ride the same Chebyshev scan as extra SpMM
columns).  Flat-band Majorana edge modes appear on the two x-normal edges.

    python examples/edge_states_map.py
"""

import numpy as np


def main():
    from bodge_tpu import CubicLattice, Hamiltonian, pwave, σ0

    L = 24
    lattice = CubicLattice((L, L, 1))
    system = Hamiltonian(lattice)
    σp = pwave("e_z * p_x")
    t, Δ0 = 1.0, 0.3

    bond = lambda ci, cj: (np.abs(ci - cj).max(axis=1) == 1)[:, None, None]
    system.assemble(
        onsite=lambda ci: 0.0 * σ0,
        hopping=lambda ci, cj: np.where(bond(ci, cj), -t * σ0, 0),
        pairing=lambda ci, cj: np.where(bond(ci, cj), -Δ0 * σp(ci, cj), 0),
    )

    sites = [(x, y, 0) for x in range(L) for y in range(L)]
    ρ0 = system.ldos_map(sites, [0.0], method="kpm", order=512)[:, 0]
    grid = ρ0.reshape(L, L)

    # ASCII heat map: darker = higher zero-energy LDOS.
    shades = " .:-=+*#%@"
    lo, hi = grid.min(), grid.max()
    for row in grid:
        print("".join(shades[int((v - lo) / (hi - lo + 1e-12) * (len(shades) - 1))] for v in row))

    edge = grid[[0, -1], :].mean()
    bulk = grid[L // 4 : 3 * L // 4, L // 4 : 3 * L // 4].mean()
    print(f"\nzero-energy LDOS: x-edges {edge:.4f} vs bulk {bulk:.4f} "
          f"(edge/bulk = {edge / max(bulk, 1e-12):.1f}×)")
    assert edge > 3 * bulk


if __name__ == "__main__":
    main()
