#!/usr/bin/env python
"""One-off measurement of the BASELINE 100×100 build+diagonalize headline.

The 100×100 s-wave case is a 40 000×40 000 Hermitian matrix — beyond one
v5e chip's HBM in any dense representation (the planar real embedding is
80 000² f32 = 25.6 GB), and beyond this 2-core host's reach with dense
LAPACK (measured ~21 h extrapolation).  The matrix is, however, *banded*
(scalar half-bandwidth 4·L+3 = 403 in natural order), so LAPACK's banded
Hermitian driver computes the exact full spectrum in O(dim²·bw) — the path
``Hamiltonian.eigenvalues(method="banded")`` exposes.  This script records
that number once; ``bench.py`` merges ``diag_headline.json`` into
``bench_results.json``.

Reference analog: ``bodge/hamiltonian.py:228-230`` (scipy dense eigh on the
author's CPU; no published timing exists for this size).
"""

import json
import os
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main(L=100):
    from bodge_tpu import CubicLattice, Hamiltonian, jσ2, σ0
    from bodge_tpu.ops import banded

    lattice = CubicLattice((L, L, 1))
    t0 = time.perf_counter()
    system = Hamiltonian(lattice, dtype=np.complex64)
    system.assemble(
        onsite=lambda ci: -0.5 * σ0,
        pairing_onsite=lambda ci: 0.4 * jσ2,
        hopping=lambda ci, cj: np.where(
            (np.abs(ci - cj).max(axis=1) == 1)[:, None, None], -1.0 * σ0, 0
        ),
        check=False,
        device=False,
    )
    t_build = time.perf_counter() - t0

    data = np.asarray(system._data)
    bw = banded.scalar_bandwidth(data, system._sk)
    dim = 4 * lattice.size
    print(f"build {t_build:.2f} s; dim {dim}; scalar bandwidth {bw}", flush=True)

    t0 = time.perf_counter()
    E = system.eigenvalues(method="banded")  # positive spectrum, exact
    t_eig = time.perf_counter() - t0
    gap = float(E[E > 0].min())
    print(f"banded eigvalsh {t_eig:.1f} s; gap {gap:.4f}", flush=True)

    out = {
        "L": L,
        "dim": dim,
        "dtype": "complex64",
        "scalar_bandwidth": int(bw),
        "build_s": t_build,
        "eigvalsh_s": t_eig,
        "total_s": t_build + t_eig,
        "gap": gap,
        "measured": "host_lapack_banded_exact",
        "note": (
            "Exact full positive spectrum via LAPACK ?hbevd on the RCM-ordered "
            "band (Hamiltonian.eigenvalues(method='banded')); dense LAPACK at "
            "this size extrapolates to ~21 h on this 2-core host and the dense "
            "matrix exceeds single-chip HBM (planar embedding 25.6 GB). "
            "Merged into bench_results.json by bench.py."
        ),
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "diag_headline.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    import sys

    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100)
