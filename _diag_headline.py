#!/usr/bin/env python
"""One-off measurement of the BASELINE 100×100 build+diagonalize headline.

The 100×100 s-wave case is a 40 000×40 000 dense Hermitian matrix — beyond
one v5e chip's HBM in any representation (the planar real embedding is
80 000² f32 = 25.6 GB), so the honest headline is host LAPACK, recorded
once here and merged into ``bench_results.json`` by ``bench.py`` with an
explicit ``measured: "offline_host_lapack"`` label.

Reference analog: ``bodge/hamiltonian.py:228-230`` (scipy eigh on the
author's CPU; no published timing exists for this size).
"""

import json
import os
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main(L=100):
    from bodge_tpu import CubicLattice, Hamiltonian, jσ2, σ0

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

    t0 = time.perf_counter()
    H = system.matrix("dense")
    t_dense = time.perf_counter() - t0
    print(f"build {t_build:.2f} s; densify {t_dense:.2f} s; dim {H.shape[0]}", flush=True)

    t0 = time.perf_counter()
    E = np.linalg.eigvalsh(H)
    t_eig = time.perf_counter() - t0
    gap = float(E[E > 0].min())
    print(f"eigvalsh {t_eig:.1f} s; gap {gap:.4f}", flush=True)

    out = {
        "L": L,
        "dim": int(H.shape[0]),
        "dtype": "complex64",
        "build_s": t_build,
        "densify_s": t_dense,
        "eigvalsh_s": t_eig,
        "total_s": t_build + t_dense + t_eig,
        "gap": gap,
        "measured": "offline_host_lapack",
        "note": (
            "40000^2 dense exceeds single-chip HBM (planar embedding 25.6 GB); "
            "headline recorded once on the host CPU (2 cores, OpenBLAS) and "
            "merged into bench_results.json by bench.py"
        ),
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "diag_headline.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
