"""On-TPU lowest-|ε| eigensolve for the diagonalize headline.

Runs the filtered-subspace solver (`bodge_tpu.ops.lanczos`) on the
BASELINE 100×100 s-wave config with the device doing all heavy filtering,
and cross-validates:

- at L=32 against a fresh banded-LAPACK ladder (1e-6 gate), and
- at L=100 against the exact offline artifact `diag_headline.json`
  (host banded LAPACK, 7 732 s; gap 0.3999969).

Writes `diag_lanczos.json`; bench.py merges it into the artifact.
Run standalone:  python scripts/_diag_lanczos.py [L ...]
"""

import json
import os
import sys
import time
import warnings

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bodge_tpu import CubicLattice, Hamiltonian, jσ2, σ0  # noqa: E402
from bodge_tpu.ops import lanczos as lz  # noqa: E402


def build_swave(L, Δ0=0.4, μ=0.5, t=1.0):
    lattice = CubicLattice((L, L, 1))
    system = Hamiltonian(lattice)
    system.assemble(
        onsite=lambda ci: -μ * σ0,
        pairing_onsite=lambda ci: Δ0 * jσ2,
        hopping=lambda ci, cj: np.where(
            (np.abs(ci - cj).max(axis=1) == 1)[:, None, None], -t * σ0, 0
        ),
        check=False,
    )
    return lattice, system


def run(L, k=8, seed=1, validate_banded=False):
    lattice, system = build_swave(L)
    entry = {"L": L, "dim": 4 * lattice.size, "k": k}

    t0 = time.perf_counter()
    with warnings.catch_warnings(record=True) as wlist:
        warnings.simplefilter("always")
        # 2k+2: |ε| ties can split the ± signs unevenly (same guard as the
        # Hamiltonian facade).  max_block: the clean gap edge at L=100
        # piles ~130 near-degenerate states inside the max-order filter
        # resolution — the block must cover the window for the exact RR
        # to resolve the lowest members to 1e-6.
        E, X, info = lz.lowest_eigenstates(
            system.host_data(), system.skeleton, 2 * k + 2,
            full_output=True, seed=seed,
            max_block=256 if L >= 64 else None,
        )
    entry["time_s"] = time.perf_counter() - t0
    entry["impl"] = info["impl"]
    entry["iterations"] = info["iterations"]
    entry["converged"] = bool(info["converged"])
    entry["max_rel_residual"] = float(np.max(info["residuals"]))
    entry["history_sigma_order_res_xedge_b"] = [
        [float(h[0]), int(h[1]), float(h[2]), float(h[3]), int(h[4])]
        for h in info.get("history", [])
    ]
    Epos = np.sort(E[E > 0])[:k]
    entry["E_positive"] = [float(x) for x in Epos]
    entry["gap"] = float(Epos[0]) if len(Epos) else None
    entry["warnings"] = [str(w.message)[:160] for w in wlist]

    # Exact f64 reference at every size: host shift-invert ARPACK at σ=0
    # (SuperLU factorization, complex128).  Seconds even at L=100; this —
    # not the offline chbevd artifact — is the trusted ladder (the
    # single-precision banded run carries ~3e-6 error at dim 40 000).
    t0 = time.perf_counter()
    E_si = system.eigenvalues(method="shift_invert", k=k)
    entry["shift_invert_host_s"] = time.perf_counter() - t0
    entry["shift_invert_E_positive"] = [float(x) for x in E_si]
    m = min(len(Epos), len(E_si))
    entry["n_compared"] = m
    entry["max_abs_err_vs_shift_invert_f64"] = float(
        np.abs(Epos[:m] - E_si[:m]).max()
    )

    if validate_banded:
        from bodge_tpu.ops import banded as banded_ops

        t0 = time.perf_counter()
        Eb = banded_ops.eigvalsh_banded(np.asarray(system._data), system.skeleton)
        entry["banded_host_s"] = time.perf_counter() - t0
        ref = np.sort(Eb[Eb > 0])[:k]
        entry["banded_E_positive"] = [float(x) for x in ref]
        m = min(len(Epos), len(ref))
        entry["max_abs_err_vs_banded"] = float(np.abs(Epos[:m] - ref[:m]).max())

    head_path = os.path.join(REPO, "diag_headline.json")
    if L == 100 and os.path.exists(head_path):
        with open(head_path) as f:
            head = json.load(f)
        entry["exact_gap_offline_chbevd_f32"] = head.get("gap_chbevd_f32")
        entry["exact_time_offline_s"] = head.get("eigvalsh_s")
        entry["offline_note"] = (
            "the offline banded run used single-precision chbevd (band "
            "inherited complex64) and its gap carries ~3e-6 error; the "
            "f64 shift-invert ladder above is the trusted reference"
        )
        if entry["gap"] is not None and head.get("eigvalsh_s"):
            entry["gap_abs_err_vs_exact"] = entry["max_abs_err_vs_shift_invert_f64"]
            entry["speedup_vs_exact_host"] = head["eigvalsh_s"] / entry["time_s"]
    return entry


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [32, 100]
    out = {"note": "filtered-subspace (method='lanczos') on-device eigensolve; "
                   "see bodge_tpu/ops/lanczos.py", "runs": []}
    for L in sizes:
        print(f"[diag_lanczos] L={L} ...", flush=True)
        entry = run(L, validate_banded=(L <= 48))
        out["runs"].append(entry)
        print(f"[diag_lanczos] L={L}: {entry['time_s']:.1f} s, impl={entry['impl']}, "
              f"gap={entry['gap']}, "
              f"err={entry.get('max_abs_err_vs_banded', entry.get('gap_abs_err_vs_exact'))}",
              flush=True)
        with open(os.path.join(REPO, "diag_lanczos.json"), "w") as f:
            json.dump(out, f, indent=1)
    print("[diag_lanczos] done", flush=True)


if __name__ == "__main__":
    main()
