"""d-wave gap equation at 64×64 through the sharded Pallas kernels,
cross-checked against an exact (banded-LAPACK) free-energy control.

Round-5 verdict item 5 ("bond-field self-consistency... Done = solve_gap
converges a d-wave amplitude on a 64² lattice matching a dense-control
solve").  A full dense control *solve* at dim 16 384 is ~hours of host
LAPACK; the control here is sharper and cheaper: evaluate the EXACT
objective F_exact(Δ) = Σ_{ε>0}G(ε) + Σ_bonds|Δ_b|²/V via the banded
eigensolver on a bracket around the KPM-converged amplitude Δ*, and
verify Δ* sits at the exact objective's minimum within the bracket
resolution.

Writes ``selfcons_dwave.json``.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bodge_tpu import CubicLattice, Hamiltonian, σ0  # noqa: E402
from bodge_tpu.models import selfconsistency as sc  # noqa: E402
from bodge_tpu.ops import banded as banded_ops  # noqa: E402


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    V, T = 2.2, 0.0
    lattice = CubicLattice((L, L, 1))
    system = Hamiltonian(lattice)
    system.assemble(
        onsite=lambda ci: 0.0 * σ0,  # half filling: strong d-wave channel
        hopping=lambda ci, cj: np.where(
            (np.abs(ci - cj).max(axis=1) == 1)[:, None, None], -1.0 * σ0, 0
        ),
    )
    N = lattice.size
    out = {"L": L, "V": V, "T": T, "pairing": "dwave"}

    # --- sharded KPM gradient solve (the TPU path) -----------------------
    t0 = time.perf_counter()
    Δ, F = sc.solve_gap(
        system, V=V, temperature=T, uniform=True, delta0=0.25,
        steps=120, learning_rate=20.0 / N,
        method="kpm", impl="pallas_sharded", order=1024, samples=8,
        pairing="dwave",
    )
    out["solve_time_s"] = time.perf_counter() - t0
    d_star = float(np.real(Δ[0]))
    out["delta_kpm"] = d_star
    out["F_kpm"] = float(F)
    print(f"[dwave] {L}×{L}: Δ* = {d_star:.4f} in {out['solve_time_s']:.1f} s",
          flush=True)

    # --- exact banded control around Δ* ---------------------------------
    struct = sc.bond_structure_dwave(system.skeleton)

    def F_exact(d):
        # Pure-numpy mirror of sc.data_with_bond_singlet / _bond_penalty:
        # the control must run entirely on the host — the library's jnp
        # form would compile a complex convert_element_type on the axon
        # backend, which that backend does not implement (the jnp form is
        # itself cross-validated against DSL assembly on CPU in
        # tests/test_selfconsistency.py).
        sk = system.skeleton
        st = np.asarray(struct)
        stH = np.conj(np.swapaxes(st[np.asarray(sk.trans_slot)], -1, -2))
        mask = sc._bond_mask(sk)
        active = (np.abs(st).sum(axis=(1, 2)) > 0).astype(float)
        mask = mask * active[None, :]
        safe = np.where(sk.valid, sk.cols, 0)
        delta = np.full((N,), d, np.asarray(system._data).dtype)
        m = 0.5 * (delta[:, None] + delta[safe]) * mask
        data = np.array(np.asarray(system._data))
        data[:, :, 0:2, 2:4] = m[:, :, None, None] * st[None]
        data[:, :, 2:4, 0:2] = m[:, :, None, None] * stH[None]
        E = banded_ops.eigvalsh_banded(data, sk)
        Ep = E[E > 0]
        U = -0.5 * float(np.sum(Ep))
        S = 0.0 if T == 0 else float(np.sum(np.log1p(np.exp(-Ep / T))))
        w = sc._bond_weights(struct)
        cond = float(np.sum(w[None, :] * np.abs(m) ** 2) / (2.0 * V))
        return U - T * S + cond

    bracket = [max(0.02, d_star - 0.06), d_star - 0.02, d_star,
               d_star + 0.02, d_star + 0.06]
    Fs = []
    for d in bracket:
        t0 = time.perf_counter()
        Fd = F_exact(d)
        Fs.append(Fd)
        print(f"[dwave] exact F({d:.4f}) = {Fd:.4f} "
              f"({time.perf_counter() - t0:.0f} s)", flush=True)
    out["exact_bracket"] = [[float(d), float(f)] for d, f in zip(bracket, Fs)]
    kmin = int(np.argmin(Fs))
    out["delta_exact_bracket_min"] = float(bracket[kmin])
    out["delta_abs_err"] = abs(bracket[kmin] - d_star)
    out["kpm_at_exact_minimum"] = bool(kmin == 2)
    print(f"[dwave] exact-bracket minimum at Δ = {bracket[kmin]:.4f} "
          f"(KPM Δ* = {d_star:.4f}; at-minimum: {out['kpm_at_exact_minimum']})",
          flush=True)

    with open(os.path.join(REPO, "selfcons_dwave.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
