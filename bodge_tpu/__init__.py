"""
bodge_tpu: TPU-native block-sparse tight-binding framework for superconductors.

A from-scratch JAX/XLA/Pallas implementation with the capability set of the
`bodge` package (real-space Bogoliubov-de Gennes Hamiltonians in
Lattice⊗Nambu⊗Spin space): coordinate-addressed assembly with automatic
particle-hole/Hermitian symmetry fill, dense diagonalization, free energy,
and local density of states — plus a TPU-native tier the reference does not
have: stencil/ELL block-sparse SpMM (Pallas-accelerated), Chebyshev/KPM
spectral expansion, and multi-device row partitioning with halo-exchange
collectives.

Public API parity: the 30 names of ``bodge/__init__.py:13-51`` plus the
TPU-native extensions.
"""

from .common import (
    Coord,
    Coords,
    Index,
    Indices,
    jsigma,
    jsigma0,
    jsigma1,
    jsigma2,
    jsigma3,
    jσ,
    jσ0,
    jσ1,
    jσ2,
    jσ3,
    pi,
    sigma,
    sigma0,
    sigma1,
    sigma2,
    sigma3,
    π,
    σ,
    σ0,
    σ1,
    σ2,
    σ3,
)
from .hamiltonian import Hamiltonian
from .lattice import CubicLattice, Lattice
from .models.order_parameters import dwave, pwave, ssd, swave

__version__ = "0.1.0"
__all__ = [
    # Core library (parity with bodge).
    "Lattice",
    "CubicLattice",
    "Hamiltonian",
    "Coord",
    "Coords",
    "Index",
    "Indices",
    # Helper functions.
    "ssd",
    "swave",
    "pwave",
    "dwave",
    # Constants.
    "π",
    "σ",
    "σ0",
    "σ1",
    "σ2",
    "σ3",
    "jσ",
    "jσ0",
    "jσ1",
    "jσ2",
    "jσ3",
    # ASCII alternatives.
    "pi",
    "sigma",
    "sigma0",
    "sigma1",
    "sigma2",
    "sigma3",
    "jsigma",
    "jsigma0",
    "jsigma1",
    "jsigma2",
    "jsigma3",
]
