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

def _enable_persistent_compile_cache():
    """Persist XLA executables across processes — CPU platform only.

    Set ``BODGE_NO_CACHE=1`` to skip entirely, ``BODGE_FORCE_CACHE=1`` to
    enable regardless of platform.

    NOT enabled for the tunnelled-TPU (axon) backend: its PJRT plugin does
    not implement executable *deserialization*, so every persistent-cache
    HIT fails with ``UNIMPLEMENTED`` — a cache there turns previously-run
    programs into permanently failing ones (first run compiles + stores
    fine; every later process dies loading the entry).  Keyed per host so
    CPU AOT artifacts never migrate across machine types.
    """
    import os

    if os.environ.get("BODGE_NO_CACHE") == "1":
        return
    try:
        import jax

        platforms = str(
            jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
        ).lower()
        # Enable only when CPU is the sole platform: 'axon,cpu' etc. still
        # compile on the accelerator, where cache hits are fatal.
        if platforms != "cpu" and os.environ.get("BODGE_FORCE_CACHE") != "1":
            return

        import hashlib
        import platform
        import socket

        # Key by CPU feature set, not just machine/hostname: containers
        # share hostnames across physical hosts, and XLA:CPU AOT artifacts
        # compiled for another host's features load with SIGILL warnings
        # (observed: +prefer-no-scatter mismatch from a stale cache).
        try:
            with open("/proc/cpuinfo") as f:
                flags = next(l for l in f if l.startswith("flags"))
            cpu_tag = hashlib.md5(flags.encode()).hexdigest()[:10]
        except Exception:
            cpu_tag = "generic"
        host = f"{platform.machine()}_{socket.gethostname()}_{cpu_tag}"
        cache = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR", f"/tmp/bodge_tpu_jax_cache_{host}"
        )
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass  # never let cache plumbing break imports


_enable_persistent_compile_cache()

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
