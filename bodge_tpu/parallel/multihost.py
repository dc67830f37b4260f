"""Multi-host entry point: ``jax.distributed`` setup + host-spanning meshes.

The reference is explicitly single-machine ("no support for e.g. MPI",
``README.md:36-39``).  The TPU-native equivalent of an MPI layer is *no
hand-written transport at all*: one ``jax.distributed.initialize()`` call
per host process, after which ``jax.devices()`` spans the pod slice and the
same ``shard_map`` programs used on one chip run across hosts — XLA routes
``ppermute`` halos over ICI within a slice and DCN between slices
(SURVEY §2.2, "collectives backend").

Typical multi-host driver (one process per host, e.g. under gang scheduling):

    from bodge_tpu.parallel import initialize_multihost, make_row_mesh
    initialize_multihost()                    # env-driven on TPU pods
    mesh = make_row_mesh()                    # all global devices
    ...                                       # identical single-host code

Nothing here imports at package-import time on single-host setups; calling
:func:`initialize_multihost` on one host is a no-op by default so driver
scripts work unchanged from a laptop to a pod.
"""

from __future__ import annotations

from typing import Optional

import jax

__all__ = ["initialize_multihost", "is_multihost", "local_device_count"]

_initialized = False


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
) -> bool:
    """Initialize ``jax.distributed`` for a multi-host run (idempotent).

    On TPU pods all three arguments are discovered from the runtime
    environment and may be omitted.  Returns ``True`` if a multi-process
    runtime was initialized, ``False`` for the single-process no-op (no
    arguments given and no multi-host environment detected) — so scripts
    can call this unconditionally.
    """
    global _initialized
    if _initialized:
        return True
    explicit = any(v is not None for v in (coordinator_address, num_processes, process_id))
    if not explicit and not _env_looks_multihost():
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )
    _initialized = True
    return True


def _env_looks_multihost() -> bool:
    """True when the process environment advertises a MULTI-host runtime.

    A coordinator address is unambiguous.  ``TPU_WORKER_HOSTNAMES`` alone is
    not: single-host TPU VMs set it to one hostname — it only signals
    multi-host when it lists several workers.
    """
    import os

    if any(
        os.environ.get(k)
        for k in (
            "JAX_COORDINATOR_ADDRESS",
            "COORDINATOR_ADDRESS",
            "MEGASCALE_COORDINATOR_ADDRESS",
        )
    ):
        return True
    workers = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    return len([w for w in workers.split(",") if w.strip()]) > 1


def is_multihost() -> bool:
    """Whether this runtime spans more than one host process."""
    return jax.process_count() > 1


def local_device_count() -> int:
    """Devices attached to *this* host (vs ``jax.device_count()`` global)."""
    return jax.local_device_count()
