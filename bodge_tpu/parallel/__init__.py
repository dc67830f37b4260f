"""Multi-device layer: row-partitioned lattices, halo-exchange SpMM,
sharded Chebyshev sweeps over a JAX device mesh."""

from .multihost import initialize_multihost, is_multihost, local_device_count
from .sharded import (
    RowSharding,
    free_energy_kpm_sharded,
    make_row_mesh,
    moments_sharded,
    spmm_sharded,
)

__all__ = [
    "RowSharding",
    "make_row_mesh",
    "spmm_sharded",
    "moments_sharded",
    "free_energy_kpm_sharded",
    "initialize_multihost",
    "is_multihost",
    "local_device_count",
]
