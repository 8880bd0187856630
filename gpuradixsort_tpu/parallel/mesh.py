"""Device-mesh helpers — the multi-chip scale-out substrate.

The reference is single-device (SURVEY.md §2c: no NCCL/MPI, one GL context);
its only "hierarchy" is work-group scan -> scan-of-group-sums.  The TPU build
generalizes that hierarchy one level up: chips in a ``jax.sharding.Mesh``
exchange data with XLA collectives over ICI.  One 1-D axis ("x") shards rows;
the exchange primitive (``dist_sort.range_partition_exchange``) rides
``lax.all_to_all`` over it.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ROW_AXIS = "x"


def shard_rows(mesh: Mesh, *arrays):
    """Place arrays with rows sharded over the mesh axis (ICI-resident).

    Committing inputs to the row sharding before ``dist_*`` calls avoids an
    implicit host->device relayout inside the first collective step.
    """
    sharding = NamedSharding(mesh, P(ROW_AXIS))
    out = tuple(jax.device_put(a, sharding) for a in arrays)
    return out[0] if len(out) == 1 else out


def make_row_mesh(num_devices: int | None = None) -> Mesh:
    """A 1-D mesh over the first ``num_devices`` devices, axis name "x"."""
    devices = jax.devices()
    if num_devices is None:
        num_devices = len(devices)
    if num_devices > len(devices):
        raise ValueError(
            f"requested {num_devices} devices, have {len(devices)}"
        )
    return jax.make_mesh((num_devices,), (ROW_AXIS,), devices=devices[:num_devices])


