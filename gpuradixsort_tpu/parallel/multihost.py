"""Multi-host (pod-slice) runtime: process init + DCN-aware mesh layout.

The reference is a single-process, single-GPU demo (SURVEY.md §2c — no
NCCL/MPI, one GL context); its scale story ends at one device.  The TPU
build's scale-out substrate is a pod slice: N hosts, each driving its local
chips, joined by `jax.distributed` into one logical runtime whose collectives
ride ICI within a host's slice and DCN between hosts.

Two pieces live here:

- :func:`initialize` — the `jax.distributed.initialize` entry point.  On TPU
  pod slices the coordinator/process topology is discovered from the TPU
  metadata environment, so a bare ``initialize()`` works; explicit
  coordinator/process arguments cover GPU/CPU clusters and tests.  Calling it
  in a single-process run is a documented no-op, so driver code can call it
  unconditionally.
- :func:`make_pod_mesh` — a mesh whose *outer* axis spans hosts (DCN) and
  *inner* axis spans each host's local chips (ICI).  Axis order matters:
  `jax.sharding` collectives over the inner axis never cross DCN, so
  bandwidth-hungry exchanges (the radix `all_to_all`) should use the inner
  axis, and only the low-volume levels of the hierarchy (global bucket
  histograms via `psum`, splitter agreement) should touch the outer axis.
  This is the N-level generalization of the reference's two-level scan
  (work-group scan -> scan-of-group-sums, ``ParallelPrefixScan.comp:93-104``):
  tile -> chip -> host -> pod.

`dist_sort` / `dist_ops` operate over a 1-D row axis; :func:`flatten_pod_mesh`
produces that axis host-major, so shard rank order == (host, local chip)
order and the stable source-major merge contract is preserved across hosts.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh

from gpuradixsort_tpu.parallel.mesh import ROW_AXIS

HOST_AXIS = "host"

_initialized = False


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Join (or create) the multi-process JAX runtime.  Idempotent.

    Returns True if `jax.distributed.initialize` was actually called, False
    for the single-process no-op.  With no arguments, the topology comes from
    the environment: on a TPU pod slice JAX auto-discovers peers from the TPU
    metadata service; elsewhere the standard ``JAX_COORDINATOR_ADDRESS`` /
    ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID`` variables are honored.
    """
    global _initialized
    if _initialized:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    num_processes = (
        num_processes if num_processes is not None
        else (int(env_np) if env_np else None)
    )
    env_pid = os.environ.get("JAX_PROCESS_ID")
    process_id = (
        process_id if process_id is not None
        else (int(env_pid) if env_pid else None)
    )
    on_tpu_pod = (
        jax.default_backend() == "tpu" and coordinator_address is None
        and os.environ.get("TPU_WORKER_HOSTNAMES")
    )
    if coordinator_address is None and not on_tpu_pod:
        # Single-process run (tests, one-host benches): nothing to join.
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    return True


def make_pod_mesh(devices=None) -> Mesh:
    """2-D (host, chip) mesh: outer axis over DCN, inner axis over ICI.

    Single-process runs (including the virtual-device CPU simulation) get a
    (1, num_devices) mesh, so code written against the two axes runs
    unchanged from laptop CI to a pod slice.
    """
    if devices is None:
        devices = jax.devices()
    per_host = jax.local_device_count()
    num_hosts = len(devices) // per_host
    if num_hosts * per_host != len(devices):
        raise ValueError(
            f"{len(devices)} devices do not split evenly over "
            f"{per_host}-device hosts"
        )
    # Host-major order: devices[i] for process p occupy rows of the grid.
    grid = np.asarray(devices).reshape(num_hosts, per_host)
    return Mesh(grid, (HOST_AXIS, ROW_AXIS))


def flatten_pod_mesh(mesh: Mesh) -> Mesh:
    """Collapse a (host, chip) pod mesh to the 1-D row mesh dist_* expects.

    The flat axis is host-major, so shard ranks are contiguous within a host:
    the range-partitioner's contiguous bucket->shard assignment then keeps
    most exchange volume between neighboring ranks on the same host's ICI,
    with only range-boundary traffic crossing DCN.
    """
    return Mesh(mesh.devices.reshape(-1), (ROW_AXIS,))
