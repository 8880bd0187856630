"""Hierarchical exclusive prefix scan as a Pallas TPU kernel.

Reference equivalent: ``Shaders/ParallelSort/ParallelPrefixScan.comp`` — a
work-group Blelloch scan over 1024 elements in shared memory, plus a second
single-group dispatch that scans the 1024 per-group sums, capping the design
at 1024^2 elements (``Source/SSBOs/PrefixSumSsbo.cpp:96,108-117``).

TPU redesign: the grid on a TensorCore executes *sequentially*, so instead of
two dispatches + a group-sums buffer, one kernel walks the tiles in order and
carries the running total in SMEM — an O(N) single-pass scan with no size cap
and no cross-work-group coordination problem (the reference needed a separate
zeroing dispatch because GL work-group launch order is undefined,
``GetBitForPrefixScan.comp:43-67``; TPU grid order is defined, so the hazard
does not exist).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpuradixsort_tpu.config import LANES, EngineConfig, kernel_impl
from gpuradixsort_tpu.core.table import round_up
from gpuradixsort_tpu.kernels.common import rowmajor_exclusive_scan_2d


def _scan_kernel(x_ref, out_ref, total_ref, carry_ref):
    """One grid step: exclusive-scan this tile, offset by the running carry."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        carry_ref[0] = jnp.int32(0)

    x = x_ref[:]
    excl = rowmajor_exclusive_scan_2d(x)
    # Positive static indices: negative indexing lowers to an (unsupported)
    # dynamic_slice in Mosaic.
    rows, lanes = x.shape
    tile_total = excl[rows - 1, lanes - 1] + x[rows - 1, lanes - 1]
    carry = carry_ref[0]
    out_ref[:] = excl + carry
    carry_ref[0] = carry + tile_total
    # Same (1, 1) block every step; the last write is the grand total — the
    # ``totalNumberOfOnes`` slot of the reference's PrefixScanBuffer
    # (``Shaders/ParallelSort/PrefixScanBuffer.comp:34-39``).
    total_ref[0, 0] = carry + tile_total


@functools.partial(jax.jit, static_argnames=("tile_rows", "impl"))
def _exclusive_scan_2d(x2d: jax.Array, tile_rows: int, impl: str | None = None):
    rows = x2d.shape[0]
    num_tiles = rows // tile_rows
    impl = impl or kernel_impl()
    if impl == "reference":
        flat = x2d.reshape(-1)
        incl = jnp.cumsum(flat)
        return (incl - flat).reshape(x2d.shape), incl[-1:].reshape(1, 1)
    scan, total = pl.pallas_call(
        _scan_kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((tile_rows, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=[
            pl.BlockSpec((tile_rows, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda t: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(x2d.shape, jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=impl == "interpret",
    )(x2d)
    return scan, total


def exclusive_scan(
    x: jax.Array, cfg: EngineConfig | None = None, impl: str | None = None
) -> tuple[jax.Array, jax.Array]:
    """Exclusive prefix scan of a 1-D integer array.

    Returns ``(scan, total)`` where ``scan[i] = sum(x[:i])`` and ``total`` is
    a scalar int32 grand total.  Tail-pads with zeros to a tile multiple, so
    any length >= 1 works (no 1,048,576-element cap).
    """
    cfg = cfg or EngineConfig()
    n = x.shape[0]
    if n == 0:
        return jnp.zeros((0,), jnp.int32), jnp.int32(0)
    x = x.astype(jnp.int32)
    padded = round_up(n, cfg.tile)
    if padded != n:
        x = jnp.concatenate([x, jnp.zeros((padded - n,), jnp.int32)])
    x2d = x.reshape(padded // LANES, LANES)
    scan2d, total = _exclusive_scan_2d(x2d, cfg.tile_rows, impl)
    scan = scan2d.reshape(padded)[:n]
    # Tail pads are zeros, so the kernel's grand total equals the live total.
    return scan, total[0, 0]
