"""Per-pass radix-sort kernels: digit histogram and stable destination ranks.

Reference equivalents, redesigned rather than translated:

- ``GetBitForPrefixScan.comp`` (extract 1 bit per element) + the per-group
  half of ``ParallelPrefixScan.comp`` fuse into ONE tile kernel here: a VMEM
  tile one-hot-expands its digits and reduces, producing a full R-bucket
  histogram per tile in a single pass — multi-bit digits instead of the
  reference's 1-bit-x-32-pass GLSL workaround.
- ``SortIntermediateData.comp:42-62`` computes each element's destination as
  ``group offset + within-group rank``; ``tile_destinations`` below is the
  same factorization: global (digit, tile) offset table + within-tile stable
  rank, computed with shift-add prefix sums over the one-hot expansion.

The cross-tile offset table (the reference's scan-of-group-sums dispatch,
``ParallelPrefixScan.comp:151-196``) is tiny ((num_tiles, R) int32) and is
computed host-side with jnp cumsums — on TPU that is one fused XLA op, not
worth a kernel.

TPU layout notes: Mosaic requires VMEM block shapes whose trailing dims are
multiples of (8, 128) (or exactly the array dims), so one grid step processes
``TILES_PER_STEP`` tiles and the per-tile histogram/offset tables are laid
out as (num_tiles, LANES) with the R buckets in the first R lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpuradixsort_tpu.config import (
    LANES,
    TILES_PER_STEP,
    EngineConfig,
    kernel_impl,
)
from gpuradixsort_tpu.kernels.common import exclusive_cumsum, inclusive_cumsum


def _digits_of(keys: jnp.ndarray, shift: int, radix: int) -> jnp.ndarray:
    """Extract the (keys >> shift) & (radix-1) digit as int32."""
    return jax.lax.shift_right_logical(keys, jnp.uint32(shift)).astype(
        jnp.int32
    ) & jnp.int32(radix - 1)


def _bucket_chunks(radix: int):
    """Bucket ranges processed per vectorized block (16-plane nibbles)."""
    chunk = min(radix, 16)
    return [(c0, chunk) for c0 in range(0, radix, chunk)]


def _hist_kernel(keys_ref, hist_ref, *, shift, radix, tile_rows, tiles,
                 table_lanes):
    """Digit histograms for ``tiles`` tiles: hist_ref[g, r] = count in tile g.

    Reduction path chosen for Mosaic: lanes first (3D -> 2D), then per-tile
    row groups via strided column adds, then one small transpose into the
    (tiles, table_lanes) output row layout.  1-D-shaped reductions do not
    lower.  Wide digits (radix 256) are processed in 16-bucket nibble chunks
    so the one-hot expansion stays a bounded VMEM block.
    """
    digits = _digits_of(keys_ref[:], shift, radix)
    rows = jax.lax.broadcasted_iota(jnp.int32, (tiles * tile_rows, tiles), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tiles * tile_rows, tiles), 1)
    sel = (rows // tile_rows == cols).astype(jnp.float32)
    parts = []
    for c0, chunk in _bucket_chunks(radix):
        buckets = c0 + jax.lax.broadcasted_iota(jnp.int32, (chunk, 1, 1), 0)
        one_hot = (digits[None, :, :] == buckets).astype(jnp.int32)
        lane_sums = jnp.sum(one_hot, axis=2)  # (chunk, tiles*tile_rows)
        # Segment-sum the tile_rows-wide column groups with a tiny selector
        # matmul (lane-dim strided slicing does not lower in Mosaic).
        # Counts are <= tile elements, exact in f32.
        per_tile = jnp.dot(
            lane_sums.astype(jnp.float32), sel,
            preferred_element_type=jnp.float32,
        )  # (chunk, tiles)
        parts.append(per_tile.T.astype(jnp.int32))
    hist = jnp.concatenate(parts, axis=1)  # (tiles, radix)
    if table_lanes > radix:
        hist = jnp.concatenate(
            [hist, jnp.zeros((tiles, table_lanes - radix), jnp.int32)], axis=1
        )
    hist_ref[:] = hist


def _dest_kernel(keys_ref, off_ref, dest_ref, *, shift, radix, tile_rows, tiles):
    """Stable destination indices for a group of tiles.

    dest[i] = off[tile, digit_i] + (# of j < i in this tile with the same
    digit), with i in row-major tile order — the stable-scatter index rule of
    ``SortIntermediateData.comp:42-62`` generalized to multi-bit digits.
    """
    for g in range(tiles):
        keys = keys_ref[g * tile_rows : (g + 1) * tile_rows, :]
        digits = _digits_of(keys, shift, radix)
        acc = jnp.zeros((tile_rows, LANES), jnp.int32)
        for c0, chunk in _bucket_chunks(radix):
            buckets = c0 + jax.lax.broadcasted_iota(
                jnp.int32, (chunk, 1, 1), 0
            )
            one_hot = (digits[None, :, :] == buckets).astype(jnp.int32)
            # Within-tile exclusive rank per bucket, row-major element order:
            # cumsum along lanes, then exclusive row offsets along sublanes.
            lane_incl = inclusive_cumsum(one_hot, axis=2)
            row_tot = lane_incl[:, :, LANES - 1 : LANES]
            row_off = exclusive_cumsum(row_tot, axis=1)
            rank = row_off + lane_incl - one_hot  # exclusive
            # Select each element's bucket: dest = sum one_hot*(rank+off).
            # Unrolled over the chunk — each term is a dense
            # (tile_rows, LANES) VPU multiply-add; off_ref[g, r] is a scalar
            # VMEM read.
            for r in range(chunk):
                acc = acc + one_hot[r] * (rank[r] + off_ref[g, c0 + r])
        dest_ref[g * tile_rows : (g + 1) * tile_rows, :] = acc


def _grid_args(keys2d, cfg: EngineConfig):
    rows = keys2d.shape[0]
    step_rows = cfg.tile_rows * TILES_PER_STEP
    if rows % step_rows:
        raise ValueError(
            f"rows {rows} not a multiple of grid-step rows {step_rows}; "
            "pad with core.table.pad_to_tile first"
        )
    return rows // step_rows, step_rows


def _tile_histograms_ref(keys2d: jax.Array, shift: int, cfg: EngineConfig):
    """jnp reference implementation (paranoid-mode oracle; CPU-test path)."""
    num_tiles = keys2d.shape[0] // cfg.tile_rows
    digits = _digits_of(keys2d, shift, cfg.radix).reshape(num_tiles, -1)
    one_hot = digits[:, :, None] == jnp.arange(cfg.radix, dtype=jnp.int32)
    hist = jnp.sum(one_hot, axis=1, dtype=jnp.int32)  # (num_tiles, radix)
    return jnp.pad(hist, ((0, 0), (0, cfg.table_lanes - cfg.radix)))


def _tile_destinations_ref(
    keys2d: jax.Array, offsets: jax.Array, shift: int, cfg: EngineConfig
):
    """jnp reference implementation (paranoid-mode oracle; CPU-test path)."""
    num_tiles = keys2d.shape[0] // cfg.tile_rows
    digits = _digits_of(keys2d, shift, cfg.radix).reshape(num_tiles, -1)
    one_hot = (
        digits[:, :, None] == jnp.arange(cfg.radix, dtype=jnp.int32)
    ).astype(jnp.int32)
    rank = jnp.cumsum(one_hot, axis=1) - one_hot  # exclusive, per tile/bucket
    my_rank = jnp.take_along_axis(rank, digits[:, :, None], axis=2)[..., 0]
    my_base = jnp.take_along_axis(offsets, digits, axis=1)
    return (my_base + my_rank).reshape(keys2d.shape).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("shift", "cfg", "impl"))
def tile_histograms(
    keys2d: jax.Array, shift: int, cfg: EngineConfig, impl: str | None = None
) -> jax.Array:
    """Per-tile digit histograms.

    keys2d: (num_tiles * tile_rows, LANES) uint32.  Returns
    (num_tiles, cfg.table_lanes) int32 with bucket r's count in lane r
    (lanes >= radix are zero).
    """
    num_steps, step_rows = _grid_args(keys2d, cfg)
    impl = impl or kernel_impl()
    if impl == "reference":
        return _tile_histograms_ref(keys2d, shift, cfg)
    kernel = functools.partial(
        _hist_kernel,
        shift=shift,
        radix=cfg.radix,
        tile_rows=cfg.tile_rows,
        tiles=TILES_PER_STEP,
        table_lanes=cfg.table_lanes,
    )
    return pl.pallas_call(
        kernel,
        grid=(num_steps,),
        in_specs=[
            pl.BlockSpec((step_rows, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (TILES_PER_STEP, cfg.table_lanes), lambda t: (t, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (num_steps * TILES_PER_STEP, cfg.table_lanes), jnp.int32
        ),
        interpret=impl == "interpret",
    )(keys2d)


@functools.partial(jax.jit, static_argnames=("shift", "cfg", "impl"))
def tile_destinations(
    keys2d: jax.Array,
    offsets: jax.Array,
    shift: int,
    cfg: EngineConfig,
    impl: str | None = None,
) -> jax.Array:
    """Stable global destination index for every element.

    keys2d: (num_tiles * tile_rows, LANES) uint32; offsets: (num_tiles,
    cfg.table_lanes) int32 global base offsets (digit-major, then tile-major; lane r =
    bucket r).  Returns (num_tiles * tile_rows, LANES) int32 destinations — a
    permutation of 0..N-1.
    """
    num_steps, step_rows = _grid_args(keys2d, cfg)
    impl = impl or kernel_impl()
    if impl == "reference":
        return _tile_destinations_ref(keys2d, offsets, shift, cfg)
    kernel = functools.partial(
        _dest_kernel,
        shift=shift,
        radix=cfg.radix,
        tile_rows=cfg.tile_rows,
        tiles=TILES_PER_STEP,
    )
    return pl.pallas_call(
        kernel,
        grid=(num_steps,),
        in_specs=[
            pl.BlockSpec(
                (step_rows, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (TILES_PER_STEP, cfg.table_lanes), lambda t: (t, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (step_rows, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(keys2d.shape, jnp.int32),
        interpret=impl == "interpret",
    )(keys2d, offsets)


def global_offsets(hist: jax.Array) -> jax.Array:
    """(num_tiles, W) histograms -> (num_tiles, W) global offsets.

    Stable LSD ordering is digit-major, then tile-major: bucket r starts after
    every element of buckets < r (all tiles), plus the same bucket in earlier
    tiles.  This is the scan-of-group-sums of ``ParallelPrefixScan.comp:
    151-196`` plus the ``PrefixSumsByGroup[wg]`` offset of
    ``SortIntermediateData.comp:42-44``, folded into one table.  Lanes beyond
    the radix have zero counts and produce unused offsets.
    """
    col_totals = jnp.sum(hist, axis=0)  # (W,)
    digit_base = jnp.cumsum(col_totals) - col_totals  # exclusive over digits
    tile_excl = jnp.cumsum(hist, axis=0) - hist  # exclusive over tiles
    return (digit_base[None, :] + tile_excl).astype(jnp.int32)
