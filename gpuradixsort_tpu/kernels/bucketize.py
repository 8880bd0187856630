"""Bucketize kernel: stable in-VMEM sort of each tile by its current digit.

This is the "local reorder" half of the fast scatter path
(docs/fast_scatter_design.md): after it runs, every tile is bucket-major in
HBM, so the global stable scatter of ``SortIntermediateData.comp:42-66``
reduces to copying R contiguous runs per tile to computed offsets (the
window-writer kernel) — no per-element random access ever touches HBM.

Algorithm per tile (rows x 128 lanes, digit radix R <= 16):
1. In-row sort: sortkey = digit<<7 | lane, a 28-stage bitonic network over
   the 128 lanes (butterfly partner = lane XOR 2^s via two lane-rolls and an
   iota-bit select).  Low bits = lane makes the sort stable per row and
   makes the sorted sortkey's low bits the in-row source permutation, which
   a dynamic lane gather then applies to key and index.
2. Small per-tile tables: in-row bucket start/count, exclusive row-prefix
   per bucket, and tile-level bucket offsets.
3. For every destination slot: bucket (via offset compares), source row
   (count of row-prefixes <= position, with lane gathers from broadcast
   table rows), source lane — then an exact flat gather realized as a
   per-source-row loop of broadcast lane gathers (the only conflict-free
   arbitrary 2D gather available on TPU; see the design notes).

The permutation applied is exactly np.argsort(digits, kind="stable") per
tile — property-tested against that oracle.
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
from gpuradixsort_tpu.kernels.common import exclusive_cumsum
from gpuradixsort_tpu.kernels.radix import _digits_of


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _row_bitonic_sortkeys(sortkey: jnp.ndarray) -> jnp.ndarray:
    """Sort each row of (rows, 128) int32 ascending: 28-stage bitonic."""
    lane = _lane_iota(sortkey.shape)
    size = 2
    while size <= LANES:
        d = size // 2
        while d >= 1:
            up = pltpu.roll(sortkey, LANES - d, 1)  # == roll by -d
            down = pltpu.roll(sortkey, d, 1)
            partner = jnp.where((lane & d) == 0, up, down)
            lower = (lane & d) == 0
            mine_gt = sortkey > partner
            # swap = lower ? gt : !gt, expressed as boolean equality —
            # Mosaic cannot lower select_n between i1 vectors.
            swap = mine_gt == lower
            if size < LANES:  # alternating directions until the final merge
                ascending = (lane & size) == 0
                swap = swap == ascending
            sortkey = jnp.where(swap, partner, sortkey)
            d //= 2
        size *= 2
    return sortkey


def _bucketize_tile(keys, idx, shift: int, radix: int):
    """Stable-sort one (rows, 128) tile by digit.  Returns (keys, idx)."""
    rows = keys.shape[0]
    digits = _digits_of(keys, shift, radix)
    lane = _lane_iota((rows, LANES))

    # --- 1. in-row sort ---------------------------------------------------
    sortkey = (digits << 7) | lane
    sorted_sk = _row_bitonic_sortkeys(sortkey)
    src_lane = sorted_sk & jnp.int32(LANES - 1)
    rk = jnp.take_along_axis(keys, src_lane, axis=1)
    ri = jnp.take_along_axis(idx, src_lane, axis=1)
    rd = sorted_sk >> 7  # sorted digits per row

    # --- 2. tables --------------------------------------------------------
    # rowstart[r, b] = first lane of bucket b in row r; rowcnt = run length.
    buckets = jax.lax.broadcasted_iota(jnp.int32, (radix, rows, LANES), 0)
    lt = (rd[None, :, :] < buckets).astype(jnp.int32)
    le = (rd[None, :, :] <= buckets).astype(jnp.int32)
    rowstart = jnp.sum(lt, axis=2).T  # (rows, radix)
    rowend = jnp.sum(le, axis=2).T
    rowcnt = rowend - rowstart
    # cum[r, b] = rows-exclusive prefix of rowcnt within the tile.
    cum = exclusive_cumsum(rowcnt, axis=0)  # (rows, radix)
    colsum = jnp.sum(rowcnt, axis=0, keepdims=True)  # (1, radix)
    toff = exclusive_cumsum(colsum, axis=1)  # (1, radix) tile bucket starts

    # Pad tables to LANES so lane gathers have full-width inputs.
    def pad_lanes(t):
        return jnp.concatenate(
            [t, jnp.zeros((t.shape[0], LANES - t.shape[1]), jnp.int32)], axis=1
        )

    cum_p = pad_lanes(cum)
    rowstart_p = pad_lanes(rowstart)

    # --- 3. destination-slot source computation ---------------------------
    flat = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0) * LANES + lane
    b_of = jnp.zeros((rows, LANES), jnp.int32)
    toff_sel = jnp.zeros((rows, LANES), jnp.int32)
    for b in range(1, radix):
        past = (flat >= toff[0, b]).astype(jnp.int32)
        b_of = b_of + past
        toff_sel = toff_sel + past * (toff[0, b] - toff[0, b - 1])
    m = flat - toff_sel  # position within bucket across the tile

    q = jnp.zeros((rows, LANES), jnp.int32)  # source row
    csel_rows = []
    ssel_rows = []
    for r in range(rows):
        cum_bc = jnp.broadcast_to(cum_p[r : r + 1, :], (rows, LANES))
        csel = jnp.take_along_axis(cum_bc, b_of, axis=1)
        start_bc = jnp.broadcast_to(rowstart_p[r : r + 1, :], (rows, LANES))
        ssel = jnp.take_along_axis(start_bc, b_of, axis=1)
        csel_rows.append(csel)
        ssel_rows.append(ssel)
        if r > 0:
            q = q + (m >= csel).astype(jnp.int32)
    cum_at_q = jnp.zeros((rows, LANES), jnp.int32)
    start_at_q = jnp.zeros((rows, LANES), jnp.int32)
    for r in range(rows):
        sel = (q == r).astype(jnp.int32)
        cum_at_q = cum_at_q + sel * csel_rows[r]
        start_at_q = start_at_q + sel * ssel_rows[r]
    src_lane2 = start_at_q + (m - cum_at_q)

    # --- 4. exact flat gather (per-source-row loop) -----------------------
    out_k = jnp.zeros((rows, LANES), keys.dtype)
    out_i = jnp.zeros((rows, LANES), idx.dtype)
    for r in range(rows):
        sel = q == r
        k_bc = jnp.broadcast_to(rk[r : r + 1, :], (rows, LANES))
        i_bc = jnp.broadcast_to(ri[r : r + 1, :], (rows, LANES))
        out_k = jnp.where(
            sel, jnp.take_along_axis(k_bc, src_lane2, axis=1), out_k
        )
        out_i = jnp.where(
            sel, jnp.take_along_axis(i_bc, src_lane2, axis=1), out_i
        )
    return out_k, out_i


def _bucketize_kernel(
    keys_ref, idx_ref, ok_ref, oi_ref, *, shift, radix, tile_rows, tiles
):
    for g in range(tiles):
        sl = slice(g * tile_rows, (g + 1) * tile_rows)
        ok, oi = _bucketize_tile(keys_ref[sl, :], idx_ref[sl, :], shift, radix)
        ok_ref[sl, :] = ok
        oi_ref[sl, :] = oi


def _bucketize_ref(
    keys2d: jax.Array, idx2d: jax.Array, shift: int, cfg: EngineConfig
):
    """jnp reference implementation (paranoid-mode oracle; CPU-test path)."""
    num_tiles = keys2d.shape[0] // cfg.tile_rows
    k = keys2d.reshape(num_tiles, -1)
    i = idx2d.reshape(num_tiles, -1)
    digits = _digits_of(k, shift, cfg.radix)
    order = jnp.argsort(digits, axis=1, stable=True)
    return (
        jnp.take_along_axis(k, order, axis=1).reshape(keys2d.shape),
        jnp.take_along_axis(i, order, axis=1).reshape(idx2d.shape),
    )


@functools.partial(jax.jit, static_argnames=("shift", "cfg", "impl"))
def bucketize_tiles(
    keys2d: jax.Array,
    idx2d: jax.Array,
    shift: int,
    cfg: EngineConfig,
    impl: str | None = None,
):
    """Stable-sort every tile by digit (keys2d/idx2d: (T*tile_rows, LANES))."""
    if cfg.radix > 16:
        raise ValueError("bucketize supports radix <= 16 (sortkey = 4+7 bits)")
    impl = impl or kernel_impl()
    if impl == "reference":
        return _bucketize_ref(keys2d, idx2d, shift, cfg)
    rows = keys2d.shape[0]
    step_rows = cfg.tile_rows * TILES_PER_STEP
    num_steps = rows // step_rows
    kernel = functools.partial(
        _bucketize_kernel,
        shift=shift,
        radix=cfg.radix,
        tile_rows=cfg.tile_rows,
        tiles=TILES_PER_STEP,
    )
    spec = pl.BlockSpec((step_rows, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(num_steps,),
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct(keys2d.shape, keys2d.dtype),
            jax.ShapeDtypeStruct(idx2d.shape, idx2d.dtype),
        ],
        interpret=impl == "interpret",
    )(keys2d, idx2d)
