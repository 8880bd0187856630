"""Window-writer kernel: the global stable scatter, as streaming aligned DMA.

Reference equivalent: ``Shaders/ParallelSort/SortIntermediateData.comp:42-66``
— a per-element indexed store ``IntermediateDataBuffer[dest] = value``
dispatched at ``Source/ComputeControllers/ParallelSort.cpp:283-292``.  TPU has
no efficient random store, so the scatter is recast (SURVEY.md §7 hard part 1,
docs/fast_scatter_design.md step 3) as run-granular streaming:

After ``bucketize_tiles`` each tile is digit-major, so the globally scattered
output is exactly the concatenation of the (digit r, tile t) runs in
(r-outer, t-inner) lexicographic order — the same group-offset + within-group
-rank factorization the reference uses (``SortIntermediateData.comp:42-44``),
lifted from elements to whole runs.  The kernel walks that (r, t) order as a
sequential Pallas grid and maintains an *aligned streaming frontier*:

- a VMEM carry row holds the current partial output row (< 128 elements);
- each step DMAs the source window rows covering its run from HBM, rotates
  the run into frontier alignment (one dynamic lane roll + one sublane-carry
  select), merges it behind the carry, and writes only the now-complete
  128-lane rows back to HBM at the frontier row;
- every output row is therefore written exactly once, by full-row DMA, with
  no read-modify-write and no overlap between steps.

All per-step scalars (source row, roll amount, carry fill, rows to write,
frontier row) are precomputed host-side from the histogram/offset tables —
the grid walks them via a per-step SMEM meta block, so the kernel body does
no address arithmetic beyond reading five scalars.

Runs longer than the static window (digit skew) are detected host-side
(``counts.max() > window``) and the pass falls back to the sort-strategy
scatter; see ops/sort.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpuradixsort_tpu.config import LANES, EngineConfig, kernel_impl

# Window size in 128-lane rows.  A (digit, tile) run of up to
# window_rows*LANES elements is handled per step; the DMA reads
# window_rows + 2 rows (one for the unaligned head, one of rotation slack).
# The default window capacity (14 * 128 = 1792) exceeds the tile size
# (tile_rows * LANES = 1024), so a run can NEVER exceed the window: the
# overflow fallback is structurally unreachable and the fused pipeline
# stays all-Pallas on every input, including padded ones whose all-pad
# tail tiles form full-tile runs (the case that silently forced the
# fallback on every padded sort when the window was 2 rows).  14 rather
# than 8 because the DMA/roll window buffer is window_rows + 2 rows and a
# 10-row (non-8-aligned) buffer faults Mosaic on v5e at this size; 16 rows
# is sublane-aligned.  The scatter is per-step-overhead-bound, not
# byte-bound, so the wider read window costs little (durations_tpu.txt).
DEFAULT_WINDOW_ROWS = 14


# Meta tables are delivered to the kernel as (8, 128)-row SMEM blocks, each
# holding the scalars for META_BLOCK consecutive grid steps — SMEM on v5e is
# 1 MB, so whole-grid scalar prefetch stops scaling around 8M keys; blocked
# delivery scales to any N at 4 KB of SMEM per table.
META_ROWS = 8
META_BLOCK = META_ROWS * LANES


def plan_windows(
    hist: jax.Array, offsets: jax.Array, tile_rows: int, radix: int,
    window_rows: int,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Host-side (traced, tiny) per-step scalar plan for the kernel.

    hist/offsets: (T, LANES) int32 per-tile counts / global base offsets
    (lane r = bucket r).  Returns ``(off, src, cnt, overflow)``: per-step
    global output offset, flat source position, and run length, each shaped
    for blocked SMEM delivery ((ceil(G/1024)*8, 128), step g at
    [g//128 % 8, g%128] of block g//1024) in (r-outer, t-inner) step order;
    plus the scalar skew flag (some run exceeds the window).
    """
    num_tiles = hist.shape[0]
    w = window_rows * LANES
    local_off = jnp.cumsum(hist, axis=1) - hist  # within-tile run starts
    # (T, R) -> (R, T) step-major views of the R live lanes.
    cnt = hist[:, :radix].T
    off = offsets[:, :radix].T
    loff = local_off[:, :radix].T
    overflow = jnp.max(cnt) > w

    tile_base = jnp.arange(num_tiles, dtype=jnp.int32) * (tile_rows * LANES)
    src = tile_base[None, :] + loff

    def to_blocks(x):
        flat = x.reshape(-1).astype(jnp.int32)
        g = flat.shape[0]
        padded = -(-g // META_BLOCK) * META_BLOCK
        if padded != g:
            flat = jnp.concatenate(
                [flat, jnp.zeros((padded - g,), jnp.int32)]
            )
        return flat.reshape(-1, LANES)

    return to_blocks(off), to_blocks(src), to_blocks(cnt), overflow


def _window_kernel(
    off_ref, src_ref, cnt_ref, bk_hbm, bi_hbm, ok_hbm, oi_hbm,
    wk, wi, mk, mi, ck, ci, in_sem, out_sem, *, window_rows,
):
    """One step = one (digit, tile) run through the streaming frontier."""
    r_w = window_rows + 2
    step = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    j = step % META_BLOCK  # position inside this step's SMEM meta block
    jr, jl = j // LANES, j % LANES
    off = off_ref[jr, jl]
    src = src_ref[jr, jl]
    cnt = cnt_ref[jr, jl]
    src_row = src // LANES
    p = src % LANES
    c = off % LANES
    dst_row = off // LANES
    # Clamped so a skew-overflow run still stays in bounds (output is then
    # garbage; the caller checks the overflow flag and falls back).
    full_rows = jnp.minimum((off + cnt) // LANES - dst_row, r_w - 1)
    d = c - p
    roll = jnp.where(d < 0, d + LANES, d)
    upshift = (d < 0).astype(jnp.int32)

    @pl.when(step == 0)
    def _():
        ck[:] = jnp.zeros_like(ck)
        ci[:] = jnp.zeros_like(ci)

    # Fetch the window rows covering this run ([src_row, src_row + r_w)).
    cp_k = pltpu.make_async_copy(
        bk_hbm.at[pl.ds(src_row, r_w), :], wk, in_sem.at[0])
    cp_i = pltpu.make_async_copy(
        bi_hbm.at[pl.ds(src_row, r_w), :], wi, in_sem.at[1])
    cp_k.start()
    cp_i.start()
    cp_k.wait()
    cp_i.wait()

    lane = jax.lax.broadcasted_iota(jnp.int32, (r_w, LANES), 1)

    def align(buf):
        # Flat-roll the window so run element j lands at flat slot c + j:
        # dynamic lane roll + sublane carry select, then an optional one-row
        # up-shift when the roll wrapped the start into row 1.  The up-shift
        # is a select between two STATIC sublane rolls — Mosaic's dynamic
        # sublane rotate requires 8-aligned sublane counts, which the
        # (window_rows + 2, 128) buffer is not.
        y = pltpu.roll(buf, roll, 1)
        flat = jnp.where(lane >= roll, y, pltpu.roll(y, 1, 0))
        return jnp.where(upshift == 1, pltpu.roll(flat, r_w - 1, 0), flat)

    fk = align(wk[:])
    fi = align(wi[:])

    # Merge behind the carry: row 0's first c lanes are the open partial row.
    row0 = jax.lax.broadcasted_iota(jnp.int32, (r_w, LANES), 0) == 0
    keep = row0 & (lane < c)
    mk[:] = jnp.where(keep, jnp.broadcast_to(ck[:], (r_w, LANES)), fk)
    mi[:] = jnp.where(keep, jnp.broadcast_to(ci[:], (r_w, LANES)), fi)

    # Write the completed rows (disjoint across steps; each output row is
    # written exactly once).
    def write(nrows):
        def go(_):
            wr_k = pltpu.make_async_copy(
                mk.at[pl.ds(0, nrows), :],
                ok_hbm.at[pl.ds(dst_row, nrows), :], out_sem.at[0])
            wr_i = pltpu.make_async_copy(
                mi.at[pl.ds(0, nrows), :],
                oi_hbm.at[pl.ds(dst_row, nrows), :], out_sem.at[1])
            wr_k.start()
            wr_i.start()
            wr_k.wait()
            wr_i.wait()
            return 0
        return go

    jax.lax.switch(
        full_rows, [lambda _: 0] + [write(n) for n in range(1, r_w)], 0
    )

    # The new carry is the still-open row just past the written ones.
    ck[:] = mk[pl.ds(full_rows, 1), :]
    ci[:] = mi[pl.ds(full_rows, 1), :]


def _scatter_runs_ref(bk2d, bi2d, hist, offsets, tile_rows: int, radix: int):
    """jnp oracle: element-exact scatter of the bucketized runs."""
    num_tiles = hist.shape[0]
    local_off = jnp.cumsum(hist, axis=1) - hist
    pos = jnp.arange(tile_rows * LANES, dtype=jnp.int32)
    pos = jnp.broadcast_to(pos[None, :], (num_tiles, tile_rows * LANES))
    k = bk2d.reshape(num_tiles, -1)
    i = bi2d.reshape(num_tiles, -1)
    # Which run does each in-tile slot belong to?  Slots are digit-major, so
    # the run id is the searchsorted bucket of the slot position.
    ends = jnp.cumsum(hist[:, :radix], axis=1)
    b = jax.vmap(
        lambda e, p: jnp.searchsorted(e, p, side="right"), in_axes=(0, 0)
    )(ends.astype(jnp.int32), pos).astype(jnp.int32)
    b = jnp.minimum(b, radix - 1)
    base = jnp.take_along_axis(offsets, b, axis=1)
    loff = jnp.take_along_axis(local_off, b, axis=1)
    dest = base + (pos - loff)
    flat_dest = dest.reshape(-1)
    out_k = jnp.zeros_like(bk2d.reshape(-1)).at[flat_dest].set(
        k.reshape(-1), unique_indices=True, mode="drop")
    out_i = jnp.zeros_like(bi2d.reshape(-1)).at[flat_dest].set(
        i.reshape(-1), unique_indices=True, mode="drop")
    return out_k.reshape(bk2d.shape), out_i.reshape(bi2d.shape)


@functools.partial(
    jax.jit, static_argnames=("cfg", "window_rows", "impl")
)
def scatter_runs(
    bk2d: jax.Array,
    bi2d: jax.Array,
    hist: jax.Array,
    offsets: jax.Array,
    cfg: EngineConfig,
    window_rows: int = DEFAULT_WINDOW_ROWS,
    impl: str | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Scatter bucketized tiles to their global stable positions.

    bk2d/bi2d: (T * tile_rows, LANES) bucketized keys/indices (each tile
    digit-major, from ``bucketize_tiles``).  hist/offsets: (T, LANES) per-tile
    counts and global digit-major offsets (``global_offsets``).  Returns
    (keys, indices, overflow); on overflow=True the data output is garbage and
    the caller must fall back (runs longer than ``window_rows * 128``).
    """
    radix = cfg.radix
    num_tiles = hist.shape[0]
    off_b, src_b, cnt_b, overflow = plan_windows(
        hist, offsets, cfg.tile_rows, radix, window_rows)
    impl = impl or kernel_impl()
    if impl == "reference":
        ok, oi = _scatter_runs_ref(
            bk2d, bi2d, hist, offsets, cfg.tile_rows, radix)
        return ok, oi, overflow

    r_w = window_rows + 2
    rows = bk2d.shape[0]
    # Tail slack: the last tiles' windows read up to r_w rows past the data.
    slack = jnp.zeros((r_w, LANES), bk2d.dtype)
    bk_p = jnp.concatenate([bk2d, slack], axis=0)
    bi_p = jnp.concatenate([bi2d, slack.astype(bi2d.dtype)], axis=0)

    kernel = functools.partial(_window_kernel, window_rows=window_rows)
    meta_spec = pl.BlockSpec(
        (META_ROWS, LANES),
        lambda r, t: ((r * num_tiles + t) // META_BLOCK, 0),
        memory_space=pltpu.SMEM,
    )
    ok, oi = pl.pallas_call(
        kernel,
        grid=(radix, num_tiles),
        in_specs=[
            meta_spec,
            meta_spec,
            meta_spec,
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((r_w, LANES), bk2d.dtype),
            pltpu.VMEM((r_w, LANES), bi2d.dtype),
            pltpu.VMEM((r_w, LANES), bk2d.dtype),
            pltpu.VMEM((r_w, LANES), bi2d.dtype),
            pltpu.VMEM((1, LANES), bk2d.dtype),
            pltpu.VMEM((1, LANES), bi2d.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANES), bk2d.dtype),
            jax.ShapeDtypeStruct((rows, LANES), bi2d.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            has_side_effects=True,
        ),
        interpret=impl == "interpret",
    )(off_b, src_b, cnt_b, bk_p, bi_p)
    return ok, oi, overflow
