"""Stable LSD radix sort over columnar buffers — the ParallelSort controller.

Reference equivalent: ``Source/ComputeControllers/ParallelSort.cpp::Sort()``
(``:168-323``) — 32 passes x 4 dispatches of 1-bit extract / group scan /
group-sums scan / stable scatter over a ping-pong half-buffer, then a payload
gather.  TPU redesign: ``key_bits / radix_bits`` passes (8 by default), each
pass = one histogram kernel + one tiny offsets computation + one destination
kernel + one permutation application; ping-pong buffering is implicit in
XLA's functional arrays (the reference needed an explicit half/half SSBO,
``Include/SSBOs/IntermediateDataSsbo.h:7-10``, because GLSL mutates in
place).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gpuradixsort_tpu.config import (
    LANES,
    PAD_INDEX,
    PAD_KEY,
    EngineConfig,
)
from gpuradixsort_tpu.core.table import Column, Table, pad_to_tile, round_up
from gpuradixsort_tpu.kernels import radix as radix_kernels
from gpuradixsort_tpu.kernels.bucketize import bucketize_tiles
from gpuradixsort_tpu.kernels.scatter import DEFAULT_WINDOW_ROWS, scatter_runs
from gpuradixsort_tpu.ops import permute


def _radix_pass(
    keys: jax.Array,
    carried: tuple,
    shift: int,
    cfg: EngineConfig,
    strategy: str | None,
) -> tuple:
    """One stable counting-sort pass on digit (keys >> shift) & (radix-1).

    keys: (padded_n,) uint32.  carried: extra arrays permuted alongside.
    Returns (keys, carried) reordered by the digit, stably.
    """
    keys2d = keys.reshape(-1, LANES)
    hist = radix_kernels.tile_histograms(keys2d, shift, cfg)
    offsets = radix_kernels.global_offsets(hist)
    dest = radix_kernels.tile_destinations(keys2d, offsets, shift, cfg)
    out = permute.scatter_by_destination(
        dest.reshape(-1), [keys, *carried], strategy
    )
    return out[0], tuple(out[1:])


@functools.partial(
    jax.jit, static_argnames=("cfg", "strategy", "num_carried")
)
def _sort_padded(keys: jax.Array, carried: tuple, cfg: EngineConfig,
                 strategy: str | None, num_carried: int):
    del num_carried  # only used to key the jit cache on the pytree arity
    for p in range(cfg.num_passes):
        keys, carried = _radix_pass(
            keys, carried, p * cfg.radix_bits, cfg, strategy
        )
    return keys, carried


def _fused_pass(keys2d, idx2d, shift: int, cfg: EngineConfig,
                window_rows: int):
    """One fused pass: histogram -> bucketize -> window-write.

    The all-Pallas pipeline of docs/fast_scatter_design.md: per-tile local
    reorder in VMEM + run-granular streaming DMA scatter — no ``lax.sort``
    anywhere.  Data-adaptive skip: a pass whose digit is globally constant is
    the identity (the multi-bit generalization of skipping a dead bit; the
    reference always runs all 32 bit-passes, ``ParallelSort.cpp:236-298``).
    Returns (keys2d, idx2d, overflow) — on overflow (a run longer than the
    window) the data is garbage and the caller falls back.
    """
    hist = radix_kernels.tile_histograms(keys2d, shift, cfg)
    offsets = radix_kernels.global_offsets(hist)
    nontrivial = jnp.sum(jnp.sum(hist, axis=0) > 0) > 1
    overflow = nontrivial & (
        jnp.max(hist) > window_rows * LANES
    )

    def run(args):
        k2, i2 = args
        bk, bi = bucketize_tiles(k2, i2, shift, cfg)
        ok, oi, _ = scatter_runs(bk, bi, hist, offsets, cfg, window_rows)
        return ok, oi

    ok, oi = jax.lax.cond(
        nontrivial & ~overflow, run, lambda a: a, (keys2d, idx2d)
    )
    return ok, oi, overflow


@functools.partial(jax.jit, static_argnames=("cfg", "window_rows"))
def _fused_sort_padded(
    keys: jax.Array, idx: jax.Array, cfg: EngineConfig,
    window_rows: int = DEFAULT_WINDOW_ROWS,
):
    """Stable (key, index) sort via the fused Pallas pipeline.

    Digit skew past the window sets per-pass overflow; the whole sort then
    falls back to the XLA sort network on the original input (one
    ``lax.cond``, so the fallback compiles once, not per pass).
    """
    k2 = keys.reshape(-1, LANES)
    i2 = idx.reshape(-1, LANES)
    any_overflow = jnp.bool_(False)
    for p in range(cfg.num_passes):
        k2, i2, ov = _fused_pass(k2, i2, p * cfg.radix_bits, cfg, window_rows)
        any_overflow = any_overflow | ov

    def fallback(_):
        s, i = jax.lax.sort((keys, idx), num_keys=1, is_stable=True)
        return s, i

    def done(_):
        return k2.reshape(-1), i2.reshape(-1)

    s, i = jax.lax.cond(any_overflow, fallback, done, None)
    return s, i, any_overflow


def _xla_sort_padded(keys: jax.Array, carried: tuple):
    """Whole-sort fallback via XLA's native TPU sort network.

    Stability: jax.lax.sort is stable with is_stable default True.
    """
    out = jax.lax.sort((keys, *carried), num_keys=1, is_stable=True)
    return out[0], tuple(out[1:])


def _resolve_method(method: str) -> str:
    """Pick the fastest implementation for ``method="auto"``.

    Methods: "fused" (all-Pallas histogram/bucketize/window-write pipeline),
    "radix" (per-pass kernels + sort-strategy scatter; the semantic
    reference), "xla" (lax.sort network).  "auto" routes to the measured
    winner per backend — see bench.py / BENCH_r*.json for the numbers behind
    this choice.
    """
    if method != "auto":
        return method
    return "xla" if jax.default_backend() == "tpu" else "radix"


def sort_keys(
    keys: Column | jax.Array,
    cfg: EngineConfig | None = None,
    method: str = "auto",
    strategy: str | None = None,
) -> Column:
    """Sort a uint32 key column ascending, stably.  Returns a new Column."""
    col = _as_key_column(keys, cfg)
    cfg = cfg or EngineConfig()
    method = _resolve_method(method)
    if method == "radix":
        sorted_keys, _ = _sort_padded(col.data, (), cfg, strategy, 0)
    elif method == "xla":
        sorted_keys, _ = _xla_sort_padded(col.data, ())
    elif method == "fused":
        idx = pad_to_tile(
            jnp.arange(col.length, dtype=jnp.uint32), cfg, PAD_INDEX
        )
        sorted_keys, _, _ = _fused_sort_padded(col.data, idx, cfg)
    else:
        raise ValueError(f"unknown sort method: {method}")
    return Column(sorted_keys, col.length)


def sort_pairs(
    keys: Column | jax.Array,
    cfg: EngineConfig | None = None,
    method: str = "auto",
    strategy: str | None = None,
) -> tuple[Column, Column]:
    """Sort (key, original-row-index) pairs — the IntermediateData pipeline.

    The index column is the ``_globalIndexOfOriginalData`` of
    ``Include/SSBOs/IntermediateData.h:13-28``: it starts as iota and ends as
    the permutation that sorts the keys; pad entries carry PAD_INDEX.
    Stability of the radix passes guarantees equal keys keep original order,
    and that live rows precede pad rows even when live keys equal PAD_KEY.
    """
    col = _as_key_column(keys, cfg)
    cfg = cfg or EngineConfig()
    method = _resolve_method(method)
    idx = jnp.arange(col.length, dtype=jnp.uint32)
    idx = pad_to_tile(idx, cfg, PAD_INDEX)
    if method == "radix":
        sorted_keys, (perm,) = _sort_padded(col.data, (idx,), cfg, strategy, 1)
    elif method == "xla":
        sorted_keys, (perm,) = _xla_sort_padded(col.data, (idx,))
    elif method == "fused":
        sorted_keys, perm, _ = _fused_sort_padded(col.data, idx, cfg)
    else:
        raise ValueError(f"unknown sort method: {method}")
    return Column(sorted_keys, col.length), Column(perm, col.length)


def sort_table(
    table: Table,
    key: str,
    cfg: EngineConfig | None = None,
    method: str = "auto",
    strategy: str | None = None,
) -> Table:
    """Sort a whole table by one uint32 key column, stably.

    Key+payload sort: sort (key, index) pairs, then gather every payload
    column through the sorted index — the ``SortOriginalData.comp:33-50``
    payload permutation, generalized to arbitrarily many columns.
    """
    cfg = cfg or EngineConfig()
    key_col = table[key]
    sorted_keys, perm = sort_pairs(key_col, cfg, method, strategy)
    out = {key: sorted_keys}
    src = perm.data.astype(jnp.int32)
    for name in table.names():
        if name == key:
            continue
        col = table[name]
        # Pad rows gather arbitrary data (their src is the PAD_INDEX
        # sentinel, clipped); they sit past `length` and are never observed.
        gathered = permute.gather_rows(
            col.data, jnp.clip(src, 0, col.padded_length - 1)
        )
        out[name] = Column(gathered, col.length)
    return Table(out)


def _as_key_column(keys, cfg: EngineConfig | None) -> Column:
    cfg = cfg or EngineConfig()
    if isinstance(keys, Column):
        # Rows past the live prefix may hold arbitrary data (e.g. the dropped
        # rows after a filter compaction) — re-assert the pad sentinel so
        # they sort to the back, exactly like the reference's pad writes in
        # OriginalDataToIntermediateData.comp:44-47.
        if keys.length == keys.padded_length:
            return keys
        pos = jnp.arange(keys.padded_length, dtype=jnp.int32)
        data = jnp.where(pos < keys.length, keys.data, PAD_KEY)
        return Column(data, keys.length)
    arr = jnp.asarray(keys, dtype=jnp.uint32)
    return Column(pad_to_tile(arr, cfg, PAD_KEY), arr.shape[0])
