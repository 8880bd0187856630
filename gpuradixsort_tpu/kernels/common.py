"""Shared in-kernel helpers for the Pallas TPU kernels.

The reference implements its in-work-group cooperation with barrier()-fenced
shared memory (``Shaders/ParallelSort/ParallelPrefixScan.comp:51-141``).  On
TPU the analog is: a tile lives in VMEM, and "cooperation" is plain vector
arithmetic over the whole tile — no barriers, no thread IDs.  These helpers
implement the log-step shift-add (Hillis-Steele) prefix sums the kernels use,
built only from static concatenate/slice ops (Mosaic-friendly; no
lax.cumsum/pad primitives, no dynamic shapes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu


def _shift_right(x: jnp.ndarray, shift: int, axis: int) -> jnp.ndarray:
    """Shift ``x`` right by ``shift`` along ``axis``, filling with zeros.

    Implemented as a circular ``pltpu.roll`` plus an iota mask: Mosaic lowers
    rolls on every axis/rank, whereas concatenate/slice along the sublane axis
    does not ("result/input offset mismatch on non-concat dimension").
    """
    axis = axis % x.ndim
    n = x.shape[axis]
    if shift >= n:
        return jnp.zeros_like(x)
    rolled = pltpu.roll(x, shift, axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    return jnp.where(idx >= shift, rolled, jnp.zeros_like(x))


def inclusive_cumsum(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Inclusive prefix sum along ``axis`` via log2(n) shift-adds.

    Role-equivalent of the reference's Blelloch up/down-sweep over shared
    memory (``ParallelPrefixScan.comp:70-135``) — but Hillis-Steele, because on
    a vector machine the extra O(n log n) work is free relative to keeping the
    whole tile dense in VMEM and avoiding gather/scatter of tree indices.
    """
    n = x.shape[axis]
    shift = 1
    while shift < n:
        x = x + _shift_right(x, shift, axis)
        shift *= 2
    return x


def exclusive_cumsum(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Exclusive prefix sum along ``axis`` (first element 0)."""
    return _shift_right(inclusive_cumsum(x, axis), 1, axis)


def rowmajor_exclusive_scan_2d(x: jnp.ndarray) -> jnp.ndarray:
    """Exclusive scan of a (rows, lanes) tile in row-major element order.

    The flat element order of a tile is row-major over (sublane, lane); a full
    exclusive scan decomposes as: scan within each row, plus the exclusive
    scan of the row totals broadcast down each row.  This is the same
    group-scan + scan-of-group-sums decomposition the reference uses across
    work groups (``ParallelPrefixScan.comp:93-104,151-196``), applied at the
    sublane level.
    """
    row_incl = inclusive_cumsum(x, axis=-1)
    row_tot = row_incl[..., -1:]
    row_off = exclusive_cumsum(row_tot, axis=-2)
    return row_off + row_incl - x
