"""Group-by aggregation over columnar tables (BASELINE.json config 4).

No reference equivalent (the reference only sorts) — but the TPU-native
design is the reference's own primitives recomposed: stable sort brings equal
keys together, the boundary mask between key runs is "the extracted bit", an
inclusive scan of values turns group sums into differences at run ends, and
the stable compaction pass collects one row per group.  Sort + scan + compact
— no hash table, no random scatter: on TPU a sorted-aggregation is the
bandwidth-optimal plan, serving the role a hash aggregate serves on CPU/GPU.

Aggregation kinds: sum, count, min, max, mean.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import jax
import jax.numpy as jnp

from gpuradixsort_tpu.config import EngineConfig
from gpuradixsort_tpu.core.table import Column, Table
from gpuradixsort_tpu.ops.filter import Selection, _compact_by_mask
from gpuradixsort_tpu.ops.sort import sort_table

SUPPORTED = ("sum", "count", "min", "max", "mean")


def group_by_aggregate(
    table: Table,
    key: str,
    aggs: Mapping[str, tuple[str, str]],
    cfg: EngineConfig | None = None,
    method: str = "auto",
) -> Selection:
    """Group ``table`` by uint32 column ``key`` and aggregate.

    ``aggs`` maps output column name -> (input column name, kind) with kind
    one of sum/count/min/max/mean.  Returns a Selection whose table holds one
    row per group (keys ascending), with the group count as device scalar.
    """
    cfg = cfg or EngineConfig()
    for out_name, (col, kind) in aggs.items():
        if kind not in SUPPORTED:
            raise ValueError(f"unsupported aggregation {kind!r} for {out_name}")
        if kind != "count" and col not in table.columns:
            raise KeyError(f"aggregation input column {col!r} not in table")

    ordered = sort_table(table, key, cfg, method)
    keys = ordered[key].data
    n = table.length
    padded = keys.shape[0]
    pos = jnp.arange(padded, dtype=jnp.int32)
    live = pos < n

    # Run boundaries in sorted order: first-of-group / last-of-group masks.
    prev = jnp.concatenate([keys[:1] ^ jnp.uint32(1), keys[:-1]])
    is_first = (keys != prev) | (pos == 0)
    nxt = jnp.concatenate([keys[1:], keys[-1:] ^ jnp.uint32(1)])
    is_last = ((keys != nxt) | (pos == padded - 1)) & live

    # Exclusive sums-at-previous-boundary via cumulative sums evaluated at
    # run ends; the subtraction of the previous run's cumsum happens after
    # compaction, where groups are adjacent.
    out_cols: dict[str, jax.Array] = {key: keys}
    for out_name, (col, kind) in aggs.items():
        if kind == "count":
            out_cols[out_name] = jnp.where(live, 1, 0).astype(jnp.int32)
        else:
            out_cols[out_name] = ordered[col].data

    # Build per-row running values so that (value at my run end) - (value at
    # previous run end) is the group aggregate.
    running: dict[str, jax.Array] = {key: keys}
    for out_name, (col, kind) in aggs.items():
        v = out_cols[out_name]
        if kind in ("sum", "mean", "count"):
            running[out_name] = jnp.cumsum(
                jnp.where(live, v, jnp.zeros_like(v)), dtype=jnp.int64
                if jnp.issubdtype(v.dtype, jnp.integer) and jax.config.x64_enabled
                else None
            )
        elif kind in ("min", "max"):
            # Segmented running min/max: reset at run starts via a prefix
            # combine over (value, segment-start) pairs.
            neutral = (
                jnp.iinfo(v.dtype).max if kind == "min" else jnp.iinfo(v.dtype).min
            ) if jnp.issubdtype(v.dtype, jnp.integer) else (
                jnp.inf if kind == "min" else -jnp.inf
            )
            vv = jnp.where(live, v, jnp.full_like(v, neutral))
            op = jnp.minimum if kind == "min" else jnp.maximum

            def combine(a, b, op=op):
                av, af = a
                bv, bf = b
                return (jnp.where(bf, bv, op(av, bv)), af | bf)

            seg, _ = jax.lax.associative_scan(combine, (vv, is_first))
            running[out_name] = seg

    # Compact run-end rows to the front (one binary counting-sort pass).
    names = list(running.keys())
    values = [running[name] for name in names]
    compacted, count = _compact_by_mask(
        is_last.astype(jnp.int32), values, cfg, None
    )
    comp = dict(zip(names, compacted))

    # Also need, per compacted group g, the run-end position (for counts) and
    # the previous group's cumsums; compact positions alongside.
    (positions,), _ = _compact_by_mask(
        is_last.astype(jnp.int32), [pos], cfg, None
    )

    result: dict[str, Column] = {key: Column(comp[key], n)}
    gidx = jnp.arange(padded, dtype=jnp.int32)
    valid_group = gidx < count

    def prev_of(arr):
        z = jnp.zeros((1,), arr.dtype)
        return jnp.concatenate([z, arr[:-1]])

    counts = jnp.where(valid_group, positions + 1 - prev_of(positions + 1), 0)
    for out_name, (col, kind) in aggs.items():
        c = comp[out_name]
        if kind in ("sum", "count"):
            vals = c - prev_of(c)
        elif kind == "mean":
            vals = (c - prev_of(c)) / jnp.maximum(counts, 1).astype(jnp.float32)
        else:  # min/max: the segmented running value at the run end IS the
            # group aggregate (it reset at the run start).
            vals = c
        vals = jnp.where(valid_group, vals, jnp.zeros_like(vals))
        result[out_name] = Column(vals, n)

    return Selection(Table(result), count)
