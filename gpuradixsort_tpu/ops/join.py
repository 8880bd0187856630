"""Equi-join of columnar tables on uint32 keys (BASELINE.json config 5).

No reference equivalent (the reference only sorts).  TPU-native design: a
sort-probe join — sort the build side by key once (the engine's own stable
radix sort), then every probe row finds its match with a vectorized binary
search (``jnp.searchsorted``), which is log2(N) sequential gathers of fully
vectorized probe batches; no hash table, no random scatter.  The role the
radix-partitioned hash join plays on GPUs is served here by the
radix-sort + searchsorted pair, which keeps all memory traffic streaming.

Supported: inner / semi / anti probe-side joins against a build side with
unique keys (validated on request).  Duplicate build keys need run expansion
(dynamic output size) — planned with the distributed shuffle work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gpuradixsort_tpu.config import EngineConfig
from gpuradixsort_tpu.core.table import Column, Table
from gpuradixsort_tpu.ops.filter import Selection, filter_table
from gpuradixsort_tpu.ops.sort import sort_table


def join(
    probe: Table,
    build: Table,
    key: str,
    how: str = "inner",
    cfg: EngineConfig | None = None,
    validate_unique: bool = False,
    build_prefix: str = "build_",
) -> Selection:
    """Join ``probe`` rows against ``build`` rows on uint32 column ``key``.

    - ``inner``: probe rows with a build match, plus the build payload
      columns (named ``build_<name>``).
    - ``semi``: probe rows with a build match, probe columns only.
    - ``anti``: probe rows without a build match.

    Build keys must be unique for ``inner`` (each probe row matches at most
    one build row); set ``validate_unique=True`` to check (host sync).
    """
    cfg = cfg or EngineConfig()
    if how not in ("inner", "semi", "anti"):
        raise ValueError(f"unknown join type: {how}")

    build_sorted = sort_table(build, key, cfg)
    bkeys = build_sorted[key].valid()  # static slice: live prefix
    nb = build.length
    if validate_unique and nb > 1:
        dup = bool(jnp.any(bkeys[1:] == bkeys[:-1]))
        if dup:
            raise ValueError("build side has duplicate keys")

    pkeys = probe[key].data  # padded; pad rows filtered out below
    pos = jnp.searchsorted(bkeys, pkeys, side="left").astype(jnp.int32)
    safe_pos = jnp.clip(pos, 0, max(nb - 1, 0))
    matched = (pos < nb) & (jnp.take(bkeys, safe_pos, mode="clip") == pkeys)
    # A probe key equal to the pad sentinel can only match a real build row
    # (bkeys holds live rows only), so no pad-collision handling is needed;
    # probe pad rows are dropped by filter_table's live mask.

    if how == "inner":
        cols = dict(probe.columns)
        for name in build_sorted.names():
            if name == key:
                continue
            col = build_sorted[name]
            gathered = jnp.take(col.data, safe_pos, axis=0, mode="clip")
            cols[build_prefix + name] = Column(gathered, probe.length)
        joined = Table(cols)
        keep = matched
    elif how == "semi":
        joined = probe
        keep = matched
    else:  # anti
        joined = probe
        keep = ~matched

    return filter_table(joined, lambda _t: keep, cfg)
