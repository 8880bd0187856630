"""Applying permutations on TPU — the stable-scatter / payload-gather layer.

The reference scatters each element to a computed destination with a plain
indexed store (``SortIntermediateData.comp:63-66``) and gathers payload rows
with an indexed load (``SortOriginalData.comp:33-50``).  TPUs have no
efficient random scatter, so this module centralizes the strategies for
applying a computed permutation and lets the operators pick per backend:

- ``"sort"``: apply out[dest[i]] = v[i] as a key-value sort on ``dest``.
  Since ``dest`` is a permutation of 0..N-1, sorting by it realizes exactly
  the scatter, using XLA's fully-vectorized TPU sort network — no
  per-element addressing at all.
- ``"xla_scatter"``: XLA scatter with unique indices (fast on CPU; on TPU it
  serializes, kept for cross-checking).

``gather_rows`` applies the inverse direction (out[i] = v[src[i]]) for final
payload permutation.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

# Default strategy per backend: XLA scatter serializes on TPU, so the
# sort-network application is the TPU default; CPU scatter is vectorized and
# cheap, which keeps interpreter-mode tests fast.
def default_scatter_strategy() -> str:
    return "sort" if jax.default_backend() == "tpu" else "xla_scatter"


def scatter_by_destination(
    dest: jax.Array, values: Sequence[jax.Array], strategy: str | None = None
) -> list[jax.Array]:
    """Realize out[dest[i]] = values[i] for each array in ``values``.

    ``dest`` must be a permutation of 0..N-1 (guaranteed by construction in
    the radix pass: offsets partition the index space and ranks are unique
    within a bucket).
    """
    strategy = strategy or default_scatter_strategy()
    if strategy == "sort":
        # Sorting (dest, iota) yields the inverse permutation; rows then move
        # via gather, which handles any column rank in one pass.
        iota = jax.lax.iota(jnp.int32, dest.shape[0])
        _, inv = jax.lax.sort((dest, iota), num_keys=1)
        return [gather_rows(v, inv) for v in values]
    if strategy == "xla_scatter":
        return [
            jnp.zeros_like(v)
            .at[dest]
            .set(v, unique_indices=True, mode="promise_in_bounds")
            for v in values
        ]
    raise ValueError(f"unknown scatter strategy: {strategy}")


def gather_rows(values: jax.Array, src: jax.Array) -> jax.Array:
    """out[i] = values[src[i]] — payload permutation by gather.

    The ``SortOriginalData.comp:33-50`` analog: after sorting (key, index)
    pairs, payload rows are pulled through the sorted index column.  Gather is
    TPU-native (jnp.take lowers to XLA dynamic-gather).
    """
    return jnp.take(values, src, axis=0, mode="clip")
