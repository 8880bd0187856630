"""Result verification — the reference's CPU is-sorted check, vectorized.

Reference: after every Sort(), a full GPU->CPU readback and a linear
``value < prevValue`` scan that prints violations, skipping 0xffffffff pads
(``ParallelSort.cpp:326-352``) — which cost 1.11 s for 1M elements
(``durations.txt:5``).  Here the same oracle is a vectorized comparison
(device- or numpy-side), plus the stronger permutation oracle the reference's
demo data enables (shuffled 0..N-1 must sort to exactly arange,
``ParallelSort.cpp:347``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def is_sorted(keys, length: int | None = None) -> bool:
    """True iff keys[:length] is non-decreasing."""
    arr = np.asarray(keys)
    if length is not None:
        arr = arr[:length]
    if arr.size <= 1:
        return True
    return bool(np.all(arr[1:] >= arr[:-1]))


def is_permutation_sorted(keys, n: int | None = None) -> bool:
    """The reference's demo oracle: sorted shuffled 0..N-1 == arange."""
    arr = np.asarray(keys)
    if n is not None:
        arr = arr[:n]
    return bool(np.array_equal(arr, np.arange(arr.shape[0], dtype=arr.dtype)))


def device_is_sorted(keys: jax.Array) -> jax.Array:
    """Device-side sortedness predicate (no readback; composable under jit)."""
    if keys.shape[0] <= 1:
        return jnp.asarray(True)
    return jnp.all(keys[1:] >= keys[:-1])
