"""Exclusive-scan kernel vs. the jnp.cumsum oracle (SURVEY.md §4.6)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gpuradixsort_tpu.config import EngineConfig
from gpuradixsort_tpu.kernels.scan import exclusive_scan


@pytest.mark.parametrize(
    "n", [1, 7, 128, 1024, 1025, 4096, 100_000]
)
def test_exclusive_scan_matches_oracle(n, rng):
    x = rng.integers(0, 5, size=n).astype(np.int32)
    scan, total = exclusive_scan(jnp.asarray(x))
    expected = np.cumsum(x) - x
    np.testing.assert_array_equal(np.asarray(scan), expected)
    assert int(total) == int(x.sum())


def test_exclusive_scan_zeros_and_ones():
    n = 2048
    ones = jnp.ones((n,), jnp.int32)
    scan, total = exclusive_scan(ones)
    np.testing.assert_array_equal(np.asarray(scan), np.arange(n))
    assert int(total) == n

    zeros = jnp.zeros((n,), jnp.int32)
    scan, total = exclusive_scan(zeros)
    assert int(total) == 0
    assert not np.asarray(scan).any()


def test_exclusive_scan_large_tiles():
    # Exceed the reference's 1024^2 cap contributor: many tiles, one pass.
    cfg = EngineConfig(tile_rows=16)
    n = 1 << 17
    x = jnp.ones((n,), jnp.int32)
    scan, total = exclusive_scan(x, cfg)
    assert int(total) == n
    assert int(scan[-1]) == n - 1
