"""Pallas kernel bodies (interpreter mode) vs their jnp reference impls.

This is the engine's "paranoid mode" contract (SURVEY.md §5, race-detection
row): every Pallas kernel has a compact jnp reference implementation, and the
two must agree bit-for-bit.  Off-TPU the operators run the reference path
(compiling interpreter-mode Pallas explodes XLA graph size); these tests are
the only place CPU CI pays the interpreter cost, at one small shape each.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gpuradixsort_tpu.config import LANES, EngineConfig
from gpuradixsort_tpu.kernels import bucketize as bk
from gpuradixsort_tpu.kernels import radix as rk
from gpuradixsort_tpu.kernels import scan as sk

CFG = EngineConfig()


@pytest.fixture(scope="module")
def tile_data(rng):
    n = CFG.block  # one grid step
    keys = rng.integers(0, 2**32, size=n, dtype=np.uint32)
    idx = np.arange(n, dtype=np.uint32)
    return (
        jnp.asarray(keys).reshape(-1, LANES),
        jnp.asarray(idx).reshape(-1, LANES),
    )


def test_histogram_parity(tile_data):
    k2d, _ = tile_data
    ref = rk.tile_histograms(k2d, 8, CFG, impl="reference")
    interp = rk.tile_histograms(k2d, 8, CFG, impl="interpret")
    np.testing.assert_array_equal(np.asarray(interp), np.asarray(ref))


def test_destinations_parity(tile_data):
    k2d, _ = tile_data
    off = rk.global_offsets(rk.tile_histograms(k2d, 0, CFG, impl="reference"))
    ref = rk.tile_destinations(k2d, off, 0, CFG, impl="reference")
    interp = rk.tile_destinations(k2d, off, 0, CFG, impl="interpret")
    np.testing.assert_array_equal(np.asarray(interp), np.asarray(ref))
    # And the reference itself is a permutation of 0..n-1.
    flat = np.sort(np.asarray(ref).reshape(-1))
    np.testing.assert_array_equal(flat, np.arange(flat.size))


def test_bucketize_parity(tile_data):
    k2d, i2d = tile_data
    rk_ref, ri_ref = bk.bucketize_tiles(k2d, i2d, 4, CFG, impl="reference")
    rk_int, ri_int = bk.bucketize_tiles(k2d, i2d, 4, CFG, impl="interpret")
    np.testing.assert_array_equal(np.asarray(rk_int), np.asarray(rk_ref))
    np.testing.assert_array_equal(np.asarray(ri_int), np.asarray(ri_ref))


def test_scan_parity(rng):
    x = jnp.asarray(rng.integers(0, 7, size=3 * CFG.tile).astype(np.int32))
    s_ref, t_ref = sk.exclusive_scan(x, CFG, impl="reference")
    s_int, t_int = sk.exclusive_scan(x, CFG, impl="interpret")
    np.testing.assert_array_equal(np.asarray(s_int), np.asarray(s_ref))
    assert int(t_int) == int(t_ref)
