"""Bucketize kernel vs np.argsort(digit, kind='stable') per tile."""

import jax.numpy as jnp
import numpy as np
import pytest

from gpuradixsort_tpu.config import LANES, EngineConfig
from gpuradixsort_tpu.kernels.bucketize import bucketize_tiles

CFG = EngineConfig()


def _oracle(keys, idx, shift, radix, tile):
    ok = np.empty_like(keys)
    oi = np.empty_like(idx)
    for t0 in range(0, len(keys), tile):
        sl = slice(t0, t0 + tile)
        d = (keys[sl] >> shift) & (radix - 1)
        order = np.argsort(d, kind="stable")
        ok[sl] = keys[sl][order]
        oi[sl] = idx[sl][order]
    return ok, oi


@pytest.mark.parametrize("shift", [0, 4, 28])
def test_bucketize_matches_stable_argsort(shift, rng):
    n = 4 * CFG.block
    keys = rng.integers(0, 2**32, size=n, dtype=np.uint32)
    idx = np.arange(n, dtype=np.uint32)
    ok, oi = bucketize_tiles(
        jnp.asarray(keys).reshape(-1, LANES),
        jnp.asarray(idx).reshape(-1, LANES),
        shift,
        CFG,
    )
    ek, ei = _oracle(keys, idx, shift, CFG.radix, CFG.tile)
    np.testing.assert_array_equal(np.asarray(ok).reshape(-1), ek)
    np.testing.assert_array_equal(np.asarray(oi).reshape(-1), ei)


def test_bucketize_degenerate_digits(rng):
    n = CFG.block
    idx = np.arange(n, dtype=np.uint32)
    for name, keys in {
        "all_equal": np.full(n, 0x7, dtype=np.uint32),
        "two_values": rng.choice(
            np.array([0x0, 0xF], dtype=np.uint32), size=n
        ).astype(np.uint32),
        "sorted_digits": np.repeat(
            np.arange(16, dtype=np.uint32), n // 16
        ),
        "reverse_digits": np.repeat(
            np.arange(15, -1, -1, dtype=np.uint32).astype(np.uint32), n // 16
        ),
    }.items():
        ok, oi = bucketize_tiles(
            jnp.asarray(keys).reshape(-1, LANES),
            jnp.asarray(idx).reshape(-1, LANES),
            0,
            CFG,
        )
        ek, ei = _oracle(keys, idx, 0, CFG.radix, CFG.tile)
        np.testing.assert_array_equal(
            np.asarray(ok).reshape(-1), ek, err_msg=name
        )
        np.testing.assert_array_equal(
            np.asarray(oi).reshape(-1), ei, err_msg=name
        )
