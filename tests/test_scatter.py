"""Window-writer (scatter_runs) tests: plan math, oracle parity, overflow.

Oracle: histogram -> offsets -> bucketize -> scatter_runs must equal the
global stable sort by the current digit (np.argsort kind="stable") — the
output contract of the reference's per-bit scatter dispatch
(``SortIntermediateData.comp:42-66``).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from gpuradixsort_tpu.config import EngineConfig, LANES
from gpuradixsort_tpu.kernels import radix as rk
from gpuradixsort_tpu.kernels import scatter as sck
from gpuradixsort_tpu.kernels.bucketize import bucketize_tiles


def _digit_sorted_oracle(keys, idx, shift, radix):
    d = (keys >> np.uint32(shift)) & np.uint32(radix - 1)
    order = np.argsort(d, kind="stable")
    return keys[order], idx[order]


def _pipeline(keys_np, shift, cfg, impl, window_rows=2):
    keys2d = jnp.asarray(keys_np).reshape(-1, LANES)
    idx2d = jnp.arange(keys_np.size, dtype=jnp.uint32).reshape(-1, LANES)
    hist = rk.tile_histograms(keys2d, shift, cfg, impl="reference")
    offsets = rk.global_offsets(hist)
    bk, bi = bucketize_tiles(keys2d, idx2d, shift, cfg, impl="reference")
    ok, oi, overflow = sck.scatter_runs(
        bk, bi, hist, offsets, cfg, window_rows=window_rows, impl=impl
    )
    return (
        np.asarray(ok).reshape(-1),
        np.asarray(oi).reshape(-1),
        bool(overflow),
    )


def _keysets(rng, n):
    return {
        "uniform": rng.integers(0, 2**32, n, dtype=np.uint32),
        "lowbits": rng.integers(0, 16, n, dtype=np.uint32),
        "clustered": (rng.integers(0, 3, n, dtype=np.uint32) * 5),
        "permutation": rng.permutation(n).astype(np.uint32),
    }


class TestPlanWindows:
    def test_plan_fields(self):
        cfg = EngineConfig(radix_bits=2)
        # Two tiles, radix 4, hand-checkable counts.
        hist = np.zeros((2, LANES), np.int32)
        hist[0, :4] = [100, 500, 300, 124]
        hist[1, :4] = [0, 1024, 0, 0]
        hist_j = jnp.asarray(hist)
        offsets = rk.global_offsets(hist_j)
        off_b, src_b, cnt_b, overflow = sck.plan_windows(
            hist_j, offsets, cfg.tile_rows, 4, window_rows=8
        )
        # Blocked SMEM layout: step g lives at flat position g.
        off = np.asarray(off_b).reshape(-1)
        src = np.asarray(src_b).reshape(-1)
        cnt = np.asarray(cnt_b).reshape(-1)
        assert not bool(overflow)
        # Step order is (r-outer, t-inner): g = r*T + t, T=2.
        assert off[0] == 0 and src[0] == 0
        # bucket 1 / tile 1: global off = 100 (b0 total) + 500 (b1 tile0);
        # src = tile_base + local_off = 1024 + 0.
        g = 1 * 2 + 1
        assert off[g] == 600
        assert src[g] == 1024
        # Counts are exactly the per-step run lengths in step order, and
        # offsets telescope over them (the streaming-frontier invariant).
        want_cnt = hist[:, :4].T.reshape(-1)
        np.testing.assert_array_equal(cnt[: want_cnt.size], want_cnt)
        np.testing.assert_array_equal(
            off[1 : want_cnt.size], (np.cumsum(want_cnt))[:-1]
        )

    def test_overflow_flag(self):
        cfg = EngineConfig()
        hist = np.zeros((1, LANES), np.int32)
        hist[0, 3] = cfg.tile  # one run of a whole tile
        hist_j = jnp.asarray(hist)
        offsets = rk.global_offsets(hist_j)
        _, _, _, overflow = sck.plan_windows(
            hist_j, offsets, cfg.tile_rows, cfg.radix, window_rows=2
        )
        assert bool(overflow)


class TestScatterReference:
    @pytest.mark.parametrize("name", ["uniform", "lowbits", "permutation"])
    @pytest.mark.parametrize("shift", [0, 28])
    def test_vs_stable_argsort(self, rng, name, shift):
        cfg = EngineConfig()
        n = 4 * cfg.block
        keys = _keysets(rng, n)[name]
        ok, oi, overflow = _pipeline(keys, shift, cfg, impl="reference",
                                     window_rows=cfg.tile_rows)
        want_k, want_i = _digit_sorted_oracle(
            keys, np.arange(n, dtype=np.uint32), shift, cfg.radix
        )
        assert not overflow
        np.testing.assert_array_equal(ok, want_k)
        np.testing.assert_array_equal(oi, want_i)


class TestScatterInterpret:
    """Exact kernel body (interpret mode) vs the jnp reference."""

    @pytest.mark.parametrize("name", ["uniform", "lowbits", "clustered"])
    def test_parity_multi_step(self, rng, name):
        cfg = EngineConfig(radix_bits=2)  # R=4 keeps interpret fast
        n = 2 * cfg.block  # 16 tiles -> grid (4, 16): 64 steps
        keys = _keysets(rng, n)[name]
        got_k, got_i, ov_k = _pipeline(
            keys, 0, cfg, impl="interpret", window_rows=cfg.tile_rows
        )
        ref_k, ref_i, ov_r = _pipeline(
            keys, 0, cfg, impl="reference", window_rows=cfg.tile_rows
        )
        assert ov_k == ov_r
        if not ov_k:
            np.testing.assert_array_equal(got_k, ref_k)
            np.testing.assert_array_equal(got_i, ref_i)

    def test_small_window_with_skew_overflow(self, rng):
        cfg = EngineConfig(radix_bits=2)
        n = cfg.block
        keys = np.zeros(n, np.uint32)  # all-equal: every run = whole tile
        _, _, overflow = _pipeline(
            keys, 0, cfg, impl="interpret", window_rows=2
        )
        assert overflow  # output garbage is allowed; flag must be set

    def test_window_exact_boundary_cases(self, rng):
        # Runs that exactly fill / exactly cross row boundaries.
        cfg = EngineConfig(radix_bits=1)  # R=2
        n = cfg.block
        keys = np.zeros(n, np.uint32)
        keys[: n // 2] = 1  # first half digit 1, second half digit 0
        got_k, got_i, ov = _pipeline(
            keys, 0, cfg, impl="interpret", window_rows=cfg.tile_rows
        )
        ref_k, ref_i, _ = _pipeline(
            keys, 0, cfg, impl="reference", window_rows=cfg.tile_rows
        )
        assert not ov
        np.testing.assert_array_equal(got_k, ref_k)
        np.testing.assert_array_equal(got_i, ref_i)
