"""On-TPU correctness gate: every Pallas kernel in mosaic mode + full sorts.

The CPU test suite exercises kernel bodies in interpreter mode; this module
is the missing on-hardware gate (run it before benchmarking):

    python -m gpuradixsort_tpu.smoke

It runs each kernel compiled (mosaic) at multiple grid steps and full sorts
via every method against the shuffled-permutation oracle — the reference's
own verification regime (``ParallelSort.cpp:326-352``: readback + is-sorted
scan over a shuffled 0..N-1 permutation, ``main.cpp:120-125``).  Exits
non-zero on the first mismatch.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from gpuradixsort_tpu.config import (
    LANES,
    PAD_INDEX,
    PAD_KEY,
    EngineConfig,
)
from gpuradixsort_tpu.core.table import pad_to_tile
from gpuradixsort_tpu.kernels import radix as rk
from gpuradixsort_tpu.kernels import scan as sk
from gpuradixsort_tpu.kernels.bucketize import bucketize_tiles
from gpuradixsort_tpu.kernels.scatter import scatter_runs
from gpuradixsort_tpu.ops.sort import (
    _fused_sort_padded,
    _sort_padded,
    _xla_sort_padded,
)

FAILED = []


def check(name: str, ok: bool) -> None:
    print(f"[smoke] {'PASS' if ok else 'FAIL'}  {name}", flush=True)
    if not ok:
        FAILED.append(name)


def main() -> int:
    backend = jax.default_backend()
    print(f"[smoke] backend={backend} devices={jax.devices()}", flush=True)
    if backend != "tpu":
        print("[smoke] WARNING: not on TPU; kernels run via interpret/ref",
              flush=True)

    cfg = EngineConfig()
    rng = np.random.default_rng(20170101)
    # 4 grid steps for every kernel (block = tile * TILES_PER_STEP).
    n = 4 * cfg.block
    keys_np = rng.integers(0, 2**32, n, dtype=np.uint32)
    keys2d = jnp.asarray(keys_np).reshape(-1, LANES)
    idx2d = jnp.arange(n, dtype=jnp.uint32).reshape(-1, LANES)
    impl = "mosaic" if backend == "tpu" else "interpret"

    # 1. histogram kernel vs jnp reference
    h = rk.tile_histograms(keys2d, 0, cfg, impl=impl)
    h_ref = rk.tile_histograms(keys2d, 0, cfg, impl="reference")
    check("tile_histograms (4 steps)", np.array_equal(h, h_ref))

    # 2. destination-rank kernel
    off = rk.global_offsets(h_ref)
    d = rk.tile_destinations(keys2d, off, 0, cfg, impl=impl)
    d_ref = rk.tile_destinations(keys2d, off, 0, cfg, impl="reference")
    check("tile_destinations (4 steps)", np.array_equal(d, d_ref))

    # 3. prefix-scan kernel
    x = jnp.asarray(rng.integers(0, 100, n, dtype=np.int64).astype(np.int32))
    s, tot = sk.exclusive_scan(x, cfg, impl=impl)
    s_ref, tot_ref = sk.exclusive_scan(x, cfg, impl="reference")
    check("exclusive_scan", np.array_equal(s, s_ref) and int(tot) == int(tot_ref))

    # 4. bucketize kernel
    bk, bi = bucketize_tiles(keys2d, idx2d, 0, cfg, impl=impl)
    bk_r, bi_r = bucketize_tiles(keys2d, idx2d, 0, cfg, impl="reference")
    check("bucketize_tiles (4 steps)",
          np.array_equal(bk, bk_r) and np.array_equal(bi, bi_r))

    # 5. window-writer kernel (on the reference-bucketized input)
    ok_, oi_, ov = scatter_runs(bk_r, bi_r, h_ref, off, cfg, 2, impl=impl)
    ok_r, oi_r, _ = scatter_runs(bk_r, bi_r, h_ref, off, cfg, 2,
                                 impl="reference")
    check("scatter_runs (64+ steps)",
          (not bool(ov)) and np.array_equal(ok_, ok_r)
          and np.array_equal(oi_, oi_r))

    # 6. full sorts vs the shuffled-permutation oracle
    n2 = 1 << 20
    perm_np = rng.permutation(n2).astype(np.uint32)
    keys = pad_to_tile(jnp.asarray(perm_np), cfg, PAD_KEY)
    idx = pad_to_tile(jnp.arange(n2, dtype=jnp.uint32), cfg, PAD_INDEX)
    want = np.arange(n2, dtype=np.uint32)

    s, (p,) = _xla_sort_padded(keys, (idx,))
    check("sort 1M xla", np.array_equal(np.asarray(s)[:n2], want)
          and np.array_equal(np.asarray(p)[:n2], perm_np.argsort(kind="stable")))

    s, p, ov = _fused_sort_padded(keys, idx, cfg)
    check("sort 1M fused", (not bool(ov))
          and np.array_equal(np.asarray(s)[:n2], want))

    s, (p,) = _sort_padded(keys, (idx,), cfg, None, 1)
    check("sort 1M radix", np.array_equal(np.asarray(s)[:n2], want))

    if FAILED:
        print(f"[smoke] FAILED: {FAILED}", flush=True)
        return 1
    print("[smoke] all checks passed", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
