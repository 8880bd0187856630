"""Round-2 primitive cost probes on the real TPU (v5e via axon tunnel).

Measures the building blocks the fused-scatter design must choose between:
  1. jax.lax.sort of (u32 key, u32 idx) at 1M/4M/16M  — the bar to beat.
  2. XLA 1D random gather (jnp.take) throughput       — inverse-perm path.
  3. Pallas chunk-gather with scalar-prefetched index_map (q=1024 chunks)
     — the quantized-run scatter path's data-movement engine.
  4. Current Pallas kernels per pass at 1M: hist, dest, bucketize.
  5. Host-side (XLA) offsets/cumsum/searchsorted overhead.

Timing discipline: chained steps + readback sync (utils/timing.bench_chain)
to defeat tunnel memoization and non-syncing block_until_ready.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from gpuradixsort_tpu.config import EngineConfig, LANES
from gpuradixsort_tpu.kernels import radix as rk
from gpuradixsort_tpu.kernels import bucketize as bk
from gpuradixsort_tpu.utils.timing import bench_chain, remix_keys

R = {}


def report(name, secs, n=None):
    line = f"{name}: {secs*1e6:.0f} us"
    if n:
        line += f"  ({n/secs/1e6:.0f} M elem/s, {n*4/secs/1e9:.1f} GB/s rd)"
    print(line, flush=True)
    R[name] = secs


def rand_keys(n, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))


# ---------------------------------------------------------------- 1. lax.sort
@jax.jit
def sort_pairs_xla(keys):
    idx = jax.lax.iota(jnp.uint32, keys.shape[0])
    k, i = jax.lax.sort((keys, idx), num_keys=1, is_stable=True)
    return remix_keys(k) ^ i  # mix so the chain sees fresh keys


for n in (1 << 20, 4 << 20, 16 << 20):
    x = rand_keys(n)
    t = bench_chain(sort_pairs_xla, x, reps=4)
    report(f"lax.sort pairs n={n>>20}M", t, n)

# ------------------------------------------------------- 2. XLA random gather
@jax.jit
def take_step(carry):
    vals, idx = carry
    out = jnp.take(vals, idx, axis=0, mode="clip", unique_indices=True,
                   indices_are_sorted=False)
    return out, idx ^ jnp.uint32(1)  # vary idx cheaply (stays in range if even n)


for n in (1 << 20, 16 << 20):
    rng = np.random.default_rng(1)
    vals = rand_keys(n)
    idx = jnp.asarray(rng.permutation(n).astype(np.uint32))
    t = bench_chain(take_step, (vals, idx), reps=4)
    report(f"take 1D random n={n>>20}M", t, n)

# --------------------------------------- 3. Pallas chunk-gather (block q=8x128)
def chunk_gather_kernel(src_map_ref, in_ref, out_ref):
    out_ref[:] = in_ref[:]


def make_chunk_gather(n_rows, block_rows):
    nblocks = n_rows // block_rows
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((block_rows, LANES), lambda c, m: (m[c], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, LANES), lambda c, m: (c, 0),
                               memory_space=pltpu.VMEM),
    )
    @jax.jit
    def run(srcmap, x2d):
        return pl.pallas_call(
            chunk_gather_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_rows, LANES), x2d.dtype),
        )(srcmap, x2d)
    return run


for n, brows in ((1 << 20, 8), (16 << 20, 8), (16 << 20, 32)):
    n_rows = n // LANES
    nblocks = n_rows // brows
    rng = np.random.default_rng(2)
    srcmap = jnp.asarray(rng.permutation(nblocks).astype(np.int32))
    x2d = rand_keys(n).reshape(n_rows, LANES)
    run = make_chunk_gather(n_rows, brows)

    def step(carry, run=run):
        srcmap, x2d = carry
        out = run(srcmap, x2d)
        return srcmap, out

    t = bench_chain(step, (srcmap, x2d), reps=4)
    report(f"pallas chunk-gather n={n>>20}M q={brows*128}", t, n)

# ----------------------------------------------------- 4. current kernels @1M
cfg = EngineConfig()  # radix_bits=4, tile_rows=8
n = 1 << 20
keys2d = rand_keys(n).reshape(-1, LANES)


def hist_step(k2d):
    h = rk.tile_histograms(k2d, 0, cfg)
    return (k2d ^ h[:1, :1].astype(jnp.uint32))  # force dependency


t = bench_chain(jax.jit(hist_step), keys2d, reps=4)
report("hist kernel 1M R=16", t, n)

off = rk.global_offsets(rk.tile_histograms(keys2d, 0, cfg))


@jax.jit
def dest_step(k2d):
    d = rk.tile_destinations(k2d, off, 0, cfg)
    return k2d ^ d.astype(jnp.uint32)


t = bench_chain(dest_step, keys2d, reps=4)
report("dest kernel 1M R=16", t, n)

idx2d = jnp.arange(n, dtype=jnp.uint32).reshape(-1, LANES)


@jax.jit
def buck_step(carry):
    k2d, i2d = carry
    ok, oi = bk.bucketize_tiles(k2d, i2d, 0, cfg)
    return remix_keys(ok), oi


t = bench_chain(buck_step, (keys2d, idx2d), reps=4)
report("bucketize kernel 1M R=16 rows=8", t, n)

# -------------------------------------------- 5. host-side offsets etc. @1M
hist = rk.tile_histograms(keys2d, 0, cfg)


@jax.jit
def off_step(h):
    o = rk.global_offsets(h)
    return h + o


t = bench_chain(off_step, hist, reps=8)
report("global_offsets (1024,128)", t)

print("\nJSON:", {k: round(v * 1e6) for k, v in R.items()}, flush=True)
