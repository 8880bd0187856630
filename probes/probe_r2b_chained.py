"""Round-2 probes, take 2: chain K ops inside ONE jit to amortize the
~4-8 ms per-dispatch tunnel overhead (same protocol as bench.py).

Reports per-op device time = (t_chain - t_null) / K.
"""

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

K = 16
R = {}


def chain_bench(make_body, x0, k=K, reps=3, name="", n=None):
    """make_body(x) -> x, chained k times in one jit."""

    @jax.jit
    def step(x):
        for _ in range(k):
            x = make_body(x)
        return x

    t = bench_chain(step, x0, reps=reps, warmup=1) / k
    line = f"{name}: {t*1e6:.0f} us"
    if n:
        line += f"  ({n/t/1e6:.0f} M elem/s, {n*8/t/1e9:.1f} GB/s r+w)"
    print(line, flush=True)
    R[name] = t
    return t


def rand_keys(n, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))


# Null chain: measures per-iteration overhead of the chain itself.
chain_bench(lambda x: remix_keys(x), rand_keys(1 << 20), name="null remix 1M",
            n=1 << 20)

# 1. lax.sort pairs
def sort_body(k):
    idx = jax.lax.iota(jnp.uint32, k.shape[0])
    s, i = jax.lax.sort((k, idx), num_keys=1, is_stable=True)
    return remix_keys(s) ^ i


for n in (1 << 20, 4 << 20, 16 << 20):
    chain_bench(sort_body, rand_keys(n), name=f"lax.sort pairs {n>>20}M", n=n)

# 2. XLA random 1D gather
for n in (1 << 20, 16 << 20):
    rng = np.random.default_rng(1)
    idx = jnp.asarray(rng.permutation(n).astype(np.int32))

    def take_body(carry, idx=idx):
        vals = carry
        out = jnp.take(vals, idx, axis=0, mode="clip", unique_indices=True)
        return remix_keys(out)

    chain_bench(take_body, rand_keys(n), name=f"take 1D random {n>>20}M", n=n)

# 3. Pallas chunk-gather, scalar-prefetched index_map
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

    def run(srcmap, x2d):
        return pl.pallas_call(
            lambda m_ref, i_ref, o_ref: o_ref.__setitem__(
                slice(None), i_ref[:]),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_rows, LANES), x2d.dtype),
        )(srcmap, x2d)

    return run


for n, brows in ((1 << 20, 8), (16 << 20, 8), (16 << 20, 32)):
    n_rows = n // LANES
    nblocks = n_rows // brows
    rng = np.random.default_rng(2)
    srcmap = jnp.asarray(rng.permutation(nblocks).astype(np.int32))
    run = make_chunk_gather(n_rows, brows)

    def cg_body(x2d, run=run, srcmap=srcmap):
        return remix_keys(run(srcmap, x2d))

    chain_bench(cg_body, rand_keys(n).reshape(n_rows, LANES),
                name=f"pallas chunk-gather {n>>20}M q={brows*128}", n=n)

# 3b. chunk-gather on TWO arrays at once (key+idx analog)
n = 16 << 20
n_rows = n // LANES
brows = 8
nblocks = n_rows // brows
srcmap = jnp.asarray(np.random.default_rng(3).permutation(nblocks).astype(np.int32))
grid_spec2 = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=1,
    grid=(nblocks,),
    in_specs=[
        pl.BlockSpec((brows, LANES), lambda c, m: (m[c], 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((brows, LANES), lambda c, m: (m[c], 0), memory_space=pltpu.VMEM),
    ],
    out_specs=[
        pl.BlockSpec((brows, LANES), lambda c, m: (c, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((brows, LANES), lambda c, m: (c, 0), memory_space=pltpu.VMEM),
    ],
)


def run2(srcmap, a, b):
    def kern(m_ref, a_ref, b_ref, oa_ref, ob_ref):
        oa_ref[:] = a_ref[:]
        ob_ref[:] = b_ref[:]

    return pl.pallas_call(
        kern, grid_spec=grid_spec2,
        out_shape=[jax.ShapeDtypeStruct((n_rows, LANES), jnp.uint32)] * 2,
    )(srcmap, a, b)


def cg2_body(carry):
    a, b = carry
    oa, ob = run2(srcmap, a, b)
    return remix_keys(oa), ob


chain_bench(cg2_body, (rand_keys(n).reshape(n_rows, LANES),
                       rand_keys(n, 5).reshape(n_rows, LANES)),
            name="pallas chunk-gather 2arr 16M q=1024", n=n)

# 4. current kernels
cfg = EngineConfig()
for n in (1 << 20, 16 << 20):
    k2d0 = rand_keys(n).reshape(-1, LANES)

    def hist_body(k2d):
        h = rk.tile_histograms(k2d, 0, cfg)
        return k2d ^ h[:1, :1].astype(jnp.uint32)

    chain_bench(hist_body, k2d0, name=f"hist kernel {n>>20}M R=16", n=n)

n = 1 << 20
k2d0 = rand_keys(n).reshape(-1, LANES)
off = rk.global_offsets(rk.tile_histograms(k2d0, 0, cfg))


def dest_body(k2d):
    d = rk.tile_destinations(k2d, off, 0, cfg)
    return k2d ^ d.astype(jnp.uint32)


chain_bench(dest_body, k2d0, name="dest kernel 1M R=16", n=n)

idx2d = jnp.arange(n, dtype=jnp.uint32).reshape(-1, LANES)


def buck_body(carry):
    k2d, i2d = carry
    ok, oi = bk.bucketize_tiles(k2d, i2d, 0, cfg)
    return remix_keys(ok), oi


chain_bench(buck_body, (k2d0, idx2d), name="bucketize 1M R=16 rows=8", n=n)

# 5. host-side offsets
hist0 = rk.tile_histograms(k2d0, 0, cfg)
chain_bench(lambda h: rk.global_offsets(h) + h, hist0, name="global_offsets (1024,128)")

print("\nJSON:", {k: round(v * 1e6, 1) for k, v in R.items()}, flush=True)
