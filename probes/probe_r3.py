"""Round-3 probe: re-measure the round-2 numbers AND the new Mosaic
capabilities the fused-scatter kernel design depends on.  Results are
WRITTEN TO probes/results_r3.json (round 2 lost its numbers to stdout —
VERDICT item 2).

Groups:
  A. anchors: lax.sort pairs, XLA take (element / row granularity)
  B. existing kernels: hist / dest / bucketize / scan
  C. aligned pallas chunk-gather (scalar-prefetched index_map)
  D. NEW: in-kernel DMA with dynamic *unaligned* 1-D offsets (HBM->HBM)
  E. NEW: DMA issue-rate (many small DMAs per pass)
  F. NEW: misc lowering checks (dynamic roll amount, sublane gather at
     64 rows, masked store)

Timing protocol: chain K ops in one jit + readback sync (utils/timing.py);
per-op time = t_chain/K.  The null-remix baseline is reported for manual
subtraction (per-iteration chain overhead ~ 1 extra remix of the array).
"""

import json
import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from gpuradixsort_tpu.config import EngineConfig, LANES
from gpuradixsort_tpu.kernels import radix as rk
from gpuradixsort_tpu.kernels import bucketize as bk
from gpuradixsort_tpu.kernels import scan as sk
from gpuradixsort_tpu.utils.timing import bench_chain, remix_keys

K = 16
RESULTS = {"_meta": {"backend": None, "device": None}}
OUT_PATH = "/root/repo/probes/results_r3.json"


def save():
    with open(OUT_PATH, "w") as f:
        json.dump(RESULTS, f, indent=1, default=str)


def record(name, seconds=None, n=None, ok=None, err=None):
    entry = {}
    if seconds is not None:
        entry["us"] = round(seconds * 1e6, 1)
        if n:
            entry["M_elem_per_s"] = round(n / seconds / 1e6)
            entry["GB_per_s_rw"] = round(n * 8 / seconds / 1e9, 1)
    if ok is not None:
        entry["ok"] = bool(ok)
    if err is not None:
        entry["err"] = str(err)[:500]
    RESULTS[name] = entry
    print(f"{name}: {entry}", flush=True)
    save()


def chain_bench(make_body, x0, k=K, reps=3, name="", n=None):
    try:
        @jax.jit
        def step(x):
            for _ in range(k):
                x = make_body(x)
            return x

        t = bench_chain(step, x0, reps=reps, warmup=1) / k
        record(name, t, n)
        return t
    except Exception as e:  # noqa: BLE001
        traceback.print_exc()
        record(name, err=e)
        return None


def rand_keys(n, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))


RESULTS["_meta"]["backend"] = jax.default_backend()
RESULTS["_meta"]["device"] = str(jax.devices()[0])
save()

# ---------------------------------------------------------------- A. anchors
chain_bench(lambda x: remix_keys(x), rand_keys(1 << 20),
            name="null remix 1M", n=1 << 20)


def sort_body(kk):
    idx = jax.lax.iota(jnp.uint32, kk.shape[0])
    s, i = jax.lax.sort((kk, idx), num_keys=1, is_stable=True)
    return remix_keys(s) ^ i


for n in (1 << 20, 4 << 20, 16 << 20, 64 << 20):
    chain_bench(sort_body, rand_keys(n), k=K if n <= (4 << 20) else 4,
                name=f"lax.sort pairs {n>>20}M", n=n)

# element-granular random gather
for n in (1 << 20, 16 << 20):
    rng = np.random.default_rng(1)
    idx = jnp.asarray(rng.permutation(n).astype(np.int32))

    def take_body(vals, idx=idx):
        out = jnp.take(vals, idx, axis=0, mode="clip", unique_indices=True)
        return remix_keys(out)

    chain_bench(take_body, rand_keys(n), name=f"take elem random {n>>20}M", n=n)

# row-granular gather: take rows of (n/128, 128)
for n in (16 << 20,):
    rows = n // LANES
    rng = np.random.default_rng(2)
    ridx = jnp.asarray(rng.permutation(rows).astype(np.int32))

    def takerow_body(x2d, ridx=ridx):
        out = jnp.take(x2d, ridx, axis=0, mode="clip", unique_indices=True)
        return remix_keys(out)

    chain_bench(takerow_body, rand_keys(n).reshape(rows, LANES),
                name=f"take row(128) random {n>>20}M", n=n)

# ------------------------------------------------------- B. existing kernels
cfg = EngineConfig()
for n in (1 << 20, 16 << 20):
    k2d0 = rand_keys(n).reshape(-1, LANES)

    def hist_body(k2d):
        h = rk.tile_histograms(k2d, 0, cfg)
        return k2d ^ h[:1, :1].astype(jnp.uint32)

    chain_bench(hist_body, k2d0, name=f"hist {n>>20}M R=16", n=n)

n = 1 << 20
k2d0 = rand_keys(n).reshape(-1, LANES)
off0 = rk.global_offsets(rk.tile_histograms(k2d0, 0, cfg))


def dest_body(k2d):
    d = rk.tile_destinations(k2d, off0, 0, cfg)
    return k2d ^ d.astype(jnp.uint32)


chain_bench(dest_body, k2d0, name="dest 1M R=16", n=n)

idx2d0 = jnp.arange(n, dtype=jnp.uint32).reshape(-1, LANES)


def buck_body(carry):
    k2d, i2d = carry
    ok, oi = bk.bucketize_tiles(k2d, i2d, 0, cfg)
    return remix_keys(ok), oi


chain_bench(buck_body, (k2d0, idx2d0), name="bucketize 1M R=16 rows=8", n=n)


def scan_body(x):
    s, tot = sk.exclusive_scan(x.astype(jnp.int32) & 1, cfg)
    return remix_keys(x) ^ s.astype(jnp.uint32)


chain_bench(scan_body, rand_keys(n), name="pallas scan 1M", n=n)


def jnp_scan_body(x):
    s = jnp.cumsum(x.astype(jnp.int32) & 1)
    return remix_keys(x) ^ s.astype(jnp.uint32)


chain_bench(jnp_scan_body, rand_keys(n), name="jnp cumsum 1M", n=n)

# --------------------------------------- C. aligned chunk gather (8/32 rows)
def make_chunk_gather(n_rows, block_rows):
    nblocks = n_rows // block_rows
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((block_rows, LANES), lambda c, m: (m[c], 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block_rows, LANES), lambda c, m: (c, 0),
                               memory_space=pltpu.VMEM),
    )

    def run(srcmap, x2d):
        return pl.pallas_call(
            lambda m_ref, i_ref, o_ref: o_ref.__setitem__(slice(None), i_ref[:]),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_rows, LANES), x2d.dtype),
        )(srcmap, x2d)

    return run


for n, brows in ((16 << 20, 8), (16 << 20, 32)):
    n_rows = n // LANES
    nblocks = n_rows // brows
    srcmap = jnp.asarray(
        np.random.default_rng(3).permutation(nblocks).astype(np.int32))
    run = make_chunk_gather(n_rows, brows)

    def cg_body(x2d, run=run, srcmap=srcmap):
        return remix_keys(run(srcmap, x2d))

    chain_bench(cg_body, rand_keys(n).reshape(n_rows, LANES),
                name=f"pallas chunk-gather {n>>20}M q={brows*128}", n=n)

# --------------------- D. dynamic UNALIGNED 1-D DMA inside a kernel (crux!)
def make_unaligned_copier(n, w, nchunks, space):
    """grid (nchunks,): DMA src[off[2i] : +w] -> dst[off[2i+1] : +w]."""

    def kern(off_ref, src, dst, sem):
        i = pl.program_id(0)
        s = off_ref[2 * i]
        d = off_ref[2 * i + 1]
        pltpu.make_async_copy(src.at[pl.ds(s, w)], dst.at[pl.ds(d, w)], sem
                              ).start()
        pltpu.make_async_copy(src.at[pl.ds(s, w)], dst.at[pl.ds(d, w)], sem
                              ).wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchunks,),
        in_specs=[pl.BlockSpec(memory_space=space)],
        out_specs=pl.BlockSpec(memory_space=space),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )

    def run(off, src):
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n,), src.dtype),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(off, src)

    return run


def test_unaligned_dma(space, label):
    n, w, nchunks = 1 << 16, 512, 64
    rng = np.random.default_rng(7)
    # random unaligned src/dst offsets; dsts non-overlapping (chunked dense)
    dst = np.arange(nchunks, dtype=np.int32) * w
    src = rng.integers(0, n - w, size=nchunks, dtype=np.int32)
    # make some odd/unaligned on purpose
    src = (src | 1).astype(np.int32)
    off = np.empty(2 * nchunks, np.int32)
    off[0::2] = src
    off[1::2] = dst
    x = rand_keys(n)
    run = make_unaligned_copier(n, w, nchunks, space)
    out = np.asarray(jax.jit(run)(jnp.asarray(off), x))
    want = np.empty(n, np.uint32)
    want[:] = 0
    xs = np.asarray(x)
    for i in range(nchunks):
        want[dst[i]:dst[i] + w] = xs[src[i]:src[i] + w]
    ok = bool(np.array_equal(out[: nchunks * w], want[: nchunks * w]))
    record(f"unaligned 1D DMA {label} correctness", ok=ok)
    return run


for space, label in ((pltpu.ANY, "ANY"),):
    try:
        run = test_unaligned_dma(space, label)
    except Exception as e:  # noqa: BLE001
        traceback.print_exc()
        record(f"unaligned 1D DMA {label} correctness", err=e)
        run = None

# E. DMA issue rate at several chunk widths (HBM->HBM via ANY)
if run is not None:
    for w, nch in ((256, 4096), (1024, 1024), (4096, 256), (16384, 64)):
        n = w * nch
        rng = np.random.default_rng(8)
        src = ((rng.permutation(nch).astype(np.int32)) * w + 1) % (n - w)
        dst = np.arange(nch, dtype=np.int32) * w
        off = np.empty(2 * nch, np.int32)
        off[0::2] = src
        off[1::2] = dst
        offj = jnp.asarray(off)
        try:
            runner = make_unaligned_copier(n, w, nch, pltpu.ANY)

            def dma_body(x, runner=runner, offj=offj):
                return remix_keys(runner(offj, x))

            chain_bench(dma_body, rand_keys(n), k=8,
                        name=f"unaligned DMA w={w} x{nch}", n=n)
        except Exception as e:  # noqa: BLE001
            traceback.print_exc()
            record(f"unaligned DMA w={w} x{nch}", err=e)

# --------------------------------------------- F. misc lowering capabilities
# F1. dynamic roll amount (traced scalar shift)
try:
    def droll_kernel(amt_ref, x_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], amt_ref[0], 1)

    x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    out = pl.pallas_call(
        droll_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec((8, 128), lambda i, a: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda i, a: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
    )(jnp.asarray([5], jnp.int32), x)
    ok = bool(np.array_equal(np.asarray(out), np.roll(np.asarray(x), 5, 1)))
    record("dynamic roll amount", ok=ok)
except Exception as e:  # noqa: BLE001
    traceback.print_exc()
    record("dynamic roll amount", err=e)

# F2. sublane take_along_axis with 64 rows
try:
    def subgather_kernel(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)

    rows = 64
    x = jnp.arange(rows * 128, dtype=jnp.int32).reshape(rows, 128)
    idx = jnp.asarray(
        np.random.default_rng(9).integers(0, rows, (rows, 128)), jnp.int32)
    out = pl.pallas_call(
        subgather_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int32),
    )(x, idx)
    want = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=0)
    record("sublane take_along 64rows", ok=bool(np.array_equal(out, want)))
except Exception as e:  # noqa: BLE001
    traceback.print_exc()
    record("sublane take_along 64rows", err=e)

# F3. dynamic-start sublane slice read+write within VMEM block
try:
    def dynslice_kernel(amt_ref, x_ref, o_ref):
        a = amt_ref[0]
        o_ref[pl.ds(a, 8), :] = x_ref[pl.ds(a, 8), :] + 1

    x = jnp.arange(64 * 128, dtype=jnp.int32).reshape(64, 128)
    out = pl.pallas_call(
        lambda a_ref, x_ref, o_ref: (
            o_ref.__setitem__(slice(None), x_ref[:]),
            dynslice_kernel(a_ref, x_ref, o_ref),
        )[0],
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec((64, 128), lambda i, a: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((64, 128), lambda i, a: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.int32),
    )(jnp.asarray([3], jnp.int32), x)
    want = np.asarray(x).copy()
    want[3:11] += 1
    record("dyn sublane RMW", ok=bool(np.array_equal(out, want)))
except Exception as e:  # noqa: BLE001
    traceback.print_exc()
    record("dyn sublane RMW", err=e)

print("\nFINAL:", json.dumps(RESULTS, indent=1, default=str), flush=True)
save()
