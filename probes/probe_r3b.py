"""Round-3 probe B: VPU/MXU micro-rates to locate the bucketize floor.

Decides whether the fused radix path can beat lax.sort at all:
  1. raw VPU rate (chained dependent elementwise ops)
  2. bitonic-28 in-row sort, sortkey only (the irreducible local-sort core)
  3. lane-gather (take_along axis=1) rate
  4. pltpu.roll rate
  5. MXU one-hot row-permute (256x256 f32 @ 256x128)
  6. current bucketize tile kernel, for comparison (measured in probe_r3)

Writes probes/results_r3b.json.
"""

import json
import sys
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from gpuradixsort_tpu.config import LANES
from gpuradixsort_tpu.kernels.bucketize import _row_bitonic_sortkeys
from gpuradixsort_tpu.utils.timing import bench_chain, remix_keys

RESULTS = {}
OUT = "/root/repo/probes/results_r3b.json"
K = 16
N = 1 << 20  # 1M elems -> (8192, 128)
ROWS = N // LANES
BLOCK_ROWS = 256  # rows per grid step


def save():
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1, default=str)


def record(name, seconds=None, n=None, ok=None, err=None, extra=None):
    e = {}
    if seconds is not None:
        e["us"] = round(seconds * 1e6, 1)
        if n:
            e["ps_per_elem"] = round(seconds / n * 1e12, 1)
    if ok is not None:
        e["ok"] = bool(ok)
    if err is not None:
        e["err"] = str(err)[:300]
    if extra:
        e.update(extra)
    RESULTS[name] = e
    print(f"{name}: {e}", flush=True)
    save()


def chain_bench(body, x0, k=K, name="", n=None, extra=None):
    try:
        @jax.jit
        def step(x):
            for _ in range(k):
                x = body(x)
            return x

        t = bench_chain(step, x0, reps=3, warmup=1) / k
        record(name, t, n, extra=extra)
        return t
    except Exception as e:  # noqa: BLE001
        traceback.print_exc()
        record(name, err=e)
        return None


def tile_kernel(body):
    """Wrap an (BLOCK_ROWS, LANES) int32 -> int32 body as a gridded kernel."""

    def kern(x_ref, o_ref):
        o_ref[:] = body(x_ref[:])

    def run(x2d):
        return pl.pallas_call(
            kern,
            grid=(x2d.shape[0] // BLOCK_ROWS,),
            in_specs=[pl.BlockSpec((BLOCK_ROWS, LANES), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((BLOCK_ROWS, LANES), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x2d.shape, jnp.int32),
        )(x2d)

    return run


def rand_i32(n, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.integers(0, 2**31, size=n, dtype=np.int32)).reshape(-1, LANES)


x0 = rand_i32(N)

# 0. null (pure copy kernel) — per-elem floor of the harness + HBM r/w
chain_bench(lambda x: tile_kernel(lambda v: v)(x) ^ 1, x0,
            name="pallas copy 1M", n=N)

# 1. raw VPU rate: 256 dependent ops
NOPS = 256


def vpu_body(v):
    for i in range(NOPS // 2):
        v = (v + 1) ^ (i + 1)
    return v


t = chain_bench(lambda x: tile_kernel(vpu_body)(x), x0,
                name=f"vpu chain {NOPS}ops 1M", n=N)
if t:
    record("vpu_rate_Tops", extra={
        "Tops": round(NOPS * N / t / 1e12, 2)})

# 2. bitonic-28 sortkey-only
chain_bench(lambda x: tile_kernel(
    lambda v: _row_bitonic_sortkeys(v & 0x7FF))(x), x0,
    name="bitonic28 sortkey 1M", n=N)

# 3. lane-gather: 16 chained take_alongs
def gath_body(v):
    idx = v & (LANES - 1)
    for _ in range(16):
        v = jnp.take_along_axis(v, idx, axis=1) + 1
    return v


chain_bench(lambda x: tile_kernel(gath_body)(x), x0,
            name="lane take_along x16 1M", n=N, extra={"per_gather": True})

# 4. rolls x64
def roll_body(v):
    for i in range(64):
        v = pltpu.roll(v, 1 + (i % 7), 1) + 1
    return v


chain_bench(lambda x: tile_kernel(roll_body)(x), x0,
            name="lane roll x64 1M", n=N)

# 5. MXU one-hot row permute: (256,256) f32 @ (256,128)
def mxu_body(v):
    perm = (v[0:2, :] & 255)  # pseudo row-permutation indices (2,128)
    pidx = jnp.concatenate([perm & 255, perm & 255], axis=0)  # whatever
    rows = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_ROWS, BLOCK_ROWS), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_ROWS, BLOCK_ROWS), 1)
    onehot = ((rows + (v[0, 0] & 3)) % BLOCK_ROWS == cols).astype(jnp.float32)
    lo = (v & 0xFFFF).astype(jnp.float32)
    hi = ((v >> 16) & 0x7FFF).astype(jnp.float32)
    plo = jnp.dot(onehot, lo, preferred_element_type=jnp.float32)
    phi = jnp.dot(onehot, hi, preferred_element_type=jnp.float32)
    return (phi.astype(jnp.int32) << 16) | plo.astype(jnp.int32)


chain_bench(lambda x: tile_kernel(mxu_body)(x), x0,
            name="mxu onehot row-permute 1M", n=N)

# 6. sublane dynamic-start slice copy loop (for window assembly):
#    per grid step, 32 dynamic-slice row copies of 8 rows each
def make_dynslice_kernel():
    def kern(off_ref, x_ref, o_ref):
        o_ref[:] = x_ref[:]
        for i in range(32):
            s = off_ref[i]
            o_ref[pl.ds(s, 8), :] = x_ref[pl.ds(s, 8), :] + 1

    def run(off, x2d):
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(x2d.shape[0] // BLOCK_ROWS,),
                in_specs=[pl.BlockSpec((BLOCK_ROWS, LANES),
                                       lambda t, m: (t, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((BLOCK_ROWS, LANES),
                                       lambda t, m: (t, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct(x2d.shape, jnp.int32),
        )(off, x2d)

    return run


try:
    off = jnp.asarray(
        np.random.default_rng(5).integers(0, BLOCK_ROWS - 8, 32, np.int32))
    runds = make_dynslice_kernel()
    chain_bench(lambda x: runds(off, x) ^ 1, x0,
                name="dyn sublane slice x32/step 1M", n=N)
except Exception as e:  # noqa: BLE001
    record("dyn sublane slice x32/step 1M", err=e)

# 7. retry the two flaky compiles from probe_r3 (HTTP 500s)
def sub64_retry():
    def kern(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)

    rows = 64
    x = jnp.arange(rows * 128, dtype=jnp.int32).reshape(rows, 128)
    idx = jnp.asarray(
        np.random.default_rng(9).integers(0, rows, (rows, 128)), jnp.int32)
    out = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int32),
    )(x, idx)
    want = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=0)
    return bool(np.array_equal(out, want))


try:
    record("sublane take_along 64rows retry", ok=sub64_retry())
except Exception as e:  # noqa: BLE001
    traceback.print_exc()
    record("sublane take_along 64rows retry", err=e)


def unaligned_dma_retry():
    n, w, nchunks = 1 << 16, 512, 64

    def kern(off_ref, src, dst, sem):
        i = pl.program_id(0)
        s = off_ref[2 * i]
        d = off_ref[2 * i + 1]
        cp = pltpu.make_async_copy(src.at[pl.ds(s, w)], dst.at[pl.ds(d, w)],
                                   sem)
        cp.start()
        cp.wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchunks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )
    rng = np.random.default_rng(7)
    dst = np.arange(nchunks, dtype=np.int32) * w
    src = (rng.integers(0, n - w, size=nchunks, dtype=np.int32) | 1)
    off = np.empty(2 * nchunks, np.int32)
    off[0::2] = src
    off[1::2] = dst
    x = jnp.asarray(rng.integers(0, 2**32, n, np.uint32))
    out = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n,), x.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(jnp.asarray(off), x)
    out = np.asarray(out)
    xs = np.asarray(x)
    okall = all(
        np.array_equal(out[dst[i]:dst[i] + w], xs[src[i]:src[i] + w])
        for i in range(nchunks))
    return okall


try:
    record("unaligned 1D DMA retry", ok=unaligned_dma_retry())
except Exception as e:  # noqa: BLE001
    traceback.print_exc()
    record("unaligned 1D DMA retry", err=e)

print("\nFINAL:", json.dumps(RESULTS, indent=1, default=str), flush=True)
save()
