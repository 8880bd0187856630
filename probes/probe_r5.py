"""Round-5 probe: decide the fused-pass design with real numbers.

Groups (each guarded; writes probes/results_r5.json incrementally):
  0. device sanity + per-op floor (marginal cost of one chained HLO)
  1. int16 VPU rate vs int32 (in one pallas kernel)
  2. MXU matmul rate f32 / bf16 (in one pallas kernel)
  3. dynamic roll (lane/sublane), dyn-row extract, switch-DMA (window writer)
  4. grid-step overhead (many-step trivial kernel)
  5. batched lax.sort per-elem cost (segmented-sort alternatives)

Timing: chain K ops inside one jit, readback sync; marginal cost =
(t(K2) - t(K1)) / (K2 - K1) removes the dispatch+fixed floor.
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

RESULTS = {}
OUT = "/root/repo/probes/results_r5.json"


def save():
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1, default=str)


def record(name, **kw):
    RESULTS[name] = {k: (round(v, 2) if isinstance(v, float) else v)
                     for k, v in kw.items() if v is not None}
    print(f"[probe] {name}: {RESULTS[name]}", flush=True)
    save()


def guard(name, fn):
    t0 = time.perf_counter()
    try:
        out = fn()
        out = out or {}
        out.setdefault("wall_s", time.perf_counter() - t0)
        record(name, **out)
    except Exception as e:  # noqa: BLE001
        traceback.print_exc()
        record(name, err=str(e)[:300])


def timeit(f, *args, reps=3):
    """Median wall seconds per call of f(*args), readback-synced."""
    r = f(*args)
    _ = np.asarray(jax.tree.leaves(r)[0].reshape(-1)[:1])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = f(*args)
        _ = np.asarray(jax.tree.leaves(r)[0].reshape(-1)[:1])
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


# ---------------------------------------------------------------- 0. floor
def op_floor():
    n = 1 << 20
    x = jnp.arange(n, dtype=jnp.uint32)

    def make(k):
        @jax.jit
        def f(x):
            for i in range(k):
                # distinct constants so XLA cannot fold the chain
                x = (x ^ jnp.uint32(0x9E3779B9 + i)) + jnp.uint32(i)
            return x
        return f

    t1 = timeit(make(4), x)
    t2 = timeit(make(64), x)
    marg = (t2 - t1) / 60
    return {"t4_ms": t1 * 1e3, "t64_ms": t2 * 1e3,
            "marginal_us_per_op_1M": marg * 1e6,
            "dispatch_floor_ms": (t1 - 4 * marg) * 1e3}


guard("per-op floor (fused xor-add chain 1M)", op_floor)


# ------------------------------------------------------- 1. VPU int16/int32
def vpu_rate(dtype, rows):
    n = 1 << 20
    ops = 192

    def kern(x_ref, o_ref):
        v = x_ref[:]
        for i in range(ops):
            v = v + jnp.asarray(i | 1, dtype)
            v = v ^ jnp.asarray(i, dtype)
        o_ref[:] = v

    shape = (n // 128, 128)
    spec = pl.BlockSpec((rows, 128), lambda t: (t, 0), memory_space=pltpu.VMEM)

    @jax.jit
    def f(x):
        return pl.pallas_call(
            kern, grid=(shape[0] // rows,), in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(shape, dtype))(x)

    # also a 0-op copy with identical structure for the marginal
    def kern0(x_ref, o_ref):
        o_ref[:] = x_ref[:]

    @jax.jit
    def f0(x):
        return pl.pallas_call(
            kern0, grid=(shape[0] // rows,), in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(shape, dtype))(x)

    x = jnp.ones(shape, dtype)
    t = timeit(f, x)
    t0_ = timeit(f0, x)
    per_op = (t - t0_) / (2 * ops)
    return {"t_ms": t * 1e3, "copy_ms": t0_ * 1e3,
            "us_per_op_1M": per_op * 1e6,
            "Tops": n / per_op / 1e12 if per_op > 0 else None}


guard("vpu int32 rate", lambda: vpu_rate(jnp.int32, 8))
guard("vpu int16 rate", lambda: vpu_rate(jnp.int16, 16))


# ------------------------------------------------------------------ 2. MXU
def mxu_rate(dtype, m, k_, n_, chain=32):
    def kern(a_ref, b_ref, o_ref):
        acc = jnp.zeros((m, n_), jnp.float32)
        a = a_ref[:]
        b = b_ref[:]
        for _ in range(chain):
            acc = acc + jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            a = a + jnp.asarray(1, dtype)  # prevent hoisting
        o_ref[:] = acc

    @jax.jit
    def f(a, b):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, n_), jnp.float32))(a, b)

    a = jnp.ones((m, k_), dtype)
    b = jnp.ones((k_, n_), dtype)
    t = timeit(f, a, b)
    macs = m * k_ * n_ * chain
    return {"t_ms": t * 1e3, "TMAC_per_s": macs / t / 1e12}


guard("mxu f32 512x512x512 x32", lambda: mxu_rate(jnp.float32, 512, 512, 512))
guard("mxu bf16 512x512x512 x32", lambda: mxu_rate(jnp.bfloat16, 512, 512, 512))
guard("mxu f32 128x128x128 x32", lambda: mxu_rate(jnp.float32, 128, 128, 128))


# --------------------------------------------- 3. window-writer primitives
def dyn_roll(axis):
    def kern(s_ref, x_ref, out):
        out[:] = pltpu.roll(x_ref[:], s_ref[0], axis)

    rng = np.random.default_rng(0)
    x = rng.integers(0, 2**31, (8, 128), np.int32)
    shift = 37 if axis == 1 else 3
    got = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec((8, 128), lambda t, s: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda t, s: (0, 0),
                                   memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
    )(jnp.array([shift], jnp.int32), jnp.asarray(x))
    ok = np.array_equal(np.asarray(got), np.roll(x, shift, axis))
    return {"ok": bool(ok)}


guard("dyn lane roll", lambda: dyn_roll(1))
guard("dyn sublane roll", lambda: dyn_roll(0))


def dyn_row_extract():
    def kern(s_ref, x_ref, out, scratch):
        scratch[:] = x_ref[:]
        out[:] = scratch[pl.ds(s_ref[0], 1), :]

    rng = np.random.default_rng(1)
    x = rng.integers(0, 2**31, (8, 128), np.int32)
    got = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec((8, 128), lambda t, s: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 128), lambda t, s: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32)]),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
    )(jnp.array([5], jnp.int32), jnp.asarray(x))
    return {"ok": bool(np.array_equal(np.asarray(got)[0], x[5]))}


guard("dyn-row extract from scratch", dyn_row_extract)


def switch_write():
    ROWS = 16

    def kern(meta_ref, x_ref, out, sem):
        t = pl.program_id(0)
        dst = meta_ref[2 * t]
        fr = meta_ref[2 * t + 1]

        def mk(nrows):
            def go(_):
                cp = pltpu.make_async_copy(
                    x_ref.at[pl.ds(0, nrows), :],
                    out.at[pl.ds(dst, nrows), :], sem)
                cp.start()
                cp.wait()
                return 0
            return go

        jax.lax.switch(fr, [lambda _: 0, mk(1), mk(2)], 0)

    rng = np.random.default_rng(2)
    x = rng.integers(0, 2**31, (4 * 4, 128), np.int32)
    meta = np.array([0, 1, 1, 0, 1, 2, 3, 1], np.int32)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(4,),
            in_specs=[pl.BlockSpec((4, 128), lambda t, m: (t, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA(())]),
        out_shape=jax.ShapeDtypeStruct((ROWS, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(jnp.asarray(meta), jnp.asarray(x))
    o = np.asarray(out)
    xs = x.reshape(4, 4, 128)
    ok = (np.array_equal(o[0], xs[0][0]) and np.array_equal(o[1:3], xs[2][:2])
          and np.array_equal(o[3], xs[3][0]))
    return {"ok": bool(ok)}


guard("switch-sized row writes", switch_write)


# --------------------------------------------------- 4. grid-step overhead
def grid_overhead():
    G = 16384

    def kern(x_ref, out):
        out[0, 0] = x_ref[0, 0] + pl.program_id(0)

    spec = pl.BlockSpec((1, 1), lambda t: (0, 0), memory_space=pltpu.SMEM)

    @jax.jit
    def f(x):
        return pl.pallas_call(
            kern, grid=(G,), in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)))(x)

    t = timeit(f, jnp.zeros((1, 1), jnp.int32))
    return {"t_ms": t * 1e3, "ns_per_step": t / G * 1e9}


guard("grid-step overhead 16K steps", grid_overhead)


# ------------------------------------------------- 5. batched lax.sort cost
def batched_sort(segs, seglen):
    rng = np.random.default_rng(3)
    k = jnp.asarray(rng.integers(0, 2**32, (segs, seglen), np.uint32))
    v = jnp.asarray(rng.integers(0, 2**32, (segs, seglen), np.uint32))

    @jax.jit
    def f(k, v):
        s, p = jax.lax.sort((k, v), dimension=1, num_keys=1, is_stable=True)
        return s ^ jnp.uint32(1), p

    t = timeit(f, k, v)
    n = segs * seglen
    return {"t_ms": t * 1e3, "us_per_M_elem": t / n * 1e6 * 1e6,
            "M_elem_per_s": n / t / 1e6}


guard("batched stable sort 64x64K pairs", lambda: batched_sort(64, 1 << 16))
guard("batched stable sort 1024x4K pairs", lambda: batched_sort(1024, 1 << 12))
guard("batched stable sort 16x1M pairs", lambda: batched_sort(16, 1 << 20))

print("\nFINAL:", json.dumps(RESULTS, indent=1, default=str), flush=True)
save()
