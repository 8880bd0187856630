"""Benchmark: stable (key, index) radix sort at 1M / 16M / 64M, + payload.

Mirrors the reference's headline workload — 1,048,576 padded uint32
key+index pairs sorted stably in 6,165 us (~170.1 M keys/s) on a 2017-era
GPU (``durations.txt:1``, ``Include/ComputeControllers/ParallelSort.h:39``)
— and extends it to BASELINE scale (16M/64M keys) and the 64-byte-payload
table sort (BASELINE config 2).

Prints ONE JSON line on stdout (the 1M headline).  Diagnostics to stderr:
per-method timings at every size, correctness verdicts for EVERY method,
and a per-stage breakdown of the fused pipeline in the reference's
``durations.txt`` style (``ParallelSort.cpp:358-417``), also written to
``durations_tpu.txt``.

Timing protocol: chained bijectively-remixed inputs + host readback (see
utils/timing.py for why block_until_ready alone is not sufficient here).
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from gpuradixsort_tpu.config import LANES, PAD_INDEX, EngineConfig
from gpuradixsort_tpu.core.table import pad_to_tile
from gpuradixsort_tpu.kernels import radix as rk
from gpuradixsort_tpu.kernels.bucketize import bucketize_tiles
from gpuradixsort_tpu.kernels.scatter import scatter_runs
from gpuradixsort_tpu.ops.permute import gather_rows
from gpuradixsort_tpu.ops.sort import (
    _fused_sort_padded,
    _sort_padded,
    _xla_sort_padded,
)
from gpuradixsort_tpu.utils.timing import StageTimes, bench_chain, remix_keys
from gpuradixsort_tpu.utils.verify import device_is_sorted, is_sorted

# Reference baseline: 1,048,576 pairs / 6,165 us (durations.txt:1).
BASELINE_KEYS_PER_S = 1_048_576 / 6.165e-3

HEADLINE_N = 1_000_000


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def make_inputs(n: int, cfg: EngineConfig, rng):
    keys_np = rng.permutation(n).astype(np.uint32) if n <= (1 << 26) else (
        rng.integers(0, 2**32, n, dtype=np.uint32)
    )
    keys = pad_to_tile(jnp.asarray(keys_np), cfg, jnp.uint32(0xFFFFFFFF))
    idx = pad_to_tile(jnp.arange(n, dtype=jnp.uint32), cfg, PAD_INDEX)
    return keys_np, keys, idx


def sort_step(method: str, cfg: EngineConfig, k_chain: int):
    """One jit-able x->x chain of k_chain sorts with an in-chain sorted bit.

    The state is the (keys, index) pair — the index column rides as an
    ARGUMENT, never a closure, so it cannot be inlined as an HLO constant
    (which blows the program size past the remote-compile limit at 64M).
    The chain is a ``lax.scan`` so the sort body compiles ONCE however long
    the chain is — long chains are what amortize the tunneled device's
    per-dispatch floor (measured 0.7-26 ms across sessions, probes/), the
    same reason the reference times a warm second run (``main.cpp:154-160``).
    """

    def body(state, _):
        k, idx = state
        if method == "radix":
            s, (p,) = _sort_padded(k, (idx,), cfg, None, 1)
        elif method == "fused":
            s, p, _ = _fused_sort_padded(k, idx, cfg)
        else:
            s, (p,) = _xla_sort_padded(k, (idx,))
        ok = device_is_sorted(s)
        k = remix_keys(s) ^ (ok.astype(jnp.uint32) - 1)
        return (k, idx), None

    @jax.jit
    def step(state):
        out, _ = jax.lax.scan(body, state, None, length=k_chain)
        return out

    return step


def run_method(method, cfg, keys, idx, n, k_chain, reps) -> float | None:
    try:
        dt = bench_chain(
            sort_step(method, cfg, k_chain), (keys, idx), reps=reps, warmup=1
        ) / k_chain
        log(
            f"[bench] n={n:>9} {method:>5}: {dt * 1e3:8.2f} ms/sort "
            f"({n / dt / 1e6:6.0f} M keys/s)"
        )
        return dt
    except Exception as e:  # pragma: no cover - diagnostic path
        log(f"[bench] n={n} {method} failed: {type(e).__name__}: {e}")
        return None


def verify_method(method, cfg, keys, idx, keys_np, n) -> bool:
    """Correctness gate: every benchmarked method, full output checked."""
    if method == "radix":
        s, (p,) = _sort_padded(keys, (idx,), cfg, None, 1)
    elif method == "fused":
        s, p, _ = _fused_sort_padded(keys, idx, cfg)
    else:
        s, (p,) = _xla_sort_padded(keys, (idx,))
    s_np = np.asarray(s)[:n]
    ok = is_sorted(s_np) and np.array_equal(s_np, np.sort(keys_np))
    if not ok:
        log(f"[bench] VERIFY FAIL n={n} method={method}")
    return ok


def fused_stage_breakdown(cfg: EngineConfig, keys, n, reps=3) -> StageTimes:
    """durations.txt-style per-stage timing of one fused pass at shift=0.

    Each stage is timed as its own chained jit (stage cost includes one
    dispatch's fixed overhead on this tunneled device — reported as-is, like
    the reference's host-side chrono includes driver overhead,
    ``ParallelSort.cpp:176-188``).
    """
    st = StageTimes()
    k_chain = 32
    k2 = keys.reshape(-1, LANES)
    i2 = jnp.arange(keys.shape[0], dtype=jnp.uint32).reshape(-1, LANES)
    hist = rk.tile_histograms(k2, 0, cfg)
    offsets = rk.global_offsets(hist)
    bk, bi = bucketize_tiles(k2, i2, 0, cfg)

    def chain(body, state0, name):
        """Time body chained k_chain times per dispatch; state is a pytree
        whose first leaf is the remixed carrier (aux leaves ride as args, so
        nothing device-sized is baked into the HLO as a constant)."""

        @jax.jit
        def step(state):
            def one(s, _):
                return (body(*s), *s[1:]), None

            out, _ = jax.lax.scan(one, state, None, length=k_chain)
            return out

        try:
            t = bench_chain(step, state0, reps=reps, warmup=1) / k_chain
            st.add(name, t)
        except Exception as e:  # pragma: no cover
            log(f"[bench] stage {name} failed: {e}")

    # Every step is x -> x (bench_chain contract): the stage result is folded
    # back into the carried state with a cheap xor.
    chain(
        lambda k: k ^ jnp.uint32(
            rk.tile_histograms(k ^ jnp.uint32(1), 0, cfg)[0, 0]
        ),
        (k2,),
        "histogram kernel (per pass)",
    )
    chain(
        lambda h: h ^ rk.global_offsets(h ^ 1)[0, 0],
        (hist,),
        "global offsets (per pass)",
    )
    chain(
        lambda k, i: bucketize_tiles(k ^ jnp.uint32(1), i, 0, cfg)[0],
        (k2, i2),
        "bucketize kernel (per pass)",
    )
    chain(
        lambda k, i, h, o: scatter_runs(k ^ jnp.uint32(1), i, h, o, cfg)[0],
        (bk, bi, hist, offsets),
        "window-write scatter (per pass)",
    )
    payload = jnp.zeros((k2.size, 16), jnp.int32)
    src0 = jnp.arange(k2.size, dtype=jnp.int32)
    chain(
        lambda s, p: s ^ gather_rows(p, s & (k2.size - 1))[:, 0],
        (src0, payload),
        "payload gather 64B rows (once)",
    )
    return st


def main() -> None:
    cfg = EngineConfig()
    rng = np.random.default_rng(20170101)
    backend = jax.default_backend()
    log(f"[bench] backend={backend} devices={jax.devices()}")

    sizes = [HEADLINE_N, 16 << 20, 64 << 20]
    methods_by_n = {
        HEADLINE_N: ("xla", "fused", "radix"),
        16 << 20: ("xla", "fused"),
        64 << 20: ("xla", "fused"),
    }
    if backend != "tpu":
        sizes = [HEADLINE_N]
        methods_by_n = {HEADLINE_N: ("xla", "radix")}
    chain_by_n = {
        n: (48 if n <= HEADLINE_N else (8 if n <= (16 << 20) else 2))
        if backend == "tpu" else 4
        for n in sizes
    }

    results: dict[int, dict[str, float]] = {}
    for n in sizes:
        keys_np, keys, idx = make_inputs(n, cfg, rng)
        # Chain lengths sized so ~2.2 ms/M-key sorts dwarf even a ~26 ms
        # per-dispatch floor (observed on a bad tunnel day, results_r5.json).
        k_chain = chain_by_n[n]
        reps = 3 if n <= (16 << 20) else 2
        results[n] = {}
        for method in methods_by_n[n]:
            dt = run_method(method, cfg, keys, idx, n, k_chain, reps)
            if dt is not None and verify_method(
                method, cfg, keys, idx, keys_np, n
            ):
                results[n][method] = dt

    # Per-stage breakdown of the fused pipeline at the headline size.
    if backend == "tpu":
        _, keys, _ = make_inputs(HEADLINE_N, cfg, rng)
        st = fused_stage_breakdown(cfg, keys, HEADLINE_N)
        text = st.report()
        log("[bench] fused per-stage breakdown (1M keys, per pass):")
        for line in text.splitlines():
            log("  " + line)
        with open("durations_tpu.txt", "w") as f:
            f.write(text + "\n")

    # 64B-payload table sort (BASELINE config 2): pair sort + 16-col gather.
    n = HEADLINE_N
    keys_np, keys, idx = make_inputs(n, cfg, rng)
    payload = jnp.asarray(
        rng.integers(0, 2**31, (keys.shape[0], 16), dtype=np.int64).astype(
            np.int32
        )
    )

    pay_chain = 8

    @jax.jit
    def payload_step(state):
        def one(s, _):
            k, idx_a, pay = s
            srt, p, _ = _fused_sort_padded(k, idx_a, cfg)
            rows = gather_rows(
                pay, jnp.clip(p, 0, pay.shape[0] - 1).astype(jnp.int32)
            )
            k = remix_keys(srt) ^ rows[0, 0].astype(jnp.uint32)
            return (k, idx_a, pay), None

        out, _ = jax.lax.scan(one, state, None, length=pay_chain)
        return out

    try:
        dt = bench_chain(
            payload_step, (keys, idx, payload), reps=3, warmup=1
        ) / pay_chain
        log(
            f"[bench] n={n:>9} 64B-row table sort (fused): {dt * 1e3:8.2f} "
            f"ms ({n / dt / 1e6:6.0f} M rows/s)"
        )
    except Exception as e:
        log(f"[bench] payload sort failed: {type(e).__name__}: {e}")

    hl = results.get(HEADLINE_N, {})
    if not hl:
        log("[bench] no method produced a verified headline result!")
        sys.exit(1)
    best_method = min(hl, key=hl.get)
    dt = hl[best_method]
    value = HEADLINE_N / dt
    log(f"[bench] headline best={best_method} backend={backend}")
    print(
        json.dumps(
            {
                "metric": (
                    "uint32 keys/s, stable 1M key+index sort, single chip "
                    f"(best method: {best_method})"
                ),
                "value": round(value),
                "unit": "keys/s",
                "vs_baseline": round(value / BASELINE_KEYS_PER_S, 3),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
