"""Headline benchmark: 1M-key stable (key,index) sort on one chip.

Mirrors the reference's headline workload — 1,048,576 padded uint32
key+index pairs sorted stably in 6,165 us (~170.1 M keys/s) on a 2017-era
GPU (``durations.txt:1``, ``Include/ComputeControllers/ParallelSort.h:39``).

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": "keys/s", "vs_baseline": N/170.1e6}
Diagnostics (per-method timings, correctness checks) go to stderr.

Timing protocol: chained bijectively-remixed inputs + host readback (see
utils/timing.py for why block_until_ready alone is not sufficient here).
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from gpuradixsort_tpu.config import EngineConfig, PAD_INDEX
from gpuradixsort_tpu.core.table import pad_to_tile
from gpuradixsort_tpu.ops.sort import _sort_padded, _xla_sort_padded
from gpuradixsort_tpu.utils.timing import bench_chain, remix_keys
from gpuradixsort_tpu.utils.verify import is_sorted

# Reference baseline: 1,048,576 pairs / 6,165 us (durations.txt:1).
BASELINE_KEYS_PER_S = 1_048_576 / 6.165e-3

N = 1_000_000


def main() -> None:
    cfg = EngineConfig()
    rng = np.random.default_rng(20170101)
    keys_np = rng.permutation(N).astype(np.uint32)
    keys = pad_to_tile(jnp.asarray(keys_np), cfg, jnp.uint32(0xFFFFFFFF))
    idx = pad_to_tile(jnp.arange(N, dtype=jnp.uint32), cfg, PAD_INDEX)

    # K sorts chained per dispatch: amortizes the fixed per-dispatch cost
    # (remote-tunnel round trip, ~2-3 ms here) the way any pipelined
    # production workload does, leaving steady-state device throughput —
    # the analog of the reference timing device work via GL queries rather
    # than host round trips (ParallelSort.cpp:207-228).
    K = 8

    def make_step(method):
        @jax.jit
        def step(k):
            for _ in range(K):
                if method == "radix":
                    s, (p,) = _sort_padded(k, (idx,), cfg, None, 1)
                else:
                    s, (p,) = _xla_sort_padded(k, (idx,))
                # correctness signal folded into the chain: sorted?
                ok = jnp.all(s[1:] >= s[:-1])
                k = remix_keys(s) ^ (ok.astype(jnp.uint32) - 1)
            return k

        return step

    results = {}
    for method in ("xla", "radix"):
        try:
            dt = bench_chain(make_step(method), keys, reps=3, warmup=1) / K
            results[method] = dt
            print(
                f"[bench] {method}: {dt * 1e3:.2f} ms/sort "
                f"({N / dt / 1e6:.0f} M keys/s)",
                file=sys.stderr,
                flush=True,
            )
        except Exception as e:  # pragma: no cover - diagnostic path
            print(f"[bench] {method} failed: {e}", file=sys.stderr, flush=True)

    # Correctness gate on the reported path (permutation oracle).
    best_method = min(results, key=results.get)
    if best_method == "radix":
        s, _ = _sort_padded(keys, (idx,), cfg, None, 1)
    else:
        s, _ = _xla_sort_padded(keys, (idx,))
    assert is_sorted(np.asarray(s)[:N]), "bench output not sorted!"

    dt = results[best_method]
    value = N / dt
    print(
        f"[bench] best={best_method}  backend={jax.default_backend()}",
        file=sys.stderr,
        flush=True,
    )
    print(
        json.dumps(
            {
                "metric": "uint32 keys/s, stable 1M key+index sort, single chip",
                "value": round(value),
                "unit": "keys/s",
                "vs_baseline": round(value / BASELINE_KEYS_PER_S, 3),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
