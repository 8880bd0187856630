"""Round-5b probe: per-stage scaling of the fused pipeline, 1M -> 16M.

Originally written to explain bench.py's fused 2.37 ms/sort @1M vs
1122 ms @16M; the cause turned out to be the padded-input overflow
fallback (1M was secretly lax.sort — fixed, see kernels/scatter.py).
Kept as the honest per-stage scaling record: times bucketize, the
window-write scatter, and the histogram in isolation at 1M / 4M / 16M
with scan-chained dispatches (results_r5b.json).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from gpuradixsort_tpu.config import LANES, EngineConfig
from gpuradixsort_tpu.kernels import radix as rk
from gpuradixsort_tpu.kernels.bucketize import bucketize_tiles
from gpuradixsort_tpu.kernels.scatter import scatter_runs
from gpuradixsort_tpu.utils.timing import bench_chain

CFG = EngineConfig()
RESULTS = {}


def stage_time(n, which, k_chain=8, reps=2):
    rng = np.random.default_rng(0)
    k2 = jnp.asarray(
        rng.integers(0, 2**32, n, dtype=np.uint32)
    ).reshape(-1, LANES)
    i2 = jnp.arange(n, dtype=jnp.uint32).reshape(-1, LANES)
    hist = rk.tile_histograms(k2, 0, CFG)
    offsets = rk.global_offsets(hist)
    bk, bi = bucketize_tiles(k2, i2, 0, CFG)

    if which == "scatter":
        def one(s, _):
            a, b, h, o = s
            ok, oi, _ = scatter_runs(a, b, h, o, CFG)
            return (ok ^ jnp.uint32(1), oi, h, o), None
        state = (bk, bi, hist, offsets)
    elif which == "bucketize":
        def one(s, _):
            a, b = s
            ok, oi = bucketize_tiles(a ^ jnp.uint32(1), b, 0, CFG)
            return (ok, oi), None
        state = (k2, i2)
    else:  # histogram
        def one(s, _):
            (a,) = s
            h = rk.tile_histograms(a ^ jnp.uint32(1), 0, CFG)
            return (a ^ h[0, 0].astype(jnp.uint32),), None
        state = (k2,)

    @jax.jit
    def step(s):
        out, _ = jax.lax.scan(one, s, None, length=k_chain)
        return out

    t = bench_chain(step, state, reps=reps, warmup=1) / k_chain
    us_per_m = t / n * 1e6 * 1e6
    RESULTS[f"{which} {n>>20}M"] = {
        "ms": round(t * 1e3, 2), "us_per_M": round(us_per_m, 1),
    }
    print(f"[r5b] {which:>9} {n>>20:>3}M: {t*1e3:8.2f} ms "
          f"({us_per_m:8.1f} us/M)", flush=True)


for which in ("scatter", "bucketize", "histogram"):
    for n in (1 << 20, 4 << 20, 16 << 20):
        t0 = time.perf_counter()
        try:
            stage_time(n, which)
        except Exception as e:  # noqa: BLE001
            RESULTS[f"{which} {n>>20}M"] = {"err": str(e)[:200]}
            print(f"[r5b] {which} {n>>20}M FAILED: {e}", flush=True)
        print(f"   (wall {time.perf_counter()-t0:.0f}s)", flush=True)

with open("/root/repo/probes/results_r5b.json", "w") as f:
    json.dump(RESULTS, f, indent=1)
print(json.dumps(RESULTS))
