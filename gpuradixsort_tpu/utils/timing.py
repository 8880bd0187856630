"""Honest device timing + the durations.txt-style per-stage breakdown.

The reference times every one of its 130 dispatches host-side with
std::chrono and one GL_TIME_ELAPSED query, then dumps a per-pass table to
stdout and durations.txt (``ParallelSort.cpp:176-228,358-417``).  The TPU
equivalent must defeat two measurement hazards of this environment (see
.claude/skills/verify/SKILL.md): the remote execution tunnel memoizes
identical computation+input pairs, and block_until_ready does not
synchronize remote execution.  Protocol: chain the computation (x = f(x), so
every rep sees fresh input) and force a tiny host readback at the end.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def bench_chain(
    step: Callable[[jax.Array], jax.Array],
    x0: jax.Array,
    reps: int = 5,
    warmup: int = 1,
) -> float:
    """Seconds per rep for ``x = step(x)``, chained, readback-synced.

    ``step`` must map its output shape/dtype back to its input (mixing the
    result so consecutive inputs differ).
    """
    x = x0
    for _ in range(warmup):
        x = step(x)
    _ = np.asarray(jax.tree.leaves(x)[0].reshape(-1)[:1])  # sync
    t0 = time.perf_counter()
    for _ in range(reps):
        x = step(x)
    _ = np.asarray(jax.tree.leaves(x)[0].reshape(-1)[:1])  # sync
    return (time.perf_counter() - t0) / reps


MIX = jnp.uint32(0x9E3779B9)


def remix_keys(keys: jax.Array) -> jax.Array:
    """Cheap bijective mix so a chained sort sees different keys each rep."""
    return keys ^ MIX


class StageTimes:
    """Named per-stage timings, printed in the reference's durations style."""

    def __init__(self):
        self.stages: list[tuple[str, float]] = []

    def add(self, name: str, seconds: float):
        self.stages.append((name, seconds))

    def report(self, file=None) -> str:
        lines = [
            f"{name}: {seconds * 1e6:.0f} us" for name, seconds in self.stages
        ]
        text = "\n".join(lines)
        if file is not None:
            print(text, file=file, flush=True)
        return text
