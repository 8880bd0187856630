"""Engine-wide configuration — the single-sourced constants module.

The reference keeps its kernel<->host contract in shared header files that are
#include-able from both C++ and GLSL (binding slots, uniform locations, and the
tile-size constants ``PARALLEL_SORT_WORK_GROUP_SIZE_X``/``ITEMS_PER_WORK_GROUP``;
see reference ``Shaders/ComputeHeaders/ParallelSortConstants.comp:17-24`` and
``Shaders/ComputeHeaders/SsboBufferBindings.comp:2-16``).  The TPU-native
equivalent is this dataclass: tile geometry, digit width, and mesh axes are
defined once here and imported by both the host-side operator code and the
Pallas kernels, so there is exactly one place where the kernel/host contract
lives.
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp

# TPU VPU lane count.  The minor-most dimension of every tiled buffer.
LANES = 128

# Tiles processed by one Pallas grid step.  Mosaic needs VMEM block shapes
# with trailing dims that are multiples of (8, 128), so per-tile tables
# (histograms, offsets) are blocked 8 tile-rows at a time.
TILES_PER_STEP = 8

# Sentinel key used to pad ragged tails up to a tile multiple.  Mirrors the
# reference, which pads the intermediate buffer tail with 0xffffffff so padding
# sorts to the back (``Shaders/ParallelSort/OriginalDataToIntermediateData.comp:44-47``).
PAD_KEY = jnp.uint32(0xFFFFFFFF)

# Sentinel original-row index carried by pad entries.  Real rows always have
# index < N <= 2**32 - 1, so the sentinel is distinguishable.
PAD_INDEX = jnp.uint32(0xFFFFFFFF)


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Tile geometry + radix parameters shared by host code and kernels.

    Equivalent in role to the reference's ``ParallelSortConstants.comp``
    (work-group size 512, 1024 items per scan group) — but TPU-shaped: a tile
    is ``tile_rows`` sublane rows x 128 lanes, resident in VMEM, and the digit
    is ``radix_bits`` wide (the reference is hard-wired to 1 bit/pass x 32
    passes as a GLSL workaround; multi-bit digits are the idiomatic form).
    """

    # Digit width per radix pass.  4 -> 16 buckets, 8 passes for uint32 keys.
    radix_bits: int = 4
    # Sublane rows per VMEM tile.  tile = tile_rows * LANES elements.
    tile_rows: int = 8
    # Sort key bit-width (uint32 keys, as the reference's OriginalData._value).
    key_bits: int = 32

    def __post_init__(self):
        if self.key_bits % self.radix_bits != 0:
            raise ValueError(
                f"radix_bits={self.radix_bits} must divide key_bits={self.key_bits}"
            )
        if self.radix_bits not in (1, 2, 4, 8):
            raise ValueError("radix_bits must be one of (1, 2, 4, 8)")
        if self.tile_rows < 1:
            raise ValueError("tile_rows must be >= 1")

    @property
    def radix(self) -> int:
        """Number of digit buckets per pass (2**radix_bits)."""
        return 1 << self.radix_bits

    @property
    def table_lanes(self) -> int:
        """Lane width of per-tile histogram/offset tables.

        One 128-lane row per tile for radix <= 128; wide digits (radix 256)
        widen the table to a multiple of 128 lanes instead (Mosaic blocks may
        have any lane count that is a multiple of 128).
        """
        return max(LANES, self.radix)

    @property
    def tile(self) -> int:
        """Elements per VMEM tile (the ITEMS_PER_WORK_GROUP analog)."""
        return self.tile_rows * LANES

    @property
    def block(self) -> int:
        """Elements per Pallas grid step (= padding granularity).

        Buffers are padded to a multiple of this, the analog of the
        reference's round-up-to-ITEMS_PER_WORK_GROUP rule
        (``PrefixSumSsbo.cpp:102-104``).
        """
        return self.tile * TILES_PER_STEP

    @property
    def num_passes(self) -> int:
        """LSD passes needed to cover the full key width."""
        return self.key_bits // self.radix_bits


DEFAULT_CONFIG = EngineConfig()

# A 1-bit-per-pass configuration kept as a cross-check oracle: structurally the
# closest analog of the reference's 32x1-bit pipeline
# (``Source/ComputeControllers/ParallelSort.cpp:236-298``).
REFERENCE_PARITY_CONFIG = EngineConfig(radix_bits=1)


@functools.cache
def on_tpu() -> bool:
    """True when the default JAX backend is a real TPU."""
    return jax.default_backend() == "tpu"


def interpret_mode() -> bool:
    """Whether pallas_call should run in interpreter mode on this backend."""
    return not on_tpu()


def kernel_impl() -> str:
    """Resolve the kernel implementation backend for the Pallas kernels.

    - ``"mosaic"``: compiled Pallas (real TPU; the production path).
    - ``"interpret"``: Pallas interpreter — exercises the exact kernel body
      off-TPU.  Used by the kernel unit tests at small shapes (interpreting
      the heavily vectorized bodies compiles huge XLA graphs, so operator-
      level CPU tests do not run this path).
    - ``"reference"``: compact jnp reference implementations — semantically
      identical, oracle-tested against the kernels.  The default off-TPU and
      the engine's "paranoid mode" cross-check (SURVEY.md §5, race-detection
      row: every Pallas kernel has a jnp reference implementation).

    Override with env ``GRS_KERNEL_IMPL=mosaic|interpret|reference``.
    """
    forced = os.environ.get("GRS_KERNEL_IMPL")
    if forced:
        if forced not in ("mosaic", "interpret", "reference"):
            raise ValueError(f"GRS_KERNEL_IMPL={forced!r} is not a backend")
        return forced
    return "mosaic" if on_tpu() else "reference"
