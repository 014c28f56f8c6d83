"""Global numerical configuration.

The reference computes everything in float64 (NumPy default).  The parity gate
(BASELINE.md: ≤1e-8 relative error deviation, Newton residuals < 1e-9 in
H-norm) requires f64 accumulation, so x64 is enabled package-wide.  TPU has no
native f64 MXU, but this workload is VPU/stencil-bound on small grids, where
emulated f64 is acceptable; a f32 fast path can be selected per-simulation via
the ``dtype`` arguments where offered.
"""

import os
import sys

import jax

# Deeply composed programs (the mixed-precision path traces Pallas solve
# kernels inside refinement loops inside Newton sweeps inside the whole-run
# scan) exceed CPython's default 1000-frame recursion limit during JAX's
# jaxpr lowering (measured: RecursionError lowering mixed+pallas on TPU).
# Raising it is the standard JAX remedy; CPython frames are heap-allocated,
# so a generous bound only relaxes the runaway-recursion guard.
sys.setrecursionlimit(max(sys.getrecursionlimit(), 20_000))


def setup_x64() -> None:
    """Enable f64 unless NA_DD_TPU_X64=0 requests the f32 production mode.

    f64 is required for the reference-parity gate (<=1e-8 relative error
    deviation).  The f32 mode trades the last ~7 digits of the MMS error floor
    for native-speed TPU arithmetic and far faster compiles; use it for
    production forward runs, not for convergence verification.
    """
    if os.environ.get("NA_DD_TPU_X64", "1") != "0":
        jax.config.update("jax_enable_x64", True)


def enable_persistent_compilation_cache(path: str | None = None) -> None:
    """Enable the on-disk XLA compilation cache.

    The TPU backend here compiles f64-emulated programs slowly (minutes for
    the fused whole-simulation program); the persistent cache makes repeat
    runs (benchmarks, study ladders re-run across processes) start in seconds.
    """
    if path is None:
        path = os.environ.get(
            "NA_DD_TPU_CACHE", os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
        )
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
