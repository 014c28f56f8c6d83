"""Global numerical configuration.

The reference computes everything in float64 (NumPy default).  The parity gate
(BASELINE.md: ≤1e-8 relative error deviation, Newton residuals < 1e-9 in
H-norm) requires f64 accumulation, so x64 is enabled package-wide.  TPU has no
native f64 MXU, but this workload is VPU/stencil-bound on small grids, where
emulated f64 is acceptable; a f32 fast path can be selected per-simulation via
the ``dtype`` arguments where offered.
"""

import jax


def setup_x64() -> None:
    jax.config.update("jax_enable_x64", True)
