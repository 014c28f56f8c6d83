"""Test configuration: run on CPU with 8 virtual devices.

f64 is native on CPU (fast, exact) and the virtual 8-device mesh lets the
sharding/halo tests validate the multi-chip path without TPU hardware, per the
standard JAX practice of forcing host platform device count.  Must run before
any jax array is created.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache (.jax_cache/, shared with the TPU studies but
# keyed per backend): repeat suite runs skip XLA compilation, which dominates
# the suite's wall-clock (the heavy integrator programs take 10-30 s each).
from na_dd_tpu.config import enable_persistent_compilation_cache  # noqa: E402

enable_persistent_compilation_cache()
