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
