"""Multi-chip execution: mesh construction and halo-exchange shift ops.

See :mod:`na_dd_tpu.parallel.halo` for the sharded Ops provider and
:mod:`na_dd_tpu.parallel.step` for building sharded whole-step functions.
"""

from na_dd_tpu.parallel.halo import HaloOps
from na_dd_tpu.parallel.sharding import make_mesh, shard_grid_and_state
from na_dd_tpu.parallel.step import build_sharded_step, build_sharded_simulation

__all__ = [
    "HaloOps",
    "make_mesh",
    "shard_grid_and_state",
    "build_sharded_step",
    "build_sharded_simulation",
]
