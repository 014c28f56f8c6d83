from na_dd_tpu.ops.grid import Grid, make_uniform_grid, make_grid
from na_dd_tpu.ops.shifts import Ops, LocalOps, LOCAL_OPS
from na_dd_tpu.ops import stencils
from na_dd_tpu.ops import inner_products
from na_dd_tpu.ops.quadrature import avg_int
from na_dd_tpu.ops import linsolve

__all__ = [
    "Grid",
    "make_uniform_grid",
    "make_grid",
    "Ops",
    "LocalOps",
    "LOCAL_OPS",
    "stencils",
    "inner_products",
    "avg_int",
    "linsolve",
]
