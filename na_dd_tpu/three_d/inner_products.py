"""3-D discrete weighted inner products and norms.

Extension of :mod:`na_dd_tpu.ops.inner_products` (reference definitions
src/prob1base.py:387-433 are 2-D).  Each product is a whole-array masked
reduction — the staggered weights are zero outside their defining index
ranges — so everything fuses on the VPU and psums under sharding:

    <u,v>_H  = Σ_{interior} u v h_{i+1/2} k_{j+1/2} l_{k+1/2}
    <u,v>_gx = Σ u v h_i       k_{j+1/2} l_{k+1/2}      (x-gradient points)
    <u,v>_gy = Σ u v h_{i+1/2} k_j       l_{k+1/2}
    <u,v>_gz = Σ u v h_{i+1/2} k_{j+1/2} l_k
    <∇u,∇v>_p = <ux,vx>_gx + <uy,vy>_gy + <uz,vz>_gz
"""

from __future__ import annotations

import jax.numpy as jnp

from na_dd_tpu.three_d.grid import Grid3
from na_dd_tpu.three_d.shifts import Ops3


def inner_H3(ops: Ops3, g: Grid3, u, v):
    return ops.asum(u * v * g.w_H)


def norm_H3(ops: Ops3, g: Grid3, u):
    return jnp.sqrt(inner_H3(ops, g, u, u))


def inner_p3(ops: Ops3, g: Grid3, ux, uy, uz, vx, vy, vz):
    return (
        ops.asum(ux * vx * g.w_gx)
        + ops.asum(uy * vy * g.w_gy)
        + ops.asum(uz * vz * g.w_gz)
    )


def norm_p3(ops: Ops3, g: Grid3, ux, uy, uz):
    return jnp.sqrt(inner_p3(ops, g, ux, uy, uz, ux, uy, uz))
