"""Discrete weighted inner products and norms.

Reference definitions (src/prob1base.py:387-433) use boundary-sliced sums;
here each product is a whole-array masked reduction (weights are zero outside
the defining index range), which fuses on the VPU and turns into a ``psum`` of
local sums under sharding.

    <u,v>_H    = Σ_{1<=i<=N-1, 1<=j<=M-1} u v h_{i+1/2} k_{j+1/2}
    <u,v>_{+k} = Σ_{1<=i<=N,   1<=j<=M-1} u v h_i       k_{j+1/2}
    <u,v>_{h+} = Σ_{1<=i<=N-1, 1<=j<=M}   u v h_{i+1/2} k_j
    <(ux,uy),(vx,vy)>_p = <ux,vx>_{+k} + <uy,vy>_{h+}
"""

from __future__ import annotations

import jax.numpy as jnp

from na_dd_tpu.ops.grid import Grid
from na_dd_tpu.ops.shifts import Ops


def inner_H(ops: Ops, g: Grid, u, v):
    return ops.asum(u * v * g.w_H)


def norm_H(ops: Ops, g: Grid, u):
    return jnp.sqrt(inner_H(ops, g, u, u))


def inner_pk(ops: Ops, g: Grid, u, v):
    return ops.asum(u * v * g.w_pk)


def norm_pk(ops: Ops, g: Grid, u):
    return jnp.sqrt(inner_pk(ops, g, u, u))


def inner_hp(ops: Ops, g: Grid, u, v):
    return ops.asum(u * v * g.w_hp)


def norm_hp(ops: Ops, g: Grid, u):
    return jnp.sqrt(inner_hp(ops, g, u, u))


def inner_p(ops: Ops, g: Grid, ux, uy, vx, vy):
    return inner_pk(ops, g, ux, vx) + inner_hp(ops, g, uy, vy)


def norm_p(ops: Ops, g: Grid, ux, uy):
    return jnp.sqrt(inner_p(ops, g, ux, uy, ux, uy))
