"""Mimetic staggered-difference stencil operators.

Exact discrete counterparts of the reference operators (src/prob1base.py:
1499-1550), restated on top of the shift primitives of
:mod:`na_dd_tpu.ops.shifts` so the same code runs single-chip and sharded.

All operators map (N+1, M+1) grid functions to (N+1, M+1) grid functions;
rows/columns where the reference zero-fills are zero here by construction
(either via the 0-sentinel reciprocal metric arrays or the ``mask_x1``/
``mask_y1`` masks).

    Mx(u)[i,j]      = (u[i,j] + u[i-1,j]) / 2        (row 0 -> 0)   # M_x
    My(u)[i,j]      = (u[i,j] + u[i,j-1]) / 2        (col 0 -> 0)   # M_y
    Dx_reg(u)[i,j]  = (u[i,j] - u[i-1,j]) / h_i      (row 0 -> 0)   # D_{-x}
    Dy_reg(u)[i,j]  = (u[i,j] - u[i,j-1]) / k_j      (col 0 -> 0)   # D_{-y}
    Dx_star(u)[i,j] = (u[i+1,j] - u[i,j]) / h_{i+1/2} (rows 0,N -> 0) # D*_x
    Dy_star(u)[i,j] = (u[i,j+1] - u[i,j]) / k_{j+1/2} (cols 0,M -> 0) # D*_y
"""

from __future__ import annotations

from na_dd_tpu.ops.grid import Grid
from na_dd_tpu.ops.shifts import Ops


def Mx(ops: Ops, g: Grid, u):
    return 0.5 * (u + ops.shift_xm(u)) * g.mask_x1


def My(ops: Ops, g: Grid, u):
    return 0.5 * (u + ops.shift_ym(u)) * g.mask_y1


def Dx_reg(ops: Ops, g: Grid, u):
    return (u - ops.shift_xm(u)) * g.inv_hh


def Dy_reg(ops: Ops, g: Grid, u):
    return (u - ops.shift_ym(u)) * g.inv_kk


def Dx_star(ops: Ops, g: Grid, u):
    return (ops.shift_xp(u) - u) * g.inv_hh_phalf


def Dy_star(ops: Ops, g: Grid, u):
    return (ops.shift_yp(u) - u) * g.inv_kk_phalf


def grad_H(ops: Ops, g: Grid, u):
    """Discrete gradient used in the H¹-type error norms
    (reference src/prob1base.py:483-484)."""
    return (Dx_reg(ops, g, u), Dy_reg(ops, g, u))
