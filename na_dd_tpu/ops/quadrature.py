"""Cell-average quadrature over dual cells.

3×3 Gauss–Legendre average integral of f(x, y) over the dual cells
[x_{i-1/2}, x_{i+1/2}] × [y_{j-1/2}, y_{j+1/2}] for interior nodes
(reference ``avg_int``, src/prob1base.py:493-598).  Used to project the cp
forcing term onto cell averages.

TPU-first reformulation: instead of slicing interior sub-arrays (shape
(N-1, M-1), which is shard-hostile), the quadrature bases/widths are expressed
as shifted full-grid arrays and the result is interior-masked.  All nine
evaluation points lie inside [0,1]², so f never sees out-of-domain inputs.
"""

from __future__ import annotations

import numpy as np

from na_dd_tpu.ops.grid import Grid
from na_dd_tpu.ops.shifts import Ops

# Standard 3-point Gauss–Legendre nodes/weights on [-1, 1].
_GL_W = (5.0 / 9.0, 8.0 / 9.0, 5.0 / 9.0)
_GL_N = (-float(np.sqrt(3.0 / 5.0)), 0.0, float(np.sqrt(3.0 / 5.0)))


def avg_int(f, g: Grid, ops: Ops):
    """Average integral of ``f(x, y)`` over interior dual cells.

    Returns an (N+1, M+1) array: cell-average values on the interior, zeros on
    the boundary.
    """
    base_x = ops.shift_xm(g.xx_phalf)  # x_{i-1/2} at node (i, j)
    base_y = ops.shift_ym(g.yy_phalf)  # y_{j-1/2}
    width_x = g.hh_phalf  # h_{i+1/2} = x_{i+1/2} - x_{i-1/2}
    width_y = g.kk_phalf

    acc = 0.0
    for wi, ni in zip(_GL_W, _GL_N):
        p = base_x + (ni + 1.0) * 0.5 * width_x
        for wj, nj in zip(_GL_W, _GL_N):
            q = base_y + (nj + 1.0) * 0.5 * width_y
            acc = acc + (wi * wj) * f(p, q)

    # 0.25 = quadrature Jacobian (area/4) divided by the cell area.
    return 0.25 * acc * g.interior_mask
