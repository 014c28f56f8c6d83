"""3-D Method-of-Manufactured-Solutions engine: SymPy (t,x,y,z) → JAX closures.

The 3-D twin of :mod:`na_dd_tpu.mms.engine` (itself the TPU-native
counterpart of the reference ``pack_symbolic_txy_with_derivatives`` /
``MMSCaseSymbolic``, src/prob1base.py:1158-1487 — the reference is strictly
2-D; this module is part of the beyond-reference 3-D extension).  The same
design: one-time symbolic differentiation, lambdified to **jnp**, so exact
solutions and forcings trace into the jitted step program and fuse with the
stencil work.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import sympy

from na_dd_tpu.core.state import State
from na_dd_tpu.mms.engine import (
    _JAX_MODULES,
    _array_time,
    _dispatch_separable,
    t_sym,
    x_sym,
    y_sym,
)
from na_dd_tpu.three_d.grid import Grid3

#: Third spatial symbol (t/x/y are shared with the 2-D engine).
z_sym = sympy.Symbol("z", negative=False, real=True)


def _array_time3(t_num, shape):
    """Coordinate-shaped time behind an optimization barrier — same TPU
    f64-emulation rationale (and per-call-barrier lesson) as
    :func:`na_dd_tpu.mms.engine._array_time` (shape-generic)."""
    return _array_time(t_num, shape)


def _wrap_shape3(raw: Callable) -> Callable:
    def wrapped(t_num, x_num, y_num, z_num):
        shape = jnp.shape(x_num)
        res = raw(_array_time3(t_num, shape), x_num, y_num, z_num)
        res = jnp.asarray(res, dtype=jnp.result_type(float))
        return jnp.broadcast_to(res, shape)

    return wrapped


def pack_symbolic_txyz_with_derivatives(
    *,
    base_expr: sympy.Expr,
    t_var: sympy.Symbol = t_sym,
    x_var: sympy.Symbol = x_sym,
    y_var: sympy.Symbol = y_sym,
    z_var: sympy.Symbol = z_sym,
) -> Dict[str, Callable]:
    """Differentiate symbolically and lambdify to JAX.  Returns callables
    ``{base, dt, dtt, dx, dy, dz, dxx, dyy, dzz, lap}``; each maps
    (t, xx, yy, zz) — t may be a traced scalar — to an array of xx's shape."""
    dt_expr = sympy.diff(base_expr, t_var)
    exprs = {
        "base": base_expr,
        "dt": dt_expr,
        "dtt": sympy.diff(dt_expr, t_var),
        "dx": sympy.diff(base_expr, x_var),
        "dy": sympy.diff(base_expr, y_var),
        "dz": sympy.diff(base_expr, z_var),
    }
    exprs["dxx"] = sympy.diff(exprs["dx"], x_var)
    exprs["dyy"] = sympy.diff(exprs["dy"], y_var)
    exprs["dzz"] = sympy.diff(exprs["dz"], z_var)
    exprs["lap"] = exprs["dxx"] + exprs["dyy"] + exprs["dzz"]

    out = {}
    for name, expr in exprs.items():
        # separable Σ f_k(t)·g_k(x,y,z) fast path — same machinery,
        # backend-aware dispatch and rationale as the 2-D engine
        # (na_dd_tpu/mms/engine.py::_use_separable).
        raw = sympy.lambdify(
            [t_var, x_var, y_var, z_var], expr, modules=_JAX_MODULES
        )
        out[name] = _dispatch_separable(
            expr, t_var, (x_var, y_var, z_var), _wrap_shape3(raw)
        )
    return out


_VARS = ("cp", "T", "cl", "cd", "cs")
_DERIVS = {
    "": "base",
    "dt_": "dt",
    "dtt_": "dtt",
    "dx_": "dx",
    "dy_": "dy",
    "dz_": "dz",
    "dxx_": "dxx",
    "dyy_": "dyy",
    "dzz_": "dzz",
    "lap_": "lap",
}


class MMSCaseSymbolic3:
    """MMS case defined by five SymPy expressions in (t, x, y, z); accessor
    protocol mirrors :class:`na_dd_tpu.mms.engine.MMSCaseSymbolic` with the
    extra ``dz_*``/``dzz_*`` derivatives and a z-inclusive ``lap_*``."""

    def __init__(
        self,
        *,
        grid: Grid3,
        model,
        cp_sym_expr: sympy.Expr,
        T_sym_expr: sympy.Expr,
        cl_sym_expr: sympy.Expr,
        cd_sym_expr: sympy.Expr,
        cs_sym_expr: sympy.Expr,
    ):
        self._grid = grid
        self._model = model
        self._exprs = {
            "cp": cp_sym_expr,
            "T": T_sym_expr,
            "cl": cl_sym_expr,
            "cd": cd_sym_expr,
            "cs": cs_sym_expr,
        }
        self._packs = {
            var: pack_symbolic_txyz_with_derivatives(base_expr=expr)
            for var, expr in self._exprs.items()
        }

    @property
    def grid(self):
        return self._grid

    @property
    def model(self):
        return self._model

    def pack(self, var: str) -> Dict[str, Callable]:
        return self._packs[var]

    def expr(self, var: str) -> sympy.Expr:
        return self._exprs[var]


def _install_symbolic_accessors3():
    for var in _VARS:
        for prefix, key in _DERIVS.items():

            def method(self, t, xx, yy, zz, _var=var, _key=key):
                return self._packs[_var][_key](t, xx, yy, zz)

            setattr(MMSCaseSymbolic3, f"{prefix}{var}", method)


_install_symbolic_accessors3()


def state_from_mms_when3(*, mms_case, t, grid: Grid3) -> State:
    """Evaluate the exact 3-D solution at time t into a State pytree (the
    State container is shape-agnostic — same five-field pytree as 2-D)."""
    xx, yy, zz = grid.xx, grid.yy, grid.zz
    return State(
        cp=mms_case.cp(t, xx, yy, zz),
        T=mms_case.T(t, xx, yy, zz),
        cl=mms_case.cl(t, xx, yy, zz),
        cd=mms_case.cd(t, xx, yy, zz),
        cs=mms_case.cs(t, xx, yy, zz),
    )


# ----------------------------------------------------------------------
# Concrete cases: 3-D analogues of the 2-D study catalogue
# (na_dd_tpu/mms/cases.py; reference src/prob1_mms_cases.py)
# ----------------------------------------------------------------------

_W_POLY3 = (
    x_sym * (1 - x_sym) * y_sym * (1 - y_sym) * z_sym * (1 - z_sym)
)


class MMSCasePol3(MMSCaseSymbolic3):
    """3-D analogue of ``MMSCasePolWithOscilatingTime``: the separable
    polynomial bump x(1−x)y(1−y)z(1−z) times φ(t) = ampl (1 + shrink sin(speed t)),
    all five fields equal (2-D form: mms/cases.py MMSCasePolWithOscilatingTime)."""

    def __init__(self, grid, model, *, ampl: float = 1, speed: float = 1, shrink: float = 1):
        profile = ampl * (1 + shrink * sympy.sin(speed * t_sym)) * _W_POLY3
        super().__init__(
            grid=grid,
            model=model,
            cp_sym_expr=profile,
            T_sym_expr=profile,
            cl_sym_expr=profile,
            cd_sym_expr=profile,
            cs_sym_expr=profile,
        )


class MMSCaseCsZeroCrossing3(MMSCaseSymbolic3):
    """cp = T = cl = cd = 0; cs = (A − B t) W crosses zero — exercises the
    Heaviside switching in 3-D (2-D twin: mms/cases.MMSCaseCsZeroCrossing,
    reference src/prob1_mms_cases.py:341-403)."""

    def __init__(self, grid, model, *, cs_A: float = 0.5, cs_B: float = 1.0):
        zero = sympy.S(0)
        cs = (sympy.Float(cs_A) - sympy.Float(cs_B) * t_sym) * _W_POLY3
        super().__init__(
            grid=grid,
            model=model,
            cp_sym_expr=zero,
            T_sym_expr=zero,
            cl_sym_expr=zero,
            cd_sym_expr=zero,
            cs_sym_expr=cs,
        )


class MMSCaseExpSin3(MMSCaseSymbolic3):
    """3-D analogue of the expsin case: W = sin(πx) sin(πy) sin(πz),
    φ(t) = e^{-t} — smooth, non-polynomial spatial profile (so the spatial
    discretization error is generic, not quadrature-exact)."""

    def __init__(self, grid, model, *, a: float = 1.0):
        pi = sympy.pi
        profile = (
            sympy.exp(-a * t_sym)
            * sympy.sin(pi * x_sym)
            * sympy.sin(pi * y_sym)
            * sympy.sin(pi * z_sym)
        )
        super().__init__(
            grid=grid,
            model=model,
            cp_sym_expr=profile,
            T_sym_expr=profile,
            cl_sym_expr=profile,
            cd_sym_expr=profile,
            cs_sym_expr=profile,
        )
