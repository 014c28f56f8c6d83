"""Method-of-Manufactured-Solutions engine: SymPy exact solutions → JAX closures.

The reference lambdifies SymPy expressions to NumPy and calls them from Python
on every step (reference ``pack_symbolic_txy_with_derivatives`` /
``MMSCaseSymbolic``, src/prob1base.py:1158-1487).  Here the one-time symbolic
differentiation is identical, but lambdification targets **JAX**: the returned
closures are pure jnp code, so exact-solution and forcing evaluation trace
into the jitted step program and fuse with the stencil work — zero per-step
Python/host cost.

``DiracDelta`` (arising from differentiating ``Abs`` in the low-regularity
cases) is numerically stubbed the same way as the reference
(src/prob1base.py:1262): 1 within 1e-13 of zero, else 0.
"""

from __future__ import annotations

import os
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import sympy

from na_dd_tpu.core.state import State
from na_dd_tpu.ops.grid import Grid

# Shared symbols: 0 < t, 0 <= x, y <= 1.  The nonnegativity assumptions let
# SymPy simplify |·| derivatives exactly like the reference
# (src/prob1base.py:1164).
t_sym, x_sym, y_sym = sympy.symbols("t x y", negative=False, real=True)

_JAX_MODULES = [
    {"DiracDelta": lambda arg: jnp.where(jnp.abs(arg) < 1e-13, 1.0, 0.0)},
    "jax",
]


def _array_time(t_num, shape):
    """Promote the time scalar to a coordinate-shaped array behind an
    optimization barrier.

    On the TPU f64-emulation backend, transcendentals of 0-d/1-element
    operands are computed at f32 precision while >=2-element arrays get the
    accurate vector path (measured: exp() deviation 2e-8 on scalars vs 4e-16
    on arrays).  Evaluating the lambdified expressions with an array-shaped t
    forces every t-dependent transcendental onto the accurate path; the
    barrier stops XLA's algebraic simplifier from rewriting
    exp(broadcast(s)) back into broadcast(exp(s)).

    Deliberately one barrier PER CALL: sharing a single barrier node across
    the dozens of pack-closure calls of a step (memoized on the traced t)
    was measured 38-60% SLOWER end-to-end on the axon TPU (pol N=256 mixed:
    run 0.0865→0.1201 s, simulate-only 0.0499→0.0791 s) — a per-call
    barrier fuses into its consumer chain as a producer, while one
    multi-consumer barrier materializes and every chain re-reads it.
    """
    t_arr = jnp.broadcast_to(jnp.asarray(t_num, dtype=jnp.result_type(float)), shape)
    return jax.lax.optimization_barrier(t_arr)


def _wrap_shape(raw: Callable) -> Callable:
    """Broadcast constant/scalar lambdified results to the coordinate shape,
    evaluating with an array-shaped time (see :func:`_array_time`)."""

    def wrapped(t_num, x_num, y_num):
        shape = jnp.shape(x_num)
        res = raw(_array_time(t_num, shape), x_num, y_num)
        res = jnp.asarray(res, dtype=jnp.result_type(float))
        return jnp.broadcast_to(res, shape)

    return wrapped


def _separate_t_xy(expr, t_var, x_var, y_var):
    """2-D wrapper over :func:`_separate_t_space` (kept for callers/tests)."""
    return _separate_t_space(expr, t_var, (x_var, y_var))


def _separate_t_space(expr, t_var, space_vars):
    """Try to write ``expr`` as Σ_k f_k(t)·g_k(space).

    Returns a list of ``(t_factor, xy_factor)`` pairs with DISTINCT t-factors
    (spatial parts of equal t-factors merged symbolically), or None when any
    additive term mixes t and x/y inside one factor — e.g. the
    moving-Gaussian peaks case's ``exp(-((x - x0(t))² + …))`` — in which
    case the caller falls back to the full-grid evaluation.

    Deliberately NO ``sympy.expand()``: the study solutions carry exact
    zeros through FACTORED spatial forms (``x(1-x)y(1-y)`` is exactly 0 on
    the boundary), and expansion replaces them with ±1-ulp cancellation
    residues — which flips ``Heaviside(cs)`` at zero-crossing/boundary nodes
    (caught by tests/test_forcing.py::test_fcd_heaviside_factor).  Term-wise
    ``as_independent`` on the unexpanded expression keeps every spatial
    factor bit-compatible with the full evaluation wherever it is exactly
    zero.
    """
    try:
        space = set(space_vars)
        groups: dict = {}
        order = []
        for term in sympy.Add.make_args(expr):
            xy_part, t_part = term.as_independent(t_var)
            if t_part.free_symbols & space:
                return None
            if t_part in groups:
                groups[t_part] = groups[t_part] + xy_part
            else:
                groups[t_part] = xy_part
                order.append(t_part)
        return [(k, groups[k]) for k in order]
    except Exception:  # pragma: no cover - sympy corner cases → fallback
        return None


def _wrap_separable(pairs, t_var, space_vars) -> Callable:
    """Separable evaluation Σ_k f_k(t)·g_k(space) of a packed expression.

    Why this exists (TPU): :func:`_wrap_shape` evaluates the WHOLE expression
    with a grid-shaped time array, so every t-dependent transcendental —
    mathematically a scalar, e.g. ``cos(t·π/2)`` — runs as a full-grid
    f64-emulated transcendental on every call.  Measured on the headline
    benchmark level this made per-step error collection + forcing evaluation
    ~40% of the mixed-mode step budget (studies/mixed_perf_probe.py).  Here
    the t-factors are evaluated on a 2-element array (same accurate-vector-
    path trick as :func:`_array_time`, at 2 lanes instead of N²) and the
    t-INDEPENDENT spatial factors are pure functions of the coordinate
    grids, which XLA hoists out of the time scan (and constant-folds
    entirely when the grid is baked) — per call the expression costs k
    scalar transcendentals + k grid multiply-adds.

    Values differ from the unseparated path only by reassociation of the
    symbolic expansion (~1 ulp; the parity gates are 1e-8 relative).
    NA_DD_TPU_SEPARABLE=0 restores the full-grid path for A/B.
    """
    t_fns = [
        sympy.lambdify([t_var], tp, modules=_JAX_MODULES) for tp, _ in pairs
    ]
    xy_fns = [
        sympy.lambdify(list(space_vars), xp, modules=_JAX_MODULES)
        for _, xp in pairs
    ]

    def wrapped(t_num, *coords):
        shape = jnp.shape(coords[0])
        dtype = jnp.result_type(float)
        # t may arrive (1,1)-shaped (the traced-dt ladder convention) or
        # 0-d; flatten to a scalar before building the 2-lane array
        t_scalar = jnp.ravel(jnp.asarray(t_num, dtype=dtype))[0]
        t_arr = jax.lax.optimization_barrier(
            jnp.full((2,), t_scalar, dtype=dtype)
        )
        acc = jnp.zeros(shape, dtype=dtype)
        for tf, xyf in zip(t_fns, xy_fns):
            ft = jnp.broadcast_to(
                jnp.asarray(tf(t_arr), dtype=dtype), (2,)
            )[0]
            gk = jnp.broadcast_to(
                jnp.asarray(xyf(*coords), dtype=dtype), shape
            )
            acc = acc + ft * gk
        return acc

    return wrapped


def pack_symbolic_txy_with_derivatives(
    *,
    base_expr: sympy.Expr,
    t_var: sympy.Symbol = t_sym,
    x_var: sympy.Symbol = x_sym,
    y_var: sympy.Symbol = y_sym,
) -> Dict[str, Callable]:
    """Differentiate ``base_expr`` symbolically and lambdify to JAX.

    Returns callables ``{base, dt, dtt, dx, dy, dxx, dyy, lap}``; each maps
    (t, xx, yy) — t may be a traced scalar — to an array of xx's shape.
    """
    dt_expr = sympy.diff(base_expr, t_var)
    exprs = {
        "base": base_expr,
        "dt": dt_expr,
        "dtt": sympy.diff(dt_expr, t_var),
        "dx": sympy.diff(base_expr, x_var),
        "dy": sympy.diff(base_expr, y_var),
    }
    exprs["dxx"] = sympy.diff(exprs["dx"], x_var)
    exprs["dyy"] = sympy.diff(exprs["dy"], y_var)
    exprs["lap"] = exprs["dxx"] + exprs["dyy"]

    out = {}
    for name, expr in exprs.items():
        raw = sympy.lambdify([t_var, x_var, y_var], expr, modules=_JAX_MODULES)
        out[name] = _dispatch_separable(
            expr, t_var, (x_var, y_var), _wrap_shape(raw)
        )
    return out


def _dispatch_separable(expr, t_var, space_vars, full_fn) -> Callable:
    """Build both evaluation closures and pick per-call (i.e. at trace
    time) via :func:`_use_separable` — see that docstring for the measured
    backend split.  Falls through to ``full_fn`` when the expression does
    not separate."""
    pairs = _maybe_separable(expr, t_var, space_vars)
    if pairs is None:
        return full_fn
    sep_fn = _wrap_separable(pairs, t_var, space_vars)

    def choose(t_num, *coords):
        return (sep_fn if _use_separable() else full_fn)(t_num, *coords)

    return choose


def _maybe_separable(expr, t_var, space_vars):
    """The shared split gate: a cap on the number of distinct t-factors (a
    pathological split would trade one fused evaluation for an unrolled
    chain of k multiply-adds; no study case exceeds 3).  Whether the
    separable closure is USED is decided per-trace by
    :func:`_use_separable`."""
    pairs = _separate_t_space(expr, t_var, space_vars)
    if pairs is not None and len(pairs) <= 32:
        return pairs
    return None


def _use_separable() -> bool:
    """Backend-aware default, resolved at TRACE time (so constructing a case
    never touches the backend, and tests can flip the env per-case).

    Measured A/B at the headline level (pol N=256, 41 steps,
    studies/results/mixed_perf_probe*.json): on CPU the separable path is
    ~35% faster end-to-end (0.197 s vs 0.304 s at N=128, error identical to
    4.5e-13) — the full-grid transcendentals are real FLOPs there.  On the
    axon TPU it is consistently SLOWER (mixed 0.0865→0.0919 s, f64
    0.1361→0.1507 s): the workload is HBM-bandwidth-bound (~79% of peak),
    and replacing fused on-the-fly evaluation with reads of constant-folded
    spatial planes trades compute the chip had to spare for traffic it did
    not — and the program-shape change also moves the f64-emulation noise
    (error 4.3828432551e-9 → 4.3828431485e-9, 2.4e-8 relative, vs the exact
    pre-change value).  Hence: ON for CPU, OFF elsewhere;
    NA_DD_TPU_SEPARABLE=1/0 forces either way.
    """
    env = os.environ.get("NA_DD_TPU_SEPARABLE", "")
    if env == "0":
        return False
    if env == "1":
        return True
    return jax.default_backend() == "cpu"


class MMSCaseBase:
    """Exact-solution protocol: values + analytic derivatives of the five
    fields (reference ``MMSCaseBase``, src/prob1base.py:714-818)."""

    def __init__(self, grid: Grid, model):
        self._grid = grid
        self._model = model

    @property
    def grid(self):
        return self._grid

    @property
    def model(self):
        return self._model


_VARS = ("cp", "T", "cl", "cd", "cs")
_DERIVS = {
    "": "base",
    "dt_": "dt",
    "dtt_": "dtt",
    "dx_": "dx",
    "dy_": "dy",
    "dxx_": "dxx",
    "dyy_": "dyy",
    "lap_": "lap",
}


class MMSCaseSymbolic(MMSCaseBase):
    """MMS case defined by five SymPy expressions in (t, x, y)."""

    def __init__(
        self,
        *,
        grid: Grid,
        model,
        cp_sym_expr: sympy.Expr,
        T_sym_expr: sympy.Expr,
        cl_sym_expr: sympy.Expr,
        cd_sym_expr: sympy.Expr,
        cs_sym_expr: sympy.Expr,
        t_var: sympy.Symbol = t_sym,
        x_var: sympy.Symbol = x_sym,
        y_var: sympy.Symbol = y_sym,
    ):
        super().__init__(grid, model)
        pack_args = dict(t_var=t_var, x_var=x_var, y_var=y_var)
        self._packs = {
            "cp": pack_symbolic_txy_with_derivatives(base_expr=cp_sym_expr, **pack_args),
            "T": pack_symbolic_txy_with_derivatives(base_expr=T_sym_expr, **pack_args),
            "cl": pack_symbolic_txy_with_derivatives(base_expr=cl_sym_expr, **pack_args),
            "cd": pack_symbolic_txy_with_derivatives(base_expr=cd_sym_expr, **pack_args),
            "cs": pack_symbolic_txy_with_derivatives(base_expr=cs_sym_expr, **pack_args),
        }
        self._exprs = {
            "cp": cp_sym_expr,
            "T": T_sym_expr,
            "cl": cl_sym_expr,
            "cd": cd_sym_expr,
            "cs": cs_sym_expr,
        }

    def pack(self, var: str) -> Dict[str, Callable]:
        return self._packs[var]

    def expr(self, var: str) -> sympy.Expr:
        return self._exprs[var]


def _install_symbolic_accessors():
    """Generate cp/dt_cp/dx_cp/... accessor methods on MMSCaseSymbolic."""
    for var in _VARS:
        for prefix, key in _DERIVS.items():

            def method(self, t, xx, yy, _var=var, _key=key):
                return self._packs[_var][_key](t, xx, yy)

            setattr(MMSCaseSymbolic, f"{prefix}{var}", method)


_install_symbolic_accessors()


def pack_analytical_txy_with_o2fdm_derivatives(
    fn: Callable,
    *,
    default_eps: float = 1e-6,
    time_stepping: str = "center",
) -> Callable:
    """Wrap a plain f(t, x, y) with O(2) finite-difference derivatives
    (reference src/prob1base.py:895-1032).  Fallback for solutions that SymPy
    cannot express; the wrapper is jnp-traceable."""

    def dt1(t, x, y, eps):
        if time_stepping == "forward":
            return (-3 * fn(t, x, y) + 4 * fn(t + eps, x, y) - fn(t + 2 * eps, x, y)) / (2 * eps)
        if time_stepping == "backward":
            return (3 * fn(t, x, y) - 4 * fn(t - eps, x, y) + fn(t - 2 * eps, x, y)) / (2 * eps)
        return (fn(t + eps, x, y) - fn(t - eps, x, y)) / (2 * eps)

    def dt2(t, x, y, eps):
        if time_stepping == "forward":
            return (2 * fn(t, x, y) - 5 * fn(t + eps, x, y) + 4 * fn(t + 2 * eps, x, y) - fn(t + 3 * eps, x, y)) / (eps * eps)
        if time_stepping == "backward":
            return (2 * fn(t, x, y) - 5 * fn(t - eps, x, y) + 4 * fn(t - 2 * eps, x, y) - fn(t - 3 * eps, x, y)) / (eps * eps)
        return (fn(t + eps, x, y) - 2 * fn(t, x, y) + fn(t - eps, x, y)) / (eps * eps)

    if time_stepping not in ("forward", "center", "backward"):
        raise ValueError("Invalid time stepping strategy")

    def enhanced(t, x, y, *, d=(0, 0, 0), op=None, small_eps=None):
        eps = small_eps or default_eps
        if op is not None:
            if op.lower() in ("laplacian", "lap"):
                return (
                    fn(t, x + eps, y)
                    + fn(t, x - eps, y)
                    + fn(t, x, y + eps)
                    + fn(t, x, y - eps)
                    - 4 * fn(t, x, y)
                ) / (eps * eps)
            raise ValueError(f"Unknown operator: {op}")
        dt, dx, dy = d
        if not all(v in (0, 1, 2) for v in d):
            raise ValueError("Individual derivatives must be 0, 1, or 2")
        if dt + dx + dy > 2:
            raise ValueError("Combined derivative order must be 0, 1, or 2")
        if dt == 1:
            return dt1(t, x, y, eps)
        if dt == 2:
            return dt2(t, x, y, eps)
        if dx == 1 and dy == 1:
            return (
                fn(t, x + eps, y + eps)
                - fn(t, x + eps, y - eps)
                - fn(t, x - eps, y + eps)
                + fn(t, x - eps, y - eps)
            ) / (4 * eps * eps)
        if dx == 1:
            return (fn(t, x + eps, y) - fn(t, x - eps, y)) / (2 * eps)
        if dx == 2:
            return (fn(t, x + eps, y) - 2 * fn(t, x, y) + fn(t, x - eps, y)) / (eps * eps)
        if dy == 1:
            return (fn(t, x, y + eps) - fn(t, x, y - eps)) / (2 * eps)
        if dy == 2:
            return (fn(t, x, y + eps) - 2 * fn(t, x, y) + fn(t, x, y - eps)) / (eps * eps)
        return fn(t, x, y)

    return enhanced


class MMSCaseFromAnalytic(MMSCaseBase):
    """MMS case from plain Python/jnp callables f(t, xx, yy) with FD
    derivatives (reference ``MMSCaseFromAnalytic``, src/prob1base.py:1036-1155)."""

    def __init__(self, model, *, grid: Grid, cp_base, T_base, cl_base, cd_base, cs_base):
        super().__init__(grid, model)
        self._ex = {
            "cp": pack_analytical_txy_with_o2fdm_derivatives(cp_base),
            "T": pack_analytical_txy_with_o2fdm_derivatives(T_base),
            "cl": pack_analytical_txy_with_o2fdm_derivatives(cl_base),
            "cd": pack_analytical_txy_with_o2fdm_derivatives(cd_base),
            "cs": pack_analytical_txy_with_o2fdm_derivatives(cs_base),
        }


def _install_analytic_accessors():
    specs = {
        "": dict(d=(0, 0, 0)),
        "dt_": dict(d=(1, 0, 0)),
        "dx_": dict(d=(0, 1, 0)),
        "dy_": dict(d=(0, 0, 1)),
        "dxx_": dict(d=(0, 2, 0)),
        "dyy_": dict(d=(0, 0, 2)),
    }
    for var in _VARS:
        for prefix, kw in specs.items():

            def method(self, t, xx, yy, _var=var, _kw=kw):
                return self._ex[_var](_array_time(t, jnp.shape(xx)), xx, yy, **_kw)

            setattr(MMSCaseFromAnalytic, f"{prefix}{var}", method)

        def lap_method(self, t, xx, yy, _var=var):
            t_arr = _array_time(t, jnp.shape(xx))
            return self._ex[_var](t_arr, xx, yy, d=(0, 2, 0)) + self._ex[_var](
                t_arr, xx, yy, d=(0, 0, 2)
            )

        setattr(MMSCaseFromAnalytic, f"lap_{var}", lap_method)


_install_analytic_accessors()


def state_from_mms_when(*, mms_case, t, grid: Grid) -> State:
    """Evaluate the exact solution at time t into a State
    (reference src/prob1base.py:3433-3449)."""
    xx, yy = grid.xx, grid.yy
    return State(
        cp=mms_case.cp(t, xx, yy),
        T=mms_case.T(t, xx, yy),
        cl=mms_case.cl(t, xx, yy),
        cd=mms_case.cd(t, xx, yy),
        cs=mms_case.cs(t, xx, yy),
    )
