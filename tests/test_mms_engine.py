"""MMS engine tests: symbolic pack derivative fidelity (vs NumPy lambdify and
finite differences), shape broadcasting, DiracDelta stub, Abs^gamma handling
(the NonFullySmoothPol ingredient), and the analytic-FD fallback adapter."""

import numpy as np
import jax.numpy as jnp
import sympy
import pytest

from na_dd_tpu.mms import (
    MMSCaseFromAnalytic,
    pack_analytical_txy_with_o2fdm_derivatives,
    pack_symbolic_txy_with_derivatives,
    t_sym,
    x_sym,
    y_sym,
)
from na_dd_tpu.models import Model02, default_model_consts
from na_dd_tpu.ops import make_uniform_grid

RNG = np.random.RandomState(42)


def _random_points(n=50):
    t = 0.37
    x = RNG.rand(n)
    y = RNG.rand(n)
    return t, x, y


@pytest.mark.parametrize(
    "expr",
    [
        x_sym * (1 - x_sym) * y_sym * (1 - y_sym) / (1 + t_sym),
        sympy.sin(sympy.pi * x_sym) * sympy.sin(sympy.pi * y_sym) * sympy.exp(-t_sym),
        (x_sym**2 + y_sym**2) ** 3 * sympy.sin(sympy.pi * x_sym) * sympy.exp(-0.1 * t_sym),
    ],
    ids=["pol", "expsin", "peaks"],
)
def test_pack_matches_numpy_lambdify(expr):
    """Golden-value check: jax lambdify == numpy lambdify on random points."""
    pack = pack_symbolic_txy_with_derivatives(base_expr=expr)
    t, x, y = _random_points()
    for key, dexpr in {
        "base": expr,
        "dt": sympy.diff(expr, t_sym),
        "dx": sympy.diff(expr, x_sym),
        "dy": sympy.diff(expr, y_sym),
        "dxx": sympy.diff(expr, x_sym, 2),
        "dyy": sympy.diff(expr, y_sym, 2),
        "lap": sympy.diff(expr, x_sym, 2) + sympy.diff(expr, y_sym, 2),
        "dtt": sympy.diff(expr, t_sym, 2),
    }.items():
        f_np = sympy.lambdify([t_sym, x_sym, y_sym], dexpr, "numpy")
        expected = np.broadcast_to(np.asarray(f_np(t, x, y), dtype=float), x.shape)
        got = np.asarray(pack[key](t, jnp.asarray(x), jnp.asarray(y)))
        assert np.allclose(got, expected, rtol=1e-13, atol=1e-15), key


def test_pack_abs_gamma_fractional():
    """|x-θ|^γ with fractional γ and its Abs-derivative chain (sign/DiracDelta)
    must evaluate identically to the reference's NumPy path."""
    theta = 1 / np.pi
    gamma = 2.1
    expr = (
        x_sym * (1 - x_sym) * y_sym * (1 - y_sym) / (1 + t_sym)
    ) * sympy.Abs((x_sym - theta) * (y_sym - theta)) ** gamma
    pack = pack_symbolic_txy_with_derivatives(base_expr=expr)
    t, x, y = _random_points()
    dirac_np = lambda arg: np.where(np.abs(arg) < 1e-13, 1.0, 0.0)
    for key, dexpr in {
        "dx": sympy.diff(expr, x_sym),
        "dxx": sympy.diff(expr, x_sym, 2),
        "lap": sympy.diff(expr, x_sym, 2) + sympy.diff(expr, y_sym, 2),
    }.items():
        f_np = sympy.lambdify(
            [t_sym, x_sym, y_sym], dexpr, [{"DiracDelta": dirac_np}, "numpy"]
        )
        expected = np.asarray(f_np(t, x, y), dtype=float)
        got = np.asarray(pack[key](t, jnp.asarray(x), jnp.asarray(y)))
        assert np.allclose(got, expected, rtol=1e-12, atol=1e-14), key


def test_pack_scalar_broadcast():
    pack = pack_symbolic_txy_with_derivatives(base_expr=sympy.S(0))
    out = pack["base"](0.1, jnp.ones((3, 4)), jnp.ones((3, 4)))
    assert out.shape == (3, 4)
    assert np.all(np.asarray(out) == 0.0)
    # constant expr: derivative packs also broadcast
    pack2 = pack_symbolic_txy_with_derivatives(base_expr=t_sym)
    out2 = pack2["dt"](0.1, jnp.ones((2, 2)), jnp.ones((2, 2)))
    assert out2.shape == (2, 2) and np.all(np.asarray(out2) == 1.0)


def test_symbolic_case_accessors():
    from na_dd_tpu.mms.cases import MMSCasePol

    g = make_uniform_grid(4, 4)
    model = Model02(default_model_consts)
    case = MMSCasePol(g, model=model)
    xx, yy = g.xx, g.yy
    t = 0.25
    W = np.asarray(xx) * (1 - np.asarray(xx)) * np.asarray(yy) * (1 - np.asarray(yy))
    assert np.allclose(np.asarray(case.cp(t, xx, yy)), W / (1 + t))
    assert np.allclose(np.asarray(case.dt_T(t, xx, yy)), -W / (1 + t) ** 2)
    assert np.allclose(
        np.asarray(case.lap_cl(t, xx, yy)),
        (-2 * np.asarray(yy) * (1 - np.asarray(yy)) - 2 * np.asarray(xx) * (1 - np.asarray(xx)))
        / (1 + t),
    )
    assert case.grid is g and case.model is model


def test_analytic_fd_adapter_accuracy():
    fn = lambda t, x, y: np.e ** (-t) * np.sin(3 * x) * np.cos(2 * y)
    wrapped = pack_analytical_txy_with_o2fdm_derivatives(fn, default_eps=1e-5)
    t, x, y = 0.3, np.asarray([0.2, 0.5]), np.asarray([0.1, 0.9])
    exact_dx = np.exp(-t) * 3 * np.cos(3 * x) * np.cos(2 * y)
    assert np.allclose(np.asarray(wrapped(t, x, y, d=(0, 1, 0))), exact_dx, rtol=1e-8)
    exact_dt = -np.exp(-t) * np.sin(3 * x) * np.cos(2 * y)
    assert np.allclose(np.asarray(wrapped(t, x, y, d=(1, 0, 0))), exact_dt, rtol=1e-8)
    exact_lap = -(9 + 4) * np.exp(-t) * np.sin(3 * x) * np.cos(2 * y)
    assert np.allclose(np.asarray(wrapped(t, x, y, op="lap")), exact_lap, rtol=1e-4)
    with pytest.raises(ValueError):
        wrapped(t, x, y, d=(2, 1, 0))
    with pytest.raises(ValueError):
        wrapped(t, x, y, op="curl")


def test_mms_case_from_analytic():
    g = make_uniform_grid(4, 4)
    model = Model02(default_model_consts)
    f = lambda t, x, y: (1 + t) * x * y
    case = MMSCaseFromAnalytic(
        model, grid=g, cp_base=f, T_base=f, cl_base=f, cd_base=f, cs_base=f
    )
    xx, yy = g.xx, g.yy
    assert np.allclose(
        np.asarray(case.dt_cp(0.5, xx, yy)), np.asarray(xx) * np.asarray(yy), rtol=1e-7
    )
    # FD Laplacian with eps=1e-6 carries ~1e-4 roundoff noise (1e-16/eps²)
    assert np.allclose(np.asarray(case.lap_T(0.5, xx, yy)), 0.0, atol=5e-4)


def test_separable_evaluation_matches_full_path():
    """The separable Σ f_k(t)·g_k(x,y) fast path (CPU default; see
    _use_separable) must agree with the full-grid lambdified evaluation to
    rounding for every pack key, for scalar AND (1,1)-shaped t (the
    traced-dt ladder convention — regression for a broadcast crash), and
    must preserve EXACT zeros of factored boundary terms (no sympy.expand:
    x(1-x)y(1-y) must evaluate to exactly 0 on the boundary or
    Heaviside(cs) flips at zero-crossing nodes)."""
    import os

    import jax.numpy as jnp
    import numpy as np

    from na_dd_tpu.harness.studies import study_consts
    from na_dd_tpu.mms import cases as mms_cases
    from na_dd_tpu.models import Model02
    from na_dd_tpu.ops import make_uniform_grid

    g = make_uniform_grid(8, 8)
    case = mms_cases.MMSCaseCsZeroCrossing(
        grid=g, model=Model02(study_consts("pol"))
    )
    for t in (0.9, jnp.full((1, 1), 0.9)):
        for key in ("base", "dt", "lap"):
            fn = case.pack("cs")[key]
            os.environ["NA_DD_TPU_SEPARABLE"] = "1"
            try:
                v_sep = np.asarray(fn(t, g.xx, g.yy))
            finally:
                os.environ["NA_DD_TPU_SEPARABLE"] = "0"
            v_full = np.asarray(fn(t, g.xx, g.yy))
            os.environ.pop("NA_DD_TPU_SEPARABLE", None)
            np.testing.assert_allclose(v_sep, v_full, rtol=1e-12, atol=1e-15)
    # factored boundary zeros survive the split exactly
    os.environ["NA_DD_TPU_SEPARABLE"] = "1"
    try:
        cs = np.asarray(case.pack("cs")["base"](0.9, g.xx, g.yy))
    finally:
        os.environ.pop("NA_DD_TPU_SEPARABLE", None)
    assert (cs[0, :] == 0).all() and (cs[-1, :] == 0).all()
    assert (cs[:, 0] == 0).all() and (cs[:, -1] == 0).all()
