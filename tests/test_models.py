"""Model coefficient tests: values, analytic derivatives, the Dd T=0 limit,
and the Model02 temperature shift (reference DefaultModel01/02 semantics)."""

import numpy as np
import jax
import jax.numpy as jnp
import sympy
import pytest

from na_dd_tpu.models import Model01, Model02, ModelConsts, default_model_consts

MC = default_model_consts._replace(phi_T=2.5, Dd_max=1.3, phi_d=0.7, Dl_max=2.0, phi_l=0.3)


@pytest.fixture
def m1():
    return Model01(MC)


@pytest.fixture
def m2():
    return Model02(MC)


def test_dl_values_and_derivatives(m1):
    cp = jnp.asarray(np.random.RandomState(0).rand(4, 5))
    d0 = np.asarray(m1.Dl(cp))
    assert np.allclose(d0, MC.Dl_max * np.exp(-MC.phi_l * np.asarray(cp)))
    for d in (1, 2):
        dd = np.asarray(m1.Dl(cp, d=d))
        assert np.allclose(dd, ((-MC.phi_l) ** d) * d0)


def test_dl_symbolic_matches_numeric(m1):
    x = sympy.symbols("x", positive=True)
    for d in (0, 1, 2):
        expr = m1.Dl(x, d=d)
        f = sympy.lambdify(x, expr, "numpy")
        pts = np.linspace(0.1, 2.0, 7)
        num = np.asarray(m1.Dl(jnp.asarray(pts), d=d))
        assert np.allclose(f(pts), num, rtol=1e-13)


def test_v1_v2(m1):
    T = jnp.asarray(np.linspace(-1, 3, 6))
    assert np.allclose(np.asarray(m1.V1(T)), MC.gamma_T * np.asarray(T))
    assert np.allclose(np.asarray(m1.V1(T, d=1)), MC.gamma_T)
    assert np.allclose(np.asarray(m1.V1(T, d=2)), 0.0)
    assert np.allclose(np.asarray(m1.V2(T)), 0.0)
    x = sympy.symbols("x")
    assert m1.V2(x) == 0
    assert m1.V1(x, d=1) == MC.gamma_T


def test_dd_values_and_partials(m1):
    rng = np.random.RandomState(1)
    cp = rng.rand(5, 5)
    T = rng.rand(5, 5) + 0.5
    base = MC.Dd_max * np.exp(-MC.phi_d * cp) * np.exp(-MC.phi_T / T)
    assert np.allclose(np.asarray(m1.Dd(jnp.asarray(cp), jnp.asarray(T))), base)
    assert np.allclose(
        np.asarray(m1.Dd(jnp.asarray(cp), jnp.asarray(T), d=(1, 0))),
        -MC.phi_d * base,
    )
    assert np.allclose(
        np.asarray(m1.Dd(jnp.asarray(cp), jnp.asarray(T), d=(0, 1))),
        base * MC.phi_T / T**2,
    )


def test_dd_zero_temperature_limit(m1):
    cp = jnp.asarray([0.1, 0.5, 1.0])
    T = jnp.asarray([0.0, 0.0, 2.0])
    for d in [(0, 0), (1, 0), (0, 1)]:
        out = np.asarray(m1.Dd(cp, T, d=d))
        assert np.isfinite(out).all()
        assert out[0] == 0.0 and out[1] == 0.0


def test_dd_zero_temperature_grad_safe(m1):
    """The where-guard must keep AD finite at T=0 (used by jax.linearize)."""
    f = lambda T: jnp.sum(m1.Dd(jnp.ones_like(T), T))
    gr = jax.grad(f)(jnp.asarray([0.0, 1.0]))
    assert np.isfinite(np.asarray(gr)).all()


def test_model02_shift(m2, m1):
    rng = np.random.RandomState(2)
    cp = jnp.asarray(rng.rand(3, 3))
    T = jnp.asarray(rng.rand(3, 3))
    assert np.allclose(
        np.asarray(m2.Dd(cp, T)), np.asarray(m1.Dd(cp, T + MC.T_ref))
    )
    # symbolic path agrees with numeric evaluation
    cps, Ts = sympy.symbols("cps Ts", positive=True)
    expr = m2.Dd(cps, Ts)
    f = sympy.lambdify((cps, Ts), expr, "numpy")
    assert np.allclose(f(np.asarray(cp), np.asarray(T)), np.asarray(m2.Dd(cp, T)))


def test_with_changes(m1):
    m = m1.with_changes(K1=123.0)
    assert m.K1 == 123.0
    assert m1.K1 == MC.K1
    assert m.copy().K1 == 123.0
    assert isinstance(m.consts(), ModelConsts)
