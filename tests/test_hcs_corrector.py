"""HCs integrator corrector tests (port of tests/test_time_integrator_hcs_triple.py):
sign-based exact solve of 2x - dt R1 H(x) = Y0, case analysis on sign(Y0), the
predictor's no-clipping behavior, and the positivity ValueError."""

import numpy as np
import jax.numpy as jnp
import pytest

from na_dd_tpu.core import FieldHCsTriple, NoForcing, State
from na_dd_tpu.integrators import (
    HCsCorrectorPositivityError,
    PCTrapezoidalHCsTriple,
)
from na_dd_tpu.models import Model02, default_model_consts
from na_dd_tpu.ops import LOCAL_OPS, make_uniform_grid

OPS = LOCAL_OPS


def _setup(Kd=0.5, Sd=2.0):
    mc = default_model_consts._replace(Kd=Kd, Sd=Sd)
    grid = make_uniform_grid(5, 5)
    model = Model02(mc)
    field = FieldHCsTriple(grid=grid, model=model, forcing=NoForcing())
    integ = PCTrapezoidalHCsTriple(field)
    return grid, model, field, integ


def _const_state(grid, cp=0.0, T=0.0, cl=0.0, cd=0.0, cs=0.0):
    full = lambda v: jnp.full(grid.full_shape, float(v))
    return State(cp=full(cp), T=full(T), cl=full(cl), cd=full(cd), cs=full(cs))


@pytest.mark.parametrize("cs0", [0.4, -0.4, 0.0])
def test_corrector_sign_cases(cs0):
    """With zero forcing and constant states:
    Y0 = 2 cs0 + dt Fcs(at_t0) = 2 cs0 - dt Kd (Sd - cd0)(1 + cl0) H(cs0) on
    the interior; the solution must satisfy the case analysis
    Y0>0 -> Y0/(2 - dt R1); Y0<0 -> Y0/2; Y0=0 -> 0."""
    grid, model, field, integ = _setup()
    dt = 0.1
    cl1, cd1 = 0.3, 0.5
    at_t0 = _const_state(grid, cl=0.2, cd=0.1, cs=cs0)
    T1 = jnp.zeros(grid.full_shape)
    cl1_arr = jnp.full(grid.full_shape, cl1)
    cd1_arr = jnp.full(grid.full_shape, cd1)

    cs1, ok = integ.corrector_cs_step(
        grid, OPS, T1, cl1_arr, cd1_arr, at_t0=at_t0, t0=0.0, dt=dt
    )
    assert bool(ok)

    mc = model
    R1 = mc.Kd * (mc.Sd - cd1) * (1 + cl1)
    # interior Y0 with zero forcing
    reaction0 = mc.Kd * (mc.Sd - 0.1) * (1 + 0.2) * float(cs0 > 0)
    Y0 = 2 * cs0 - dt * reaction0
    if Y0 > 1e-12:
        expected = Y0 / (2 - dt * R1)
    elif Y0 < -1e-12:
        expected = Y0 / 2.0
    else:
        expected = 0.0
    interior = np.asarray(cs1)[1:-1, 1:-1]
    assert np.allclose(interior, expected, rtol=1e-13), (interior[0, 0], expected)
    # The reference's case analysis solves 2x - dt R1 x 1{x>0} = Y0 (the
    # docstring at prob1base.py:3386 writes H(Cs1), but Y0/(2 - dt R1) is the
    # root of the equation with x*1{x>0}; we reproduce the code, not the
    # comment).
    x = interior[0, 0]
    assert 2 * x - dt * R1 * x * float(x > 0) == pytest.approx(Y0, abs=1e-14)
    # boundary forced to zero
    assert np.all(np.asarray(cs1)[0] == 0.0)


def test_corrector_positivity_error():
    """2 - dt Kd (Sd - cd1)(1 + cl1) <= 0 must raise
    (reference tests/test_time_integrator_hcs_triple.py:403-498)."""
    grid, model, field, integ = _setup(Kd=1.0, Sd=10.0)
    dt = 0.5  # R1 = 1*10*2 = 20 -> 2 - 10 < 0
    at_t0 = _const_state(grid, cs=0.4)
    cl1 = jnp.full(grid.full_shape, 1.0)
    cd1 = jnp.zeros(grid.full_shape)
    _, ok = integ.corrector_cs_step(grid, OPS, None, cl1, cd1, at_t0=at_t0, t0=0.0, dt=dt)
    assert not bool(ok)
    with pytest.raises(HCsCorrectorPositivityError):
        integ.step(at_t0, t0=0.0, dt=dt)


def test_positivity_error_through_scanned_harness():
    """The scan-path harness (run_simulation_collect_data) must surface the
    positivity failure too — the flag rides the packed diagnostics buffer
    out of the jitted program."""
    from na_dd_tpu.harness.trial import run_simulation_collect_data

    grid, model, field, integ = _setup(Kd=1.0, Sd=10.0)
    at_t0 = _const_state(grid, cs=0.4)

    from na_dd_tpu.mms.cases import MMSCasePol

    case = MMSCasePol(grid, model=model)
    with pytest.raises(HCsCorrectorPositivityError):
        run_simulation_collect_data(
            grid=grid,
            integrator=integ,
            exact_sol_pack=case,
            initial_state=at_t0,
            Tf=1.0,
            dt=0.5,  # R1 = 20 -> 2 - dt R1 < 0
            variable_names=["cp", "T", "cl", "cd", "cs"],
            integral_vars=["T", "cl", "cd"],
        )


def test_predictor_no_clipping():
    """The Heun cs predictor must not clip negative values (only the boundary
    mask is applied; reference tests/test_time_integrator_hcs_triple.py:182-246)."""
    grid, model, field, integ = _setup()
    # cs0 < 0 with zero forcing: Fcs = -reaction = 0 where H(cs)=0 -> cs stays
    at_t0 = _const_state(grid, cl=0.2, cd=0.1, cs=-0.7)
    cs1 = integ.initial_cs_pred(grid, OPS, at_t0, 0.0, dt=0.1)
    interior = np.asarray(cs1)[1:-1, 1:-1]
    assert np.allclose(interior, -0.7)  # unchanged, not clipped to 0
    assert np.all(np.asarray(cs1)[0] == 0.0)


def test_hcs_step_runs():
    grid, model, field, integ = _setup()
    at_t0 = _const_state(grid, cp=0.1, T=0.2, cl=0.1, cd=0.1, cs=0.3)
    s1 = integ.step(at_t0, t0=0.0, dt=1e-3)
    assert np.isfinite(np.asarray(s1.cs)).all()
