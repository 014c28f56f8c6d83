"""Adaptive time stepping (harness/simulate.simulate_adaptive).

Beyond-reference capability; contract under test:

* reaches Tf exactly (within roundoff) in a bounded number of steps;
* with an MMS forcing, the final-state error is comparable to a fixed-dt
  run whose dt matches the controller's accepted steps;
* tightening the tolerance reduces the error and increases the step count;
* the controller grows dt on smooth problems (fewer steps than dt0 would
  imply).
"""

import numpy as np
import pytest

from na_dd_tpu.core import FieldRegHCsTriple, MMSForcingRegHCsTriple
from na_dd_tpu.harness.simulate import simulate, simulate_adaptive
from na_dd_tpu.integrators import PCTrapezoidalRegHCsTriple
from na_dd_tpu.mms import state_from_mms_when
from na_dd_tpu.mms.cases import MMSCaseExpSin
from na_dd_tpu.models import Model02, default_model_consts
from na_dd_tpu.ops import LOCAL_OPS, make_uniform_grid
from na_dd_tpu.ops.inner_products import norm_H


@pytest.fixture(scope="module")
def setup():
    g = make_uniform_grid(8, 8)
    model = Model02(default_model_consts)
    case = MMSCaseExpSin(g, model=model)
    forcing = MMSForcingRegHCsTriple(mms_case=case, model=model, regularization_factor=50.0)
    field = FieldRegHCsTriple(
        grid=g, model=model, forcing=forcing, regularization_factor=50.0
    )
    integ = PCTrapezoidalRegHCsTriple(
        field, regularization_factor=50.0, track_residuals=False, krylov_unroll=8
    )
    s0 = state_from_mms_when(mms_case=case, t=0.0, grid=g)
    return g, case, integ, s0


def _state_err(g, case, s, t):
    exact = state_from_mms_when(mms_case=case, t=t, grid=g)
    return max(
        float(norm_H(LOCAL_OPS, g, a - b)) for a, b in zip(s, exact)
    )


def test_reaches_Tf_and_tracks_exact(setup):
    g, case, integ, s0 = setup
    Tf = 0.02
    s, info = simulate_adaptive(
        integ, g, s0, t0=0.0, Tf=Tf, dt0=1e-3, tol=1e-7, max_steps=5000
    )
    assert info["t"] == pytest.approx(Tf, abs=1e-12)
    assert 0 < info["steps"] < 5000
    err = _state_err(g, case, s, Tf)
    # fixed-dt reference run at a comparable average dt
    nsteps = max(info["steps"], 1)
    s_fix, _, _ = simulate(integ, g, s0, t0=0.0, dt=Tf / nsteps, num_steps=nsteps)
    err_fix = _state_err(g, case, s_fix, Tf)
    assert err <= 10 * max(err_fix, 1e-12)


def test_tolerance_controls_error_and_steps(setup):
    g, case, integ, s0 = setup
    Tf = 0.02
    _, info_loose = simulate_adaptive(
        integ, g, s0, t0=0.0, Tf=Tf, dt0=5e-4, tol=1e-4, max_steps=5000
    )
    _, info_tight = simulate_adaptive(
        integ, g, s0, t0=0.0, Tf=Tf, dt0=5e-4, tol=1e-8, max_steps=5000
    )
    assert info_tight["steps"] > info_loose["steps"]


def test_growth_on_smooth_problem(setup):
    g, _case, integ, s0 = setup
    Tf = 0.02
    dt0 = 1e-5  # deliberately tiny: the controller should grow it
    s, info = simulate_adaptive(
        integ, g, s0, t0=0.0, Tf=Tf, dt0=dt0, tol=1e-5, max_steps=10_000
    )
    assert info["steps"] < Tf / dt0 / 5  # at least 5x growth on average
    assert info["dt"] > dt0
