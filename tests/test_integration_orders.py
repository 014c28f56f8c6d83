"""Integrator order tests (port of tests/test_time_integration_fwd_euler_full_p1base.py,
tests/test_isolated_correctors_cp_cs.py, tests/test_reghcstriple_system.py —
reduced ladders for CI runtime):

* forward Euler: temporal order 1 (cmp 'equal');
* PC-RegHCs: temporal order 2 on a fixed grid;
* isolated cp/cs correctors with exact (T, cl, cd) at t1: temporal order 2;
* PC beats FE at equal dt.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from na_dd_tpu.core import FieldRegHCsTriple, MMSForcingRegHCsTriple
from na_dd_tpu.harness import MMSTrial, calculate_observed_rates, RateStatus
from na_dd_tpu.harness.rates import observed_rates_report
from na_dd_tpu.integrators import ForwardEulerIntegrator, PCTrapezoidalRegHCsTriple
from na_dd_tpu.mms import state_from_mms_when
from na_dd_tpu.mms.cases import MMSCaseExpSin
from na_dd_tpu.models import Model02, default_model_consts
from na_dd_tpu.ops import LOCAL_OPS, inner_products, make_uniform_grid

MC = default_model_consts._replace(
    K1=1e-3, K2=1e-3, K3=1e-3, K4=1e-3, Dl_max=1e-5, Kd=1e-2, Sd=1.0, Dd_max=1e-6
)
ETA = 50.0
OPS = LOCAL_OPS


def _trial(grid, model, integrator_cls, integrator_params=None):
    return MMSTrial(
        grid,
        model,
        MMSCaseExpSin,
        FieldRegHCsTriple,
        MMSForcingRegHCsTriple,
        integrator_cls,
        forcing_terms_params=dict(regularization_factor=ETA),
        field_params=dict(regularization_factor=ETA),
        integrator_params=integrator_params or {},
    )


@pytest.fixture(scope="module")
def model():
    return Model02(MC)


def test_forward_euler_temporal_order_1(model):
    """Self-convergence in dt (the MMS error at N=8 is dominated by the O(h²)
    spatial floor, so we measure against a 16x-finer-dt FE run on the same
    grid, which cancels the spatial error exactly)."""
    from na_dd_tpu.mms import state_from_mms_when

    grid = make_uniform_grid(8, 8)
    trial = _trial(grid, model, ForwardEulerIntegrator)
    integ = trial.integrator
    Tf = 0.01

    def final_state(dt):
        import math

        n = math.ceil(Tf / dt)
        dt_adj = Tf / n
        s = trial.initial_state
        t = 0.0
        for _ in range(n):
            s = integ.step(s, t0=t, dt=dt_adj)
            t += dt_adj
        return s

    ref = final_state(2e-3 / 16)
    errors = []
    for k in range(3):
        dt = 2e-3 / 2**k
        s = final_state(dt)
        errors.append(float(inner_products.norm_H(OPS, grid, s.T - ref.T)))
    # e(dt) ~ C dt  ->  successive ratios ~ 2 (allowing the dt_ref bias)
    r1 = np.log2(errors[0] / errors[1])
    r2 = np.log2(errors[1] / errors[2])
    assert abs(r1 - 1.0) < 0.3, (errors, r1, r2)
    assert abs(r2 - 1.0) < 0.35, (errors, r1, r2)


def test_pc_temporal_order_2(model):
    grid = make_uniform_grid(16, 16)
    trial = _trial(
        grid,
        model,
        PCTrapezoidalRegHCsTriple,
        dict(regularization_factor=ETA, num_newton_steps=3),
    )
    errors = []
    for k in range(4):
        dt = 1e-2 / 2**k
        errors.append(trial.run_for_errors(Tf=0.02, dt=dt).overall_combined_error)
    rates = calculate_observed_rates(errors)
    assert rates[-1][1] == RateStatus.OK
    assert rates[-1][0] >= 1.7, f"temporal order too low: {rates}"


def test_pc_beats_forward_euler(model):
    """At equal dt the 2nd-order PC error must be well below the FE error
    (reference tests/test_reghcstriple_system.py:419-483)."""
    grid = make_uniform_grid(8, 8)
    dt = 1e-3
    err_fe = _trial(grid, model, ForwardEulerIntegrator).run_for_errors(
        Tf=0.01, dt=dt
    ).overall_combined_error
    err_pc = _trial(
        grid, model, PCTrapezoidalRegHCsTriple, dict(regularization_factor=ETA)
    ).run_for_errors(Tf=0.01, dt=dt).overall_combined_error
    assert err_pc < err_fe


def test_isolated_cp_cs_correctors_temporal_order_2(model):
    """Feed the correctors the *exact* (T, cl, cd) at t1; cp/cs errors after
    one corrected step must converge at order 2 in dt
    (reference tests/test_isolated_correctors_cp_cs.py)."""
    grid = make_uniform_grid(12, 12)
    case = MMSCaseExpSin(grid, model=model)
    forcing = MMSForcingRegHCsTriple(mms_case=case, model=model, regularization_factor=ETA)
    field = FieldRegHCsTriple(grid=grid, model=model, forcing=forcing, regularization_factor=ETA)
    integ = PCTrapezoidalRegHCsTriple(
        field, regularization_factor=ETA, num_newton_iterations=100, consec_xs_rtol=1e-14
    )
    t0 = 0.1
    s0 = state_from_mms_when(mms_case=case, t=t0, grid=grid)

    errs_cp, errs_cs = [], []
    for k in range(4):
        dt = 4e-2 / 2**k
        t1 = t0 + dt
        exact1 = state_from_mms_when(mms_case=case, t=t1, grid=grid)
        cp1 = integ.corrector_cp_step(
            grid, OPS, exact1.T, exact1.cl, exact1.cd, at_t0=s0, t0=t0, dt=dt
        )
        cs1, _ = integ.corrector_cs_step(
            grid, OPS, exact1.T, exact1.cl, exact1.cd, at_t0=s0, t0=t0, dt=dt
        )
        errs_cp.append(float(inner_products.norm_H(OPS, grid, cp1 - exact1.cp)))
        errs_cs.append(float(inner_products.norm_H(OPS, grid, cs1 - exact1.cs)))

    # single-step local error of a 2nd-order corrector is O(dt^3)
    for name, errs in [("cp", errs_cp), ("cs", errs_cs)]:
        rates = calculate_observed_rates(errs)
        assert rates[-1][0] >= 2.5, f"{name} corrector order: {rates} / {errs}"
