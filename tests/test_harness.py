"""Harness tests (port of tests/test_mms_trial_utils.py): combined error norm
against hand-computed values from synthetic series, per-variable summary
semantics, dt adjustment, and the rate-status taxonomy."""

import numpy as np
import pytest

from na_dd_tpu.harness import (
    ErrorTimeSeries,
    NumericalErrorSummary,
    RateStatus,
    calculate_combined_error_norm,
    calculate_observed_rates,
)

VARS = ["cp", "T", "cl", "cd", "cs"]
IVARS = ["T", "cl", "cd"]


def _series(h_rows, g_rows, dt=0.1):
    """h_rows/g_rows: list over time of dicts var->value."""
    K = len(h_rows)
    t = dt * np.arange(K)
    h = {v: np.array([row[v] for row in h_rows]) for v in VARS}
    g = {v: np.array([row[v] for row in g_rows]) for v in VARS}
    return ErrorTimeSeries(t=t, h_norm_sq_errors=h, grad_h_norm_p_sq_errors=g)


def test_combined_norm_hand_computed():
    dt = 0.1
    h0 = dict(cp=1.0, T=2.0, cl=3.0, cd=4.0, cs=5.0)  # sum 15
    h1 = dict(cp=0.5, T=1.0, cl=1.5, cd=2.0, cs=2.5)  # sum 7.5
    g0 = dict(cp=0.0, T=2.0, cl=2.0, cd=2.0, cs=0.0)  # integrand 6
    g1 = dict(cp=0.0, T=1.0, cl=1.0, cd=1.0, cs=0.0)  # integrand 3
    series = _series([h0, h1], [g0, g1], dt)
    # k=0: 15; k=1: 7.5 + 0.5*0.1*(6+3) = 7.95 -> max 15
    assert calculate_combined_error_norm(series, dt, IVARS) == pytest.approx(np.sqrt(15.0))
    # growing case: max at the last step
    h2 = dict(cp=10.0, T=10.0, cl=10.0, cd=10.0, cs=10.0)
    series2 = _series([h0, h2], [g0, g1], dt)
    expected = 50.0 + 0.5 * dt * 9.0
    assert calculate_combined_error_norm(series2, dt, IVARS) == pytest.approx(np.sqrt(expected))


def test_combined_norm_t0_only():
    """Single-record series: no time integral at all."""
    h0 = dict(cp=1.0, T=1.0, cl=1.0, cd=1.0, cs=1.0)
    g0 = dict(cp=0.0, T=9.0, cl=9.0, cd=9.0, cs=0.0)
    series = _series([h0], [g0])
    assert calculate_combined_error_norm(series, 0.1, IVARS) == pytest.approx(np.sqrt(5.0))


def test_combined_norm_variable_restriction():
    h0 = dict(cp=1.0, T=4.0, cl=0.0, cd=0.0, cs=0.0)
    g0 = dict(cp=0.0, T=2.0, cl=0.0, cd=0.0, cs=0.0)
    series = _series([h0, h0], [g0, g0], dt=0.2)
    # only T: spatial 4, integral 0.5*0.2*(2+2)=0.4 at k=1
    val = calculate_combined_error_norm(series, 0.2, ["T"], all_variables=["T"])
    assert val == pytest.approx(np.sqrt(4.0 + 0.4))
    # zero-gradient variable: integral contributes nothing
    val_cp = calculate_combined_error_norm(series, 0.2, [], all_variables=["cp"])
    assert val_cp == pytest.approx(1.0)
    with pytest.raises(AssertionError):
        calculate_combined_error_norm(series, 0.2, ["T"], all_variables=["cp"])


def test_numerical_error_summary():
    h0 = dict(cp=1.0, T=2.0, cl=3.0, cd=4.0, cs=5.0)
    g0 = dict(cp=0.0, T=1.0, cl=1.0, cd=1.0, cs=0.0)
    series = _series([h0, h0], [g0, g0], dt=0.1)
    summ = NumericalErrorSummary(0.1, series, VARS, IVARS)
    assert summ.overall_combined_error == pytest.approx(
        np.sqrt(15.0 + 0.5 * 0.1 * 6.0)
    )
    # per-variable: only that variable's H-norm (+ its own gradient integral)
    assert summ.per_variable_sup_errors["cp"] == pytest.approx(1.0)
    assert summ.per_variable_sup_errors["T"] == pytest.approx(np.sqrt(2.0 + 0.1 * 1.0))
    assert "OverallCombinedError" in repr(summ)


def test_rate_status_taxonomy():
    rates = calculate_observed_rates([8.0, 4.0, 2.0])  # clean halving
    assert rates[0][1] == RateStatus.OK
    assert rates[0][0] == pytest.approx(1.0)

    rates = calculate_observed_rates([4.0, 2.0, 3.0])  # error increases at the end
    assert rates[0][1] == RateStatus.ERROR_INCREASING
    assert np.isnan(rates[0][0])

    rates = calculate_observed_rates([2.0, 2.0, 1.0])  # no decrease coarse->medium
    assert rates[0][1] == RateStatus.NON_POSITIVE_RATIO

    rates = calculate_observed_rates([1.0, 1.0, 1.0])  # stalled
    assert rates[0][1] in (
        RateStatus.ERROR_INCREASING,
        RateStatus.NON_POSITIVE_RATIO,
    )

    with pytest.raises(AssertionError):
        calculate_observed_rates([1.0, 0.5])  # needs >= 3 points

    # 16,4,1 -> rate log2(12/3)=2
    rates = calculate_observed_rates([16.0, 4.0, 1.0])
    assert rates[0][0] == pytest.approx(2.0)


def test_dt_adjustment_divides_exactly():
    """dt is adjusted so num_steps * dt == Tf - t0
    (reference src/mms_trial_utils.py:76-77)."""
    from na_dd_tpu.core import FieldRegHCsTriple, MMSForcingRegHCsTriple
    from na_dd_tpu.harness import run_simulation_collect_data
    from na_dd_tpu.integrators import ForwardEulerIntegrator
    from na_dd_tpu.mms import state_from_mms_when
    from na_dd_tpu.mms.cases import MMSCasePol
    from na_dd_tpu.models import Model02, default_model_consts
    from na_dd_tpu.ops import make_uniform_grid

    g = make_uniform_grid(4, 4)
    model = Model02(default_model_consts)
    case = MMSCasePol(g, model=model)
    forcing = MMSForcingRegHCsTriple(mms_case=case, model=model, regularization_factor=50.0)
    field = FieldRegHCsTriple(grid=g, model=model, forcing=forcing, regularization_factor=50.0)
    integ = ForwardEulerIntegrator(field)
    s0 = state_from_mms_when(mms_case=case, t=0.0, grid=g)
    series, dt_adj = run_simulation_collect_data(
        grid=g,
        integrator=integ,
        exact_sol_pack=case,
        initial_state=s0,
        Tf=0.01,
        dt=3e-3,  # does not divide 0.01
        variable_names=VARS,
        integral_vars=IVARS,
    )
    assert dt_adj == pytest.approx(0.01 / 4)
    assert len(series.t) == 5
    assert series.t[-1] == pytest.approx(0.01)
    assert series.h_norm_sq_errors["T"].shape == (5,)


def test_collect_tail_f32_inside_parity_gate():
    """collect_tail='f32' (norm/gradient tail of the per-step error
    collection at f32, f64 subtraction kept) must stay deep inside the 1e-8
    relative parity gate: the downcast perturbs each error element by a
    relative ~eps(f32), incoherent across the grid (measured 1.6e-9 relative
    on CPU at N=16, ~2e-9 on the TPU headline level).  Also: a no-op knob in
    an f32-ambient run (nothing narrower to downcast to)."""
    from na_dd_tpu.harness.studies import _make_trial, study_consts
    from na_dd_tpu.mms import cases as mms_cases

    t = _make_trial(
        mms_cases.MMSCasePol, 16, 50.0, mc=study_consts("pol"), krylov_unroll=8
    )
    s_ref = t.run_for_errors(Tf=0.01, dt=5e-4)
    s_tail = t.run_for_errors(Tf=0.01, dt=5e-4, collect_tail="f32")
    e_ref = float(s_ref.overall_combined_error)
    e_tail = float(s_tail.overall_combined_error)
    assert abs(e_tail - e_ref) / e_ref < 1e-7, (e_tail, e_ref)

    with pytest.raises(ValueError):
        t.run_for_errors(Tf=0.01, dt=5e-4, collect_tail="bf16")


def test_collect_precompute_matches_default():
    """collect_precompute=True moves the per-step exact-MMS evaluations out
    of the scan into one batched pre-pass (vmap over the collection times)
    and feeds the scan precomputed slices.  Same closures, same math — the
    error value must agree with the in-scan path to deep-rounding level, and
    it must compose with collect_tail."""
    from na_dd_tpu.harness.studies import _make_trial, study_consts
    from na_dd_tpu.mms import cases as mms_cases

    t = _make_trial(
        mms_cases.MMSCasePol, 16, 50.0, mc=study_consts("pol"), krylov_unroll=8
    )
    e_ref = float(
        t.run_for_errors(Tf=0.01, dt=5e-4).overall_combined_error
    )
    e_pre = float(
        t.run_for_errors(
            Tf=0.01, dt=5e-4, collect_precompute=True
        ).overall_combined_error
    )
    assert abs(e_pre - e_ref) / e_ref < 1e-10, (e_pre, e_ref)

    e_both = float(
        t.run_for_errors(
            Tf=0.01, dt=5e-4, collect_precompute=True, collect_tail="f32"
        ).overall_combined_error
    )
    assert abs(e_both - e_ref) / e_ref < 1e-7, (e_both, e_ref)
