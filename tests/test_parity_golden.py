"""Parity gate vs the reference implementation.

Golden values obtained by running the reference
(phao/NA-nonlinear-temperature-enhanced-diffusion-model-DD, src/) on this
machine with the ExpSin RegHCs notebook protocol (study constants from
MMSCaseExpSin_reghcstriple_convergence_study.ipynb cell 3; spatial ladder,
Tf=0.01, dt=h^1.5, eta=50).  BASELINE.md gate: <= 1e-8 relative deviation.
"""

import numpy as np
import pytest

from na_dd_tpu.core import FieldRegHCsTriple, MMSForcingRegHCsTriple
from na_dd_tpu.harness import MMSTrial, calculate_observed_rates
from na_dd_tpu.integrators import PCTrapezoidalRegHCsTriple
from na_dd_tpu.mms.cases import MMSCaseExpSin
from na_dd_tpu.models import Model02, ModelConsts
from na_dd_tpu.ops import make_uniform_grid

# Study constants (notebook cell 3)
STUDY_MC = ModelConsts(
    R0=8.3144621,
    Ea=1.60217662e-19,
    K1=1e-3,
    K2=1e-3,
    K3=1e-3,
    K4=1e-3,
    DT=1e-3,
    Dl_max=1e-5,
    phi_l=1e-5,
    gamma_T=1e-9,
    Kd=1e-2,
    Sd=1.0,
    Dd_max=1e-6,
    phi_d=1e-5,
    phi_T=1.60217662e-19 / 8.3144621,
    r_sp=5e-2,
    T_ref=300.0,
)

# overall_combined_error from the reference run (16 significant digits)
GOLDEN = {
    2: 1.9426528299885707e-05,
    4: 5.1970566249110085e-06,
    8: 1.3226959686374811e-06,
    16: 3.3722488132093435e-07,
}

PARITY_RTOL = 1e-8


def test_cstriple_expsin_parity():
    """CsTriple variant golden values (reference run, dt=2e-3, Tf=0.01)."""
    from na_dd_tpu.core import FieldCsTriple, MMSForcingCsTriple
    from na_dd_tpu.integrators import PCTrapezoidalCsTriple

    golden = {8: 1.3027694406570663e-06, 16: 3.2704272907552362e-07}
    model = Model02(STUDY_MC)
    for N, ref in golden.items():
        trial = MMSTrial(
            make_uniform_grid(N, N), model, MMSCaseExpSin,
            FieldCsTriple, MMSForcingCsTriple, PCTrapezoidalCsTriple,
        )
        err = trial.run_for_errors(Tf=0.01, dt=2e-3).overall_combined_error
        assert abs(err - ref) / ref <= PARITY_RTOL, (N, err, ref)


def test_hcstriple_zero_crossing_parity():
    """HCs variant through a cs zero crossing (sharp Heaviside switching +
    sign-based corrector), golden from the reference (dt=1e-3, Tf=0.8)."""
    from na_dd_tpu.core import FieldHCsTriple, MMSForcingHCsTriple
    from na_dd_tpu.integrators import PCTrapezoidalHCsTriple
    from na_dd_tpu.mms.cases import MMSCaseCsZeroCrossing

    golden = 3.5029545962258690e-03
    model = Model02(STUDY_MC)
    trial = MMSTrial(
        make_uniform_grid(8, 8), model, MMSCaseCsZeroCrossing,
        FieldHCsTriple, MMSForcingHCsTriple, PCTrapezoidalHCsTriple,
    )
    err = trial.run_for_errors(Tf=0.8, dt=1e-3).overall_combined_error
    assert abs(err - golden) / golden <= PARITY_RTOL, (err, golden)


def test_nfsp_abs_gamma_parity():
    """Low-regularity |.|^gamma case (Abs derivatives + DiracDelta stub),
    golden from the reference (dt=1e-3, Tf=0.05)."""
    from na_dd_tpu.mms.cases import MMSCaseNonFullySmoothPol_cpcsH2_TclcdH3

    golden = 7.7437919308797556e-07
    model = Model02(STUDY_MC)
    trial = MMSTrial(
        make_uniform_grid(8, 8), model, MMSCaseNonFullySmoothPol_cpcsH2_TclcdH3,
        FieldRegHCsTriple, MMSForcingRegHCsTriple, PCTrapezoidalRegHCsTriple,
        forcing_terms_params=dict(regularization_factor=50.0),
        field_params=dict(regularization_factor=50.0),
        integrator_params=dict(regularization_factor=50.0),
    )
    err = trial.run_for_errors(Tf=0.05, dt=1e-3).overall_combined_error
    assert abs(err - golden) / golden <= PARITY_RTOL, (err, golden)


def test_forward_euler_parity():
    """FE end-to-end incl. boundary-forcing semantics, golden from the
    reference (dt=1e-4, Tf=0.005), overall + per-variable."""
    from na_dd_tpu.integrators import ForwardEulerIntegrator

    golden = 5.4271963227677798e-06
    per_var = {
        "cp": 9.0169225197585734e-11,
        "T": 6.4097681890801875e-07,
        "cl": 1.2030623521024432e-07,
        "cd": 5.3878692490357578e-06,
        "cs": 2.0507711164165844e-11,
    }
    model = Model02(STUDY_MC)
    trial = MMSTrial(
        make_uniform_grid(8, 8), model, MMSCaseExpSin,
        FieldRegHCsTriple, MMSForcingRegHCsTriple, ForwardEulerIntegrator,
        forcing_terms_params=dict(regularization_factor=50.0),
        field_params=dict(regularization_factor=50.0),
    )
    summary = trial.run_for_errors(Tf=0.005, dt=1e-4)
    err = summary.overall_combined_error
    assert abs(err - golden) / golden <= PARITY_RTOL, (err, golden)
    for var, ref in per_var.items():
        got = summary.per_variable_sup_errors[var]
        assert abs(got - ref) / ref <= 1e-7, (var, got, ref)


def test_remaining_case_families_parity():
    """Golden values for the other MMS case families (oscillating-time,
    slowly-changing-peaks alias, stiff exponential decay), PC-RegHCs."""
    from na_dd_tpu.mms.cases import (
        MMSCaseSlowlyChangingPeaks_Slow1e2,
        MMSCaseStiffExpDecay,
        make_MMSCasePolWithOscilatingTime_cls,
    )

    model = Model02(STUDY_MC)
    cases = [
        (
            make_MMSCasePolWithOscilatingTime_cls(ampl=0.8, speed=7.0),
            {},
            dict(Tf=0.05, dt=2e-3),
            7.7323703261406674e-05,
        ),
        (
            MMSCaseSlowlyChangingPeaks_Slow1e2,
            {},
            dict(Tf=0.02, dt=2e-3),
            1.0868065366384929e-05,
        ),
        (
            MMSCaseStiffExpDecay,
            dict(a_base=20.0),
            dict(Tf=0.05, dt=1e-3),
            8.7727711888787948e-07,
        ),
    ]
    for case_cls, case_params, run_kw, golden in cases:
        trial = MMSTrial(
            make_uniform_grid(10, 10), model, case_cls,
            FieldRegHCsTriple, MMSForcingRegHCsTriple, PCTrapezoidalRegHCsTriple,
            mms_case_params=case_params,
            forcing_terms_params=dict(regularization_factor=50.0),
            field_params=dict(regularization_factor=50.0),
            integrator_params=dict(regularization_factor=50.0),
        )
        err = trial.run_for_errors(**run_kw).overall_combined_error
        assert abs(err - golden) / golden <= PARITY_RTOL, (
            case_cls.__name__, err, golden,
        )


def test_nonuniform_grid_parity():
    """Non-uniform tensor-product grid (random spacings, seed 77) exercises
    every metric term (h_i, k_j, staggered midspacings, weights).  Golden from
    the reference (PC-RegHCs, ExpSin, dt=2e-3, Tf=0.01)."""
    import numpy as np

    from na_dd_tpu.ops import make_grid

    golden = 1.1814023749544314e-05
    rng = np.random.RandomState(77)
    x = np.sort(np.concatenate([[0.0, 1.0], rng.rand(9)]))
    y = np.sort(np.concatenate([[0.0, 1.0], rng.rand(7)]))
    model = Model02(STUDY_MC)
    trial = MMSTrial(
        make_grid(x, y), model, MMSCaseExpSin,
        FieldRegHCsTriple, MMSForcingRegHCsTriple, PCTrapezoidalRegHCsTriple,
        forcing_terms_params=dict(regularization_factor=50.0),
        field_params=dict(regularization_factor=50.0),
        integrator_params=dict(regularization_factor=50.0),
    )
    err = trial.run_for_errors(Tf=0.01, dt=2e-3).overall_combined_error
    # Non-uniform weights change the reduction association; observed absolute
    # deviation is ~2e-13 (pure summation-order noise), which on this error
    # magnitude is ~2e-8 relative — hence the slightly looser gate here.
    assert abs(err - golden) / golden <= 1e-7, (err, golden)


def test_expsin_reghcs_spatial_parity_and_order():
    model = Model02(STUDY_MC)
    errors = []
    for N, golden in GOLDEN.items():
        g = make_uniform_grid(N, N)
        trial = MMSTrial(
            g,
            model,
            MMSCaseExpSin,
            FieldRegHCsTriple,
            MMSForcingRegHCsTriple,
            PCTrapezoidalRegHCsTriple,
            forcing_terms_params=dict(regularization_factor=50.0),
            field_params=dict(regularization_factor=50.0),
            integrator_params=dict(regularization_factor=50.0),
        )
        err = trial.run_for_errors(Tf=0.01, dt=(1.0 / N) ** 1.5).overall_combined_error
        rel = abs(err - golden) / golden
        errors.append(err)
        assert rel <= PARITY_RTOL, f"N={N}: err={err:.16e} vs golden {golden:.16e} (rel {rel:.2e})"

    rates = calculate_observed_rates(errors)
    assert rates[-1][0] == pytest.approx(2.0, abs=0.35)
