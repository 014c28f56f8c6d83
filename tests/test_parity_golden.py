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
