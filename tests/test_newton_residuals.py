"""Newton residual tests (reference tests/test_newton_residuals.py:42-54):
after each PC step with 5 Newton sweeps, the trapezoidal residuals
G(u1) - Y0 for T, cl, cd must be below 1e-9 in H-norm, at step 1 and step 20,
across the reference's full 11-MMS-case matrix and all three reaction
variants (the reference parametrizes CsTriple and HCsTriple; we add RegHCs,
the paper's headline scheme, on top)."""

import pytest

from na_dd_tpu.core import (
    FieldCsTriple,
    FieldHCsTriple,
    FieldRegHCsTriple,
    MMSForcingCsTriple,
    MMSForcingHCsTriple,
    MMSForcingRegHCsTriple,
)
from na_dd_tpu.integrators import (
    PCTrapezoidalCsTriple,
    PCTrapezoidalHCsTriple,
    PCTrapezoidalRegHCsTriple,
)
from na_dd_tpu.mms import state_from_mms_when
from na_dd_tpu.mms import cases as mc
from na_dd_tpu.models import Model02, default_model_consts
from na_dd_tpu.ops import LOCAL_OPS, inner_products, make_uniform_grid

# Reference general_solver_config (tests/test_newton_residuals.py:19-21).
MC = default_model_consts._replace(
    K1=1e-2, K2=1e-2, K3=1e-2, K4=1e-2, DT=1e-3, Kd=1e-3, Sd=10.0
)
RESIDUAL_TOL = 1e-9
ETA = 50.0

# The reference's 11-case matrix (tests/test_newton_residuals.py:42-54).
CASES = [
    mc.MMSCasePol,
    mc.MMSCaseExpSin,
    mc.MMSCaseCsZeroCrossing,
    mc.MMSCaseSlowlyChangingPeaks,
    mc.MMSCaseStiffExpDecay,
    mc.MMSCaseSlowlyChangingPeaks_Slow1e1,
    mc.MMSCaseSlowlyChangingPeaks_Slow1e4,
    mc.MMSCaseSlowlyChangingPeaks_Slow1e16,
    mc.MMSCaseSlowlyChangingPeaks_Fast1e1,
    mc.MMSCaseSlowlyChangingPeaks_Fast1e4,
    mc.MMSCaseSlowlyChangingPeaks_Fast1e8,
]
VARIANTS = ["cs", "hcs", "reg"]


def _build(case_cls, variant, grid, model):
    case = case_cls(grid, model=model)
    if variant == "cs":
        forcing = MMSForcingCsTriple(mms_case=case, model=model)
        field = FieldCsTriple(grid=grid, model=model, forcing=forcing)
        integ = PCTrapezoidalCsTriple(field, num_newton_steps=5)
    elif variant == "hcs":
        forcing = MMSForcingHCsTriple(mms_case=case, model=model)
        field = FieldHCsTriple(grid=grid, model=model, forcing=forcing)
        integ = PCTrapezoidalHCsTriple(field, num_newton_steps=5)
    else:
        forcing = MMSForcingRegHCsTriple(mms_case=case, model=model, regularization_factor=ETA)
        field = FieldRegHCsTriple(grid=grid, model=model, forcing=forcing, regularization_factor=ETA)
        integ = PCTrapezoidalRegHCsTriple(field, num_newton_steps=5, regularization_factor=ETA)
    return case, integ


@pytest.mark.parametrize("variant", VARIANTS)
@pytest.mark.parametrize("case_cls", CASES, ids=lambda c: c.__name__)
def test_newton_residuals_small(case_cls, variant):
    grid = make_uniform_grid(8, 8)
    model = Model02(MC)
    case, integ = _build(case_cls, variant, grid, model)
    s = state_from_mms_when(mms_case=case, t=0.0, grid=grid)
    dt = 1e-4
    t = 0.0
    for step in range(20):
        s = integ.step(s, t0=t, dt=dt)
        t += dt
        if step in (0, 19):
            for var in ("T", "cl", "cd"):
                r = integ.last_residual[var]
                rn = float(inner_products.norm_H(LOCAL_OPS, grid, r))
                assert rn < RESIDUAL_TOL, (
                    f"{case_cls.__name__}/{variant}: residual {var}={rn:.2e} at step {step + 1}"
                )
