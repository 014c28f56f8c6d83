"""Newton residual tests (port of tests/test_newton_residuals.py): after each
PC step with 5 Newton sweeps, the trapezoidal residuals G(u1) - Y0 must be
below 1e-9 in H-norm, across MMS cases × reaction variants, after 1 and after
20 steps."""

import numpy as np
import pytest

from na_dd_tpu.core import (
    FieldCsTriple,
    FieldRegHCsTriple,
    MMSForcingCsTriple,
    MMSForcingRegHCsTriple,
)
from na_dd_tpu.integrators import PCTrapezoidalCsTriple, PCTrapezoidalRegHCsTriple
from na_dd_tpu.mms import state_from_mms_when
from na_dd_tpu.mms.cases import (
    MMSCaseCsZeroCrossing,
    MMSCaseExpSin,
    MMSCasePol,
    MMSCaseStiffExpDecay,
)
from na_dd_tpu.models import Model02, default_model_consts
from na_dd_tpu.ops import LOCAL_OPS, inner_products, make_uniform_grid

MC = default_model_consts._replace(K1=2e-2, Kd=2e-8)
RESIDUAL_TOL = 1e-9
ETA = 50.0

CASES = [MMSCasePol, MMSCaseExpSin, MMSCaseStiffExpDecay, MMSCaseCsZeroCrossing]
VARIANTS = ["cs", "reg"]


def _build(case_cls, variant, grid, model):
    case = case_cls(grid, model=model) if case_cls is not MMSCasePol else case_cls(grid, model=model)
    if variant == "cs":
        forcing = MMSForcingCsTriple(mms_case=case, model=model)
        field = FieldCsTriple(grid=grid, model=model, forcing=forcing)
        integ = PCTrapezoidalCsTriple(field, num_newton_steps=5)
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
