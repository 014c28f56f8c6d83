"""Operator consistency (truncation error) tests — port of
tests/test_spatial_isolated_T_accuracy.py semantics, reduced ladders:

apply the discrete field operator to the *exact* MMS state and compare against
the analytic continuous operator; the H-norm of the difference must shrink at
order 2 over N in {8, 16, 32, 64}.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from na_dd_tpu.core import FieldRegHCsTriple, MMSForcingRegHCsTriple
from na_dd_tpu.harness.rates import deliverable_from_test_calculate_observed_rates
from na_dd_tpu.mms import state_from_mms_when
from na_dd_tpu.mms.cases import MMSCaseExpSin, MMSCaseSlowlyChangingPeaks_Slow1e2
from na_dd_tpu.models import Model02, default_model_consts
from na_dd_tpu.ops import LOCAL_OPS, inner_products, make_uniform_grid

OPS = LOCAL_OPS
MC = default_model_consts._replace(DT=1e-2, Dl_max=1e-3, Dd_max=1e-4)
ETA = 50.0
NS = [8, 16, 32, 64]
T_EVAL = 0.3


def _field_for(grid, model, case):
    forcing = MMSForcingRegHCsTriple(mms_case=case, model=model, regularization_factor=ETA)
    return FieldRegHCsTriple(
        grid=grid, model=model, forcing=forcing, regularization_factor=ETA
    )


# NOTE: the polynomial case is excluded on purpose — 2nd differences are exact
# on quadratics, so its truncation error is pure roundoff (no rate to observe).
@pytest.mark.parametrize(
    "case_cls",
    [MMSCaseSlowlyChangingPeaks_Slow1e2, MMSCaseExpSin],
    ids=["Peaks", "ExpSin"],
)
@pytest.mark.parametrize("component", ["FT", "Fcl", "Fcd"])
def test_field_truncation_order2(case_cls, component):
    """F_discrete(u_exact)(t) ≈ d/dt u_exact(t): since the MMS forcing makes
    the exact solution solve the semi-discrete system up to spatial truncation
    error, ||F(u_ex) - dt_u_ex||_H = O(h²)."""
    model = Model02(MC)
    errors = []
    for N in NS:
        grid = make_uniform_grid(N, N)
        case = case_cls(grid, model=model)
        field = _field_for(grid, model, case)
        s = state_from_mms_when(mms_case=case, t=T_EVAL, grid=grid)
        F = getattr(field, component)(grid, OPS, s, T_EVAL)
        dt_exact = {
            "FT": case.dt_T,
            "Fcl": case.dt_cl,
            "Fcd": case.dt_cd,
        }[component](T_EVAL, grid.xx, grid.yy)
        err = float(inner_products.norm_H(OPS, grid, F - dt_exact))
        errors.append(err)

    deliverable_from_test_calculate_observed_rates(
        name=f"{case_cls.__name__}.{component}",
        errors=errors,
        target_order=2.0,
        order_abs_tol=0.35,
        cmp_type="least",
    )
