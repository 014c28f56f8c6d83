"""Ports of three reference accuracy protocols not yet covered:

1. H¹ gradient-norm spatial order after ONE PC step, dt ~ h²
   (reference tests/test_spatial_h1_isolated_T_accuracy.py:141-171);
2. coupled T–cl Forward-Euler spatial order with CFL dt scaling
   (reference tests/test_feuler_spatial_accuracy.py:72-186);
3. Forward-Euler one-step consistency across grids {5,15,35} and start
   times t0 in {0.01, 0.05, 1, 5} with dt-scaled tolerance
   (reference tests/test_time_integration_fwd_euler_full_p1base.py:43-120).
"""

import numpy as np
import pytest
import sympy

from na_dd_tpu.core import FieldCsTriple, MMSForcingCsTriple
from na_dd_tpu.core.forcing import ForcingBase
from na_dd_tpu.harness.rates import RateStatus, calculate_observed_rates
from na_dd_tpu.harness.trial import MMSTrial
from na_dd_tpu.integrators import ForwardEulerIntegrator, PCTrapezoidalCsTriple
from na_dd_tpu.mms import MMSCaseSymbolic, state_from_mms_when
from na_dd_tpu.mms.cases import MMSCaseExpSin
from na_dd_tpu.mms.engine import t_sym, x_sym, y_sym
from na_dd_tpu.models import Model01, Model02, default_model_consts
from na_dd_tpu.ops import LOCAL_OPS, inner_products, make_uniform_grid, stencils

OPS = LOCAL_OPS
PI = sympy.pi


class _OnlyFT(ForcingBase):
    """fT from the MMS residual; every other forcing zero (reference builds
    the same via ForcingTermsFromDict, test_spatial_h1_isolated_T_accuracy.py
    :90-99)."""

    def __init__(self, mms_forcing):
        self._fT = mms_forcing.fT

    def fT(self, g, ops, t):
        return self._fT(g, ops, t)

    def fcp(self, g, ops, t):
        return g.make_full0()

    fcl = fcp
    fcd = fcp
    fcs = fcp


def test_gradient_T_spatial_convergence_one_step():
    """norm_p of the T-gradient error after one PC step (dt = 0.1 h²) must be
    O(h²): the H¹ half of the combined error functional, isolated."""
    mc = default_model_consts._replace(
        K1=0.0, K2=0.0, K3=0.0, K4=0.0, DT=1e-3, Dl_max=0.0, phi_l=0.0,
        gamma_T=0.0, Kd=0.0, Sd=0.0, Dd_max=0.0, phi_d=0.0, phi_T=0.0, r_sp=0.0,
    )
    model = Model02(mc)
    T_expr = sympy.sin(PI * x_sym) * sympy.sin(PI * y_sym) * sympy.exp(-t_sym)
    zero = sympy.S(0)

    errors = []
    for N in (8, 16, 32, 64):
        dt = 0.1 / N**2
        grid = make_uniform_grid(N, N)
        case = MMSCaseSymbolic(
            grid=grid, model=model,
            cp_sym_expr=zero, T_sym_expr=T_expr, cl_sym_expr=zero,
            cd_sym_expr=zero, cs_sym_expr=zero,
        )
        forcing = _OnlyFT(MMSForcingCsTriple(mms_case=case, model=model))
        field = FieldCsTriple(grid=grid, model=model, forcing=forcing)
        integ = PCTrapezoidalCsTriple(field, num_pc_steps=1, num_newton_steps=1)
        s0 = state_from_mms_when(mms_case=case, t=0.0, grid=grid)
        s1 = integ.step(s0, t0=0.0, dt=dt)

        gx_n, gy_n = stencils.grad_H(OPS, grid, s1.T)
        T_ex = case.T(dt, grid.xx, grid.yy)
        gx_e, gy_e = stencils.grad_H(OPS, grid, T_ex)
        err = float(inner_products.norm_p(OPS, grid, gx_n - gx_e, gy_n - gy_e))
        errors.append(err + np.finfo(float).eps)

    rates = calculate_observed_rates(errors)
    final_rate, final_status = rates[-1]
    assert final_status == RateStatus.OK, rates
    assert final_rate >= 2.0 - 0.1, f"H1 gradient order {final_rate:.3f} < 1.9 ({errors})"


def test_T_cl_coupled_feuler_spatial_convergence():
    """Coupled T–cl forward Euler with dt = CFL·h²/D_max: final H-norm errors
    of T and cl must both shrink at order 2 ± 0.2."""
    mc = default_model_consts._replace(
        K1=0.0, K2=0.0, K3=1e-3, K4=5e-3, DT=1e-3, Dl_max=8.0e-4, phi_l=0.0,
        gamma_T=1e-9, Kd=0.0, Sd=0.0, Dd_max=0.0, phi_d=0.0, phi_T=0.0, r_sp=0.0,
    )
    model = Model01(mc)
    T_expr = 10 * sympy.sin(PI * x_sym) * sympy.sin(PI * y_sym) * (1 + t_sym)
    cl_expr = (sympy.cos(PI * x_sym) ** 2 - 1) * (1 - sympy.cos(PI * y_sym) ** 2) * t_sym
    zero = sympy.S(0)
    Tf = 1e-3
    CFL = 0.1
    D_max = max(mc.DT, float(model.Dl(0.0)))

    errs_T, errs_cl = [], []
    for N in (8, 16, 32, 64):
        h = 1.0 / N
        dt = CFL * h * h / D_max
        grid = make_uniform_grid(N, N)
        case = MMSCaseSymbolic(
            grid=grid, model=model,
            cp_sym_expr=zero, T_sym_expr=T_expr, cl_sym_expr=cl_expr,
            cd_sym_expr=zero, cs_sym_expr=zero,
        )
        forcing = MMSForcingCsTriple(mms_case=case, model=model)
        field = FieldCsTriple(grid=grid, model=model, forcing=forcing)
        integ = ForwardEulerIntegrator(field)
        s = state_from_mms_when(mms_case=case, t=0.0, grid=grid)
        num_steps = int(np.ceil(Tf / dt))
        dt_adj = Tf / num_steps
        t = 0.0
        for _ in range(num_steps):
            s = integ.step(s, t0=t, dt=dt_adj)
            t += dt_adj
        errs_T.append(
            float(inner_products.norm_H(OPS, grid, s.T - case.T(Tf, grid.xx, grid.yy)))
            + np.finfo(float).eps
        )
        errs_cl.append(
            float(inner_products.norm_H(OPS, grid, s.cl - case.cl(Tf, grid.xx, grid.yy)))
            + np.finfo(float).eps
        )

    for label, errs in (("T", errs_T), ("cl", errs_cl)):
        rates = calculate_observed_rates(errs)
        final_rate, final_status = rates[-1]
        assert final_status == RateStatus.OK, (label, rates, errs)
        assert final_rate == pytest.approx(2.0, abs=0.2), (
            f"{label}: expected spatial order 2, got {final_rate:.3f} ({errs})"
        )


# Reference p1_default_model_consts_fwd_euler
# (test_time_integration_fwd_euler_full_p1base.py:19-40).
FE_MC = default_model_consts._replace(
    K1=1e-2, K2=1e-2, K3=1e-2, K4=1e-2, DT=1e-3, Dl_max=8.01e-4, phi_l=1e-5,
    gamma_T=1e-9, Kd=1e-8, Sd=10.0, Dd_max=2.46e-6, phi_d=1e-5, r_sp=5e-2,
)
# POWERS_OF_100_FE ∪ 5·POWERS_OF_100_FE of the reference (:47-48).
FE_T_STARTS = (0.01, 0.05, 1.0, 5.0)


@pytest.mark.parametrize("grid_n", (5, 15, 35))
def test_fwd_euler_one_step_consistency_across_start_times(grid_n):
    """One FE step started at t0 spanning 0.01..5 must track the exact ExpSin
    solution within atol = 100·dt (first-order consistency; catches
    t-dependent forcing bugs away from t=0)."""
    grid = make_uniform_grid(grid_n, grid_n)
    model = Model02(FE_MC)
    trial = MMSTrial(
        grid, model, MMSCaseExpSin, FieldCsTriple, MMSForcingCsTriple,
        ForwardEulerIntegrator,
    )
    max_D = max(FE_MC.DT, FE_MC.Dl_max, FE_MC.Dd_max, 1e-9)
    dt = min(1e-2, 0.5 * (1.0 / grid_n) ** 2 / (4.0 * max_D))
    for t0 in FE_T_STARTS:
        summary = trial.run_for_errors(Tf=t0 + dt, dt=dt, t0=t0)
        for var, err in summary.per_variable_sup_errors.items():
            assert err == pytest.approx(0.0, abs=100 * dt, rel=1e-3), (
                f"{var} consistency failed: err={err:.3e} N={grid_n} t0={t0} dt={dt:.2e}"
            )
