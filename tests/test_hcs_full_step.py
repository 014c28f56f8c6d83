"""Full-step HCsTriple integrator test with a zero-crossing cs-ramp MMS.

Port of reference tests/test_time_integrator_hcs_triple_full_step.py:135-283:
manufactured solution with cp=T=cl=cd ≡ 0 and cs(t,x,y) = (c0 + slope·t)·
x(1-x)y(1-y), one PC step, parametrized over the five sign regimes of the
ramp (stays positive / hits zero / crosses negative / stays negative /
starts at zero).  The zero solutions must stay zero to near machine
precision — any leak from the sharp-Heaviside cs dynamics into the T/cl/cd
Newton solves or mis-assembled forcing shows up here — and cs must track the
exact ramp through its sign change.
"""

import numpy as np
import pytest
import sympy

from na_dd_tpu.core import FieldHCsTriple, MMSForcingHCsTriple
from na_dd_tpu.integrators import PCTrapezoidalHCsTriple
from na_dd_tpu.mms import state_from_mms_when
from na_dd_tpu.mms.engine import MMSCaseSymbolic, t_sym, x_sym, y_sym
from na_dd_tpu.models import Model01, ModelConsts
from na_dd_tpu.ops import make_uniform_grid

# Distinct constants, as in the reference test (its *_fs block)
MC_FS = ModelConsts(
    R0=8.3144621,
    Ea=1.60217662e-19,
    K1=1.22e-2,
    K2=1.32e-2,
    K3=1.42e-2,
    K4=1.52e-2,
    DT=1.22e-3,
    Dl_max=8.22e-4,
    phi_l=1.22e-5,
    gamma_T=1.22e-9,
    Kd=1.22e-8,
    Sd=15.0,
    Dd_max=2.62e-6,
    phi_d=1.22e-5,
    phi_T=1.60217662e-19 / 8.3144621,
    r_sp=5.22e-2,
    T_ref=303.0,
)


@pytest.mark.parametrize(
    "cs_initial_val, cs_slope, atol_cs",
    [
        (1.0, -0.5, 1e-12),  # stays positive
        # knife edge: cs(t1) = 0.1 - 10*0.01 EXACTLY.  numpy rounds the
        # subtraction to 0.0 (H -> 0) but XLA's fused form evaluates it to
        # ~2e-17 > 0 (H -> 1), so the sharp-Heaviside forcing term differs
        # by Kd*Sd at t1 and cs1 shifts by dt*R/2 ~ 9.2e-10 — a measure-zero
        # sensitivity of the discontinuous H, bounded here by dt*Kd*Sd.
        (0.1, -10.0, 2e-9),
        (0.1, -15.0, 1e-12),  # crosses negative
        (-0.2, -0.5, 1e-12),  # stays negative
        (0.0, -5.0, 1e-12),  # starts at zero, goes negative
    ],
)
def test_hcs_single_step_with_cs_ramp(cs_initial_val, cs_slope, atol_cs):
    dt, t0 = 0.01, 0.0
    grid = make_uniform_grid(4, 4)
    model = Model01(MC_FS)

    zero = sympy.S(0)
    profile = x_sym * (1 - x_sym) * y_sym * (1 - y_sym)
    cs_expr = (sympy.Float(cs_initial_val) + sympy.Float(cs_slope) * t_sym) * profile
    case = MMSCaseSymbolic(
        grid=grid,
        model=model,
        cp_sym_expr=zero,
        T_sym_expr=zero,
        cl_sym_expr=zero,
        cd_sym_expr=zero,
        cs_sym_expr=cs_expr,
    )
    forcing = MMSForcingHCsTriple(mms_case=case, model=model)
    field = FieldHCsTriple(grid=grid, model=model, forcing=forcing)
    integ = PCTrapezoidalHCsTriple(field, num_pc_steps=1, num_newton_steps=1)

    s0 = state_from_mms_when(mms_case=case, t=t0, grid=grid)
    s1 = integ.step(s0, t0=t0, dt=dt)
    t1 = t0 + dt

    xx, yy = grid.xx, grid.yy
    # zero fields must remain zero to near machine precision
    for name in ("cp", "T", "cl", "cd"):
        np.testing.assert_allclose(
            np.asarray(getattr(s1, name)),
            np.asarray(getattr(case, name)(t1, xx, yy)),
            rtol=1e-8,
            atol=1e-12,
            err_msg=f"{name} after 1 step mismatch at t={t1}",
        )
    # cs tracks the exact ramp through the sign change
    np.testing.assert_allclose(
        np.asarray(s1.cs),
        np.asarray(case.cs(t1, xx, yy)),
        rtol=1e-6,
        atol=atol_cs,
        err_msg=f"cs after 1 step mismatch at t={t1}",
    )
