"""η-parametrized RegHCs scenario sweep.

Counterpart of the reference's `tests/test_reghcstriple.py:200-510`: the
regularization factor η must be a *swept* parameter of the unit suite, not
only of the end-to-end studies.  For η ∈ {10, 50, 100} (the reference's
REGULARIZATION_FACTORS) on the ExpSin case:

* applying the semi-discrete field to the exact solution approximates the
  exact temporal derivative of every variable (consistency);
* the FT consistency error converges at spatial order ≥ 2 across grids;
* one forward-Euler and one predictor-corrector step from the exact state
  stay within the reference's accuracy envelopes;
* single-step forward Euler shows temporal order exactly 1.

Constants follow the reference scenario (test_reghcstriple.py:16-36): the
pol/peaks-style diffusion maxima with Kd=1e-4, Sd=10 — a *different* corner
of parameter space than the other test files deliberately.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from na_dd_tpu.core import FieldRegHCsTriple, MMSForcingRegHCsTriple
from na_dd_tpu.harness.rates import observed_rates_report
from na_dd_tpu.integrators import ForwardEulerIntegrator, PCTrapezoidalRegHCsTriple
from na_dd_tpu.mms import state_from_mms_when
from na_dd_tpu.mms.cases import MMSCaseExpSin
from na_dd_tpu.models import Model02, ModelConsts
from na_dd_tpu.ops import LOCAL_OPS, inner_products, make_uniform_grid

OPS = LOCAL_OPS
_EA, _R0 = 1.60217662e-19, 8.3144621
MC = ModelConsts(
    R0=_R0,
    Ea=_EA,
    K1=1e-2,
    K2=1e-2,
    K3=1e-2,
    K4=1e-2,
    DT=1e-3,
    Dl_max=8.01e-4,
    phi_l=1e-5,
    gamma_T=1e-9,
    Kd=1e-4,
    Sd=10.0,
    Dd_max=2.46e-6,
    phi_d=1e-5,
    phi_T=_EA / _R0,
    r_sp=5e-2,
    T_ref=300.0,
)
ETAS = [10.0, 50.0, 100.0]
VARS = ("cp", "T", "cl", "cd", "cs")

_cache = {}


def _setup(eta, N):
    """(grid, mms, field) for this (η, N) — memoized: the SymPy→JAX pack is
    the expensive part and is reusable across the tests of this file."""
    key = (eta, N)
    if key not in _cache:
        grid = make_uniform_grid(N, N)
        model = Model02(MC)
        mms = MMSCaseExpSin(grid, model=model)
        forcing = MMSForcingRegHCsTriple(
            mms_case=mms, model=model, regularization_factor=eta
        )
        field = FieldRegHCsTriple(
            grid=grid, model=model, forcing=forcing, regularization_factor=eta
        )
        _cache[key] = (grid, mms, field)
    return _cache[key]


def _field_consistency_errors(eta, N, t):
    """max-interior |F_v(exact(t)) − ∂t v_exact(t)| per variable."""
    grid, mms, field = _setup(eta, N)
    s = state_from_mms_when(mms_case=mms, t=t, grid=grid)
    F = field.all_fields(grid, OPS, s, t)
    errs = {}
    for v in VARS:
        exact_dt = getattr(mms, f"dt_{v}")(t, grid.xx, grid.yy)
        d = np.abs(np.asarray(getattr(F, v)) - np.asarray(exact_dt))
        errs[v] = float(d[1:-1, 1:-1].max())
    return errs


@pytest.mark.parametrize("eta", ETAS)
def test_field_temporal_derivative_approximation(eta):
    """Reference tests/test_reghcstriple.py:167-226 (finest-grid gate)."""
    errs = _field_consistency_errors(eta, N=32, t=0.1)
    for v, e in errs.items():
        assert np.isfinite(e), f"{v} consistency error not finite (eta={eta})"
        assert e < 1e-2, f"{v} consistency error too large: {e:.2e} (eta={eta})"


@pytest.mark.parametrize("eta", ETAS)
def test_field_consistency_spatial_order_2(eta):
    """Reference tests/test_reghcstriple.py:277-333: FT consistency error
    drops at least at order 2 under grid refinement, for every η."""
    errors = [_field_consistency_errors(eta, N, t=0.1)["T"] for N in (8, 16, 32, 64)]
    observed_rates_report(errors, expected_rate=2.0, tolerance=0.3, cmp_type="least")


@pytest.mark.parametrize("eta", ETAS)
def test_one_step_forward_euler(eta):
    """Reference tests/test_reghcstriple.py:339-385 (finest grid, small dt)."""
    grid, mms, field = _setup(eta, N=32)
    t0, dt = 0.05, 2.5e-4
    s0 = state_from_mms_when(mms_case=mms, t=t0, grid=grid)
    s1 = ForwardEulerIntegrator(field).step(s0, t0=t0, dt=dt)
    exact1 = state_from_mms_when(mms_case=mms, t=t0 + dt, grid=grid)
    for v in VARS:
        d = np.abs(np.asarray(getattr(s1, v)) - np.asarray(getattr(exact1, v)))
        assert d[1:-1, 1:-1].max() < 1e-2, f"FE step error too large for {v} (eta={eta})"


@pytest.mark.parametrize("eta", ETAS)
def test_one_step_pc(eta):
    """Reference tests/test_reghcstriple.py:390-437."""
    grid, mms, field = _setup(eta, N=32)
    t0, dt = 0.05, 1e-3
    integ = PCTrapezoidalRegHCsTriple(
        field,
        regularization_factor=eta,
        num_pc_steps=1,
        num_newton_steps=1,
        num_newton_iterations=5,
        consec_xs_rtol=1e-6,
        krylov_unroll=16,
        track_residuals=False,
    )
    s0 = state_from_mms_when(mms_case=mms, t=t0, grid=grid)
    s1 = integ.step(s0, t0=t0, dt=dt)
    exact1 = state_from_mms_when(mms_case=mms, t=t0 + dt, grid=grid)
    for v in VARS:
        d = np.abs(np.asarray(getattr(s1, v)) - np.asarray(getattr(exact1, v)))
        assert d[1:-1, 1:-1].max() < 1e-2, f"PC step error too large for {v} (eta={eta})"


@pytest.mark.parametrize("eta", ETAS)
def test_forward_euler_single_step_temporal_order_1(eta):
    """Reference tests/test_reghcstriple.py:441-507: the H-norm T error of a
    single FE step is EXACTLY first order in dt (cmp_type="equal")."""
    grid, mms, field = _setup(eta, N=32)
    integ = ForwardEulerIntegrator(field)
    t0 = 0.1
    errors = []
    for k in range(4):
        dt = 1e-3 / 2**k
        s0 = state_from_mms_when(mms_case=mms, t=t0, grid=grid)
        s1 = integ.step(s0, t0=t0, dt=dt)
        exact1 = state_from_mms_when(mms_case=mms, t=t0 + dt, grid=grid)
        err = inner_products.norm_H(OPS, grid, jnp.asarray(s1.T) - jnp.asarray(exact1.T))
        errors.append(float(err))
    observed_rates_report(errors, expected_rate=1.0, tolerance=0.15, cmp_type="equal")
