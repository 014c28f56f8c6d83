"""Forcing-term tests (port of tests/test_forcing_terms_hcs_triple.py
semantics): Heaviside factor inside fcs/fcd checked against the manual
residual formula with a cs-ramp MMS crossing zero; fcp/fT/fcl invariance
across the three reaction variants; fcp cell-average projection."""

import numpy as np
import jax.numpy as jnp
import pytest

from na_dd_tpu.core import (
    MMSForcingCsTriple,
    MMSForcingHCsTriple,
    MMSForcingRegHCsTriple,
    heaviside_regularized,
)
from na_dd_tpu.mms.cases import MMSCaseCsZeroCrossing, MMSCasePol
from na_dd_tpu.models import Model02, default_model_consts
from na_dd_tpu.ops import LOCAL_OPS, avg_int, make_uniform_grid

OPS = LOCAL_OPS
MC = default_model_consts._replace(Kd=0.31, Sd=2.0, K1=0.011, K2=0.012)
ETA = 50.0


@pytest.fixture(scope="module")
def setup():
    g = make_uniform_grid(6, 6)
    model = Model02(MC)
    # cs = (0.5 - t) W crosses zero at t=0.5; cp=T=cl=cd=0
    case = MMSCaseCsZeroCrossing(g, model, cs_A=0.5, cs_B=1.0)
    return g, model, case


def _forcings(case, model):
    return {
        "cs": MMSForcingCsTriple(mms_case=case, model=model),
        "hcs": MMSForcingHCsTriple(mms_case=case, model=model),
        "reg": MMSForcingRegHCsTriple(
            mms_case=case, model=model, regularization_factor=ETA
        ),
    }


@pytest.mark.parametrize("t", [0.1, 0.5, 0.9])  # before / at / after crossing
def test_fcs_manual_formula_zero_crossing(setup, t):
    g, model, case = setup
    xx, yy = g.xx, g.yy
    W = np.asarray(xx) * (1 - np.asarray(xx)) * np.asarray(yy) * (1 - np.asarray(yy))
    cs = (0.5 - t) * W
    dt_cs = -W
    # cp=T=cl=cd=0 -> reaction = Kd (Sd - 0)(1 + 0) F2(cs)/Kd
    for name, forcing in _forcings(case, model).items():
        if name == "cs":
            factor = cs
        elif name == "hcs":
            factor = (cs > 0).astype(float)
        else:
            factor = np.asarray(heaviside_regularized(jnp.asarray(cs), ETA))
        expected = dt_cs + MC.Kd * MC.Sd * factor
        got = np.asarray(forcing.fcs(g, OPS, t))
        assert np.allclose(got, expected, rtol=1e-12, atol=1e-14), name


@pytest.mark.parametrize("t", [0.1, 0.9])
def test_fcd_heaviside_factor(setup, t):
    g, model, case = setup
    xx, yy = g.xx, g.yy
    W = np.asarray(xx) * (1 - np.asarray(xx)) * np.asarray(yy) * (1 - np.asarray(yy))
    cs = (0.5 - t) * W
    # cd = 0 -> dtCd = 0, diffusion = 0; fcd = -Kd Sd * factor
    for name, forcing in _forcings(case, model).items():
        if name == "cs":
            factor = cs
        elif name == "hcs":
            factor = (cs > 0).astype(float)
        else:
            factor = np.asarray(heaviside_regularized(jnp.asarray(cs), ETA))
        expected = -MC.Kd * MC.Sd * factor
        got = np.asarray(forcing.fcd(g, OPS, t))
        assert np.allclose(got, expected, rtol=1e-12, atol=1e-14), name


def test_fcp_fT_fcl_variant_invariance():
    """fcp/fT/fcl do not involve the cs reaction and must be identical across
    the three variants (reference tests/test_forcing_terms_hcs_triple.py:265-291)."""
    g = make_uniform_grid(5, 5)
    model = Model02(MC)
    case = MMSCasePol(g, model=model)
    fs = _forcings(case, model)
    t = 0.4
    for term in ("fcp", "fT", "fcl"):
        vals = [np.asarray(getattr(f, term)(g, OPS, t)) for f in fs.values()]
        assert np.allclose(vals[0], vals[1], rtol=1e-15)
        assert np.allclose(vals[0], vals[2], rtol=1e-15)


def test_fcp_is_cell_average_of_pointwise():
    g = make_uniform_grid(5, 5)
    model = Model02(MC)
    case = MMSCasePol(g, model=model)
    forcing = MMSForcingCsTriple(mms_case=case, model=model)
    t = 0.2
    direct = np.asarray(avg_int(lambda p, q: forcing.fcp_ptwise(t, p, q), g, OPS))
    got = np.asarray(forcing.fcp(g, OPS, t))
    assert np.allclose(got, direct, rtol=1e-14)
    assert np.all(got[0] == 0) and np.all(got[:, 0] == 0)  # boundary zero


def test_forcing_residual_identity_pol():
    """For the Pol case evaluate fT by hand:
    fT = dtT - DT lapT + K3 cp T with all fields equal to W/(1+t)."""
    g = make_uniform_grid(6, 6)
    model = Model02(MC)
    case = MMSCasePol(g, model=model)
    forcing = MMSForcingCsTriple(mms_case=case, model=model)
    t = 0.3
    xx = np.asarray(g.xx)
    yy = np.asarray(g.yy)
    W = xx * (1 - xx) * yy * (1 - yy)
    u = W / (1 + t)
    dt_u = -W / (1 + t) ** 2
    lap_u = (-2 * yy * (1 - yy) - 2 * xx * (1 - xx)) / (1 + t)
    expected = dt_u - MC.DT * lap_u + MC.K3 * u * u
    got = np.asarray(forcing.fT(g, OPS, t))
    assert np.allclose(got, expected, rtol=1e-12, atol=1e-15)
