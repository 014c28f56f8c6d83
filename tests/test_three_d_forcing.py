"""Independent validation of the 3-D MMS forcing algebra.

The residual-insertion forcings (three_d/forcing.py) encode, by hand, the
continuous RHS of each field — including the product-rule expansion of
∇·(Dl(cp)∇cl − V(T)(cl+1)) and the Dd(cp,T) chain rule.  Here the SAME
quantity is computed INDEPENDENTLY: the outer divergences are taken by
central finite differences of flux closures built only from the case's
analytic accessors, so an algebra slip in the hand expansion (a lost
product-rule term, a wrong chain-rule factor) shows up as an O(1)
discrepancy against the ~1e-9 FD error.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from na_dd_tpu.core.state import heaviside_regularized
from na_dd_tpu.models import Model02, default_model_consts
from na_dd_tpu.three_d import (
    LOCAL_OPS3,
    MMSCaseExpSin3,
    MMSForcingCsTriple3,
    MMSForcingRegHCsTriple3,
    make_uniform_grid3,
)

# nonzero gamma_T so the V1(T) advection terms (and their T-coupling in the
# fcl product rule) are actually exercised
MC = default_model_consts._replace(
    K1=0.011, K2=0.012, K3=0.013, K4=0.014, Kd=0.31, Sd=2.0, gamma_T=0.02
)
ETA = 50.0
H = 1e-5  # central-difference step (f64: truncation ~1e-10 on these fields)
T0 = 0.3


@pytest.fixture(scope="module")
def setup():
    g = make_uniform_grid3(4, 4, 4)
    model = Model02(MC)
    case = MMSCaseExpSin3(g, model)
    # a handful of interior evaluation points, away from the boundary
    pts = np.asarray(
        [[0.31, 0.47, 0.62], [0.55, 0.23, 0.41], [0.72, 0.66, 0.29]]
    )
    x, y, z = (jnp.asarray(pts[:, i]) for i in range(3))
    return g, model, case, (x, y, z)


def _d(fn, x, y, z, axis):
    """Central FD of fn(x, y, z) along one axis."""
    e = [jnp.zeros_like(x)] * 3
    e[axis] = jnp.full_like(x, H)
    return (fn(x + e[0], y + e[1], z + e[2]) - fn(x - e[0], y - e[1], z - e[2])) / (
        2 * H
    )


def test_fT_residual_identity(setup):
    g, model, case, (x, y, z) = setup
    forcing = MMSForcingCsTriple3(mms_case=case, model=model)

    lap = sum(
        _d(lambda a, b, c, ax=ax: _d(lambda p, q, r: case.T(T0, p, q, r), a, b, c, ax), x, y, z, ax)
        for ax in range(3)
    )
    rhs = model.DT * lap - model.K3 * case.cp(T0, x, y, z) * case.T(T0, x, y, z)
    want = case.dt_T(T0, x, y, z) - rhs

    # the PRODUCTION forcing evaluated at the same coordinates (fT is
    # pointwise in (t, x, y, z); grid only provides coordinates)
    class _P:
        xx, yy, zz = x, y, z

    got = forcing.fT(_P, LOCAL_OPS3, T0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-8)
    # and on the real grid it stays finite everywhere
    assert np.isfinite(np.asarray(forcing.fT(g, LOCAL_OPS3, T0))).all()


def test_fcl_residual_identity_fd_divergence(setup):
    """fcl must equal dt_cl − [∇·(Dl(cp)∇cl − V(T)(cl+1)) − K4 cp (cl+1)]
    with the divergence taken by FD of analytic-accessor flux closures —
    fully independent of the hand product-rule expansion in forcing.py."""
    g, model, case, (x, y, z) = setup
    forcing = MMSForcingCsTriple3(mms_case=case, model=model)

    def flux(axis):
        dcl = [case.dx_cl, case.dy_cl, case.dz_cl][axis]
        V = [model.V1, model.V2, model.V3][axis]

        def f(p, q, r):
            return model.Dl(case.cp(T0, p, q, r)) * dcl(T0, p, q, r) - V(
                case.T(T0, p, q, r)
            ) * (case.cl(T0, p, q, r) + 1.0)

        return f

    div = sum(_d(flux(ax), x, y, z, ax) for ax in range(3))
    rhs = div - model.K4 * case.cp(T0, x, y, z) * (case.cl(T0, x, y, z) + 1.0)
    want = case.dt_cl(T0, x, y, z) - rhs

    # forcing.fcl evaluated at the same coordinates (it is pointwise in
    # (t, x, y, z) — grid/ops are unused beyond providing coordinates)
    class _P:
        xx, yy, zz = x, y, z

    got = forcing.fcl(_P, LOCAL_OPS3, T0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-8)


def test_fcd_fcs_residual_identity_fd_divergence(setup):
    """fcd/fcs with the full nonlinear Dd(cp, T) diffusion flux and the
    regularized-Heaviside reaction, divergence by FD."""
    g, model, case, (x, y, z) = setup
    forcing = MMSForcingRegHCsTriple3(
        mms_case=case, model=model, regularization_factor=ETA
    )

    def flux(axis):
        dcd = [case.dx_cd, case.dy_cd, case.dz_cd][axis]

        def f(p, q, r):
            return model.Dd(case.cp(T0, p, q, r), case.T(T0, p, q, r)) * dcd(
                T0, p, q, r
            )

        return f

    div = sum(_d(flux(ax), x, y, z, ax) for ax in range(3))
    reaction = (
        MC.Kd
        * (MC.Sd - case.cd(T0, x, y, z))
        * (case.cl(T0, x, y, z) + 1.0)
        * heaviside_regularized(case.cs(T0, x, y, z), ETA)
    )

    class _P:
        xx, yy, zz = x, y, z

    got_cd = forcing.fcd(_P, LOCAL_OPS3, T0)
    want_cd = case.dt_cd(T0, x, y, z) - (div + reaction)
    np.testing.assert_allclose(np.asarray(got_cd), np.asarray(want_cd), atol=5e-8)

    got_cs = forcing.fcs(_P, LOCAL_OPS3, T0)
    want_cs = case.dt_cs(T0, x, y, z) + reaction
    np.testing.assert_allclose(np.asarray(got_cs), np.asarray(want_cs), atol=1e-10)


@pytest.mark.parametrize("t", [0.1, 0.5, 0.9])  # before / at / after crossing
def test_fcs_variants_across_zero_crossing_3d(t):
    """With cp=T=cl=cd=0 and cs = (0.5 − t)W crossing zero, fcs reduces to
    dt_cs + Kd·Sd·F2(cs)/Kd per variant — the 3-D twin of the 2-D
    zero-crossing forcing test (tests/test_forcing.py)."""
    from na_dd_tpu.three_d import (
        MMSCaseCsZeroCrossing3,
        MMSForcingHCsTriple3,
        make_uniform_grid3,
    )

    g = make_uniform_grid3(4, 4, 4)
    model = Model02(MC)
    case = MMSCaseCsZeroCrossing3(g, model, cs_A=0.5, cs_B=1.0)

    xx, yy, zz = np.asarray(g.xx), np.asarray(g.yy), np.asarray(g.zz)
    W = xx * (1 - xx) * yy * (1 - yy) * zz * (1 - zz)
    cs = (0.5 - t) * W
    dt_cs = -W
    for forcing, factor in [
        (MMSForcingCsTriple3(mms_case=case, model=model), cs),
        (
            MMSForcingHCsTriple3(mms_case=case, model=model),
            (cs > 0).astype(float),
        ),
        (
            MMSForcingRegHCsTriple3(
                mms_case=case, model=model, regularization_factor=ETA
            ),
            np.asarray(heaviside_regularized(jnp.asarray(cs), ETA)),
        ),
    ]:
        expected = dt_cs + MC.Kd * MC.Sd * factor
        got = np.asarray(forcing.fcs(g, LOCAL_OPS3, t))
        np.testing.assert_allclose(got, expected, rtol=1e-12, atol=1e-14)


def test_fcp_cell_average_projection_3d(setup):
    """fcp must be the 27-point Gauss–Legendre dual-cell average of the
    pointwise residual, matching it to quadrature order at cell centers."""
    g, model, case, _pts = setup
    forcing = MMSForcingCsTriple3(mms_case=case, model=model)
    got = np.asarray(forcing.fcp(g, LOCAL_OPS3, T0))
    ptwise = np.asarray(
        forcing.fcp_ptwise(T0, g.xx, g.yy, g.zz) * g.interior_mask
    )
    # average over an h-cell of a smooth function = value + O(h²); at N=4 the
    # fields vary on O(1) scales so the two agree to a few percent
    mask = np.asarray(g.interior_mask) > 0
    rel = np.abs(got[mask] - ptwise[mask]) / (np.abs(ptwise[mask]) + 1e-12)
    assert rel.max() < 0.1, rel.max()
    # and it IS a projection, not the pointwise value itself
    assert not np.allclose(got[mask], ptwise[mask], rtol=1e-12)
