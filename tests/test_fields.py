"""Field algebra tests with mock (zero) forcing and constant states.

Port of the reference strategy (tests/test_semidiscrete_field_hcs_triple.py):
hand-computed closed forms for constant states, Heaviside-factor propagation
through the reaction / Fcs / Fcd, parametrized over cs sign, plus
matrix-free-Jacobian validation against central finite differences (which
replaces the reference's per-offset del_ab stencil tests — here the Jacobian
is produced by jax.linearize, so we check the whole operator at once).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from na_dd_tpu.core import (
    FieldCsTriple,
    FieldHCsTriple,
    FieldRegHCsTriple,
    NoForcing,
    State,
    heaviside_regularized,
)
from na_dd_tpu.models import Model02, default_model_consts
from na_dd_tpu.ops import LOCAL_OPS, make_uniform_grid

OPS = LOCAL_OPS
# per-file constants variant, as in the reference tests
MC = default_model_consts._replace(K1=0.11, K2=0.12, K3=0.13, K4=0.14, Kd=0.21, Sd=3.0)
ETA = 37.0


@pytest.fixture(scope="module")
def grid():
    return make_uniform_grid(6, 6)


@pytest.fixture(scope="module")
def model():
    return Model02(MC)


def _const_state(grid, cp=0.3, T=0.7, cl=0.4, cd=0.9, cs=0.5):
    full = lambda v: jnp.full(grid.full_shape, v)
    return State(cp=full(cp), T=full(T), cl=full(cl), cd=full(cd), cs=full(cs))


def _make_field(variant, grid, model):
    if variant == "cs":
        return FieldCsTriple(grid=grid, model=model, forcing=NoForcing())
    if variant == "hcs":
        return FieldHCsTriple(grid=grid, model=model, forcing=NoForcing())
    return FieldRegHCsTriple(
        grid=grid, model=model, forcing=NoForcing(), regularization_factor=ETA
    )


def _f2(variant, cs):
    if variant == "cs":
        return MC.Kd * cs
    if variant == "hcs":
        return MC.Kd * float(cs > 0)
    return MC.Kd * float(heaviside_regularized(jnp.asarray(cs), ETA))


@pytest.mark.parametrize("variant", ["cs", "hcs", "reg"])
@pytest.mark.parametrize("cs_val", [-0.3, 0.0, 0.4])
def test_constant_state_closed_forms(grid, model, variant, cs_val):
    cp, T, cl, cd = 0.3, 0.7, 0.4, 0.9
    s = _const_state(grid, cp=cp, T=T, cl=cl, cd=cd, cs=cs_val)
    field = _make_field(variant, grid, model)
    im = np.asarray(grid.interior_mask)

    reaction = _f2(variant, cs_val) * (1.0 + cl) * (MC.Sd - cd)

    # Fcp = -K1 cp (cl+1) - K2 T cp on the interior
    fcp = np.asarray(field.Fcp(grid, OPS, s, 0.0))
    assert np.allclose(fcp, im * (-MC.K1 * (cl + 1) * cp - MC.K2 * T * cp))

    # spatial operators vanish on constants -> FT = -K3 cp T
    ft = np.asarray(field.FT(grid, OPS, s, 0.0))
    assert np.allclose(ft, im * (-MC.K3 * cp * T), atol=1e-14)

    fcl = np.asarray(field.Fcl(grid, OPS, s, 0.0))
    assert np.allclose(fcl, im * (-MC.K4 * cp * (cl + 1)), atol=1e-14)

    fcd = np.asarray(field.Fcd(grid, OPS, s, 0.0))
    assert np.allclose(fcd, im * reaction, atol=1e-14)

    fcs = np.asarray(field.Fcs(grid, OPS, s, 0.0))
    assert np.allclose(fcs, -im * reaction, atol=1e-14)


def test_reaction_term_factorization(grid, model):
    """cscd_reaction_term equals the factorized closed form pointwise for a
    random (non-constant) state."""
    rng = np.random.RandomState(7)
    shape = grid.full_shape
    s = State(*(jnp.asarray(rng.rand(*shape) - 0.3) for _ in range(5)))
    field = _make_field("reg", grid, model)
    got = np.asarray(field.cscd_reaction_term(grid, s))
    expect = (
        MC.Kd
        * np.asarray(heaviside_regularized(s.cs, ETA))
        * (1.0 + np.asarray(s.cl))
        * (MC.Sd - np.asarray(s.cd))
        * np.asarray(grid.interior_mask)
    )
    assert np.allclose(got, expect, rtol=1e-13)


def test_heaviside_regularized_values():
    x = jnp.asarray([-1e3, -0.1, 0.0, 0.1, 1e3])
    h = np.asarray(heaviside_regularized(x, 50.0))
    assert h[0] == 0.0 and h[-1] == 1.0  # stable saturation
    assert h[2] == pytest.approx(0.5)
    assert np.allclose(h[1], 1.0 / (1.0 + np.exp(5.0)))
    assert np.allclose(h[3], 1.0 / (1.0 + np.exp(-5.0)))


@pytest.mark.parametrize("variant", ["cs", "reg"])
def test_linearized_jacobian_matches_fd(grid, model, variant):
    """jax.linearize of the residual == central finite differences: the
    matrix-free Jacobian that feeds the Newton solves is the true derivative
    of the discrete operator (replaces the reference's analytic del_ab_* stencil
    table tests, prob1base.py:2674-2839)."""
    rng = np.random.RandomState(11)
    shape = grid.full_shape
    s = State(*(jnp.asarray(0.5 + 0.1 * rng.rand(*shape)) for _ in range(5)))
    field = _make_field(variant, grid, model)
    t = 0.3

    for comp, wrt in [("FT", "T"), ("Fcl", "T"), ("Fcl", "cl"),
                      ("Fcd", "T"), ("Fcd", "cl"), ("Fcd", "cd")]:
        fn = getattr(field, comp)
        resid = lambda u: fn(grid, OPS, s._replace(**{wrt: u}), t)
        u0 = getattr(s, wrt)
        _, lin = jax.linearize(resid, u0)
        w = jnp.asarray(rng.rand(*shape))
        jvp = np.asarray(lin(w))
        eps = 1e-6
        fd = np.asarray((resid(u0 + eps * w) - resid(u0 - eps * w)) / (2 * eps))
        assert np.allclose(jvp, fd, rtol=1e-6, atol=1e-9), f"{comp} wrt {wrt}"


@pytest.mark.parametrize("variant", ["cs", "hcs", "reg"])
@pytest.mark.parametrize("cs_val", [1.0, 1e-12, 0.0, -1e-12, -1.0])
def test_reaction_derivative_algebra_carries_heaviside_factor(
    grid, model, variant, cs_val
):
    """The F2(cs) factor must propagate into every PARTIAL of the reaction
    term, not just its value — the per-partial counterpart of the reference's
    del*_ab_cscd_reaction_ij assertions
    (reference tests/test_semidiscrete_field_hcs_triple.py:385-542),
    parametrized over cs ∈ {+, +0, 0, -0, -} and all three variants.

    With constant states and zero forcing the reaction partials are diagonal
    operators with closed forms (reaction = F2(cs)·(1+cl)·(Sd−cd), a_T=0):

        ∂reaction/∂T  = 0
        ∂reaction/∂cl = F2(cs)·(Sd−cd)
        ∂reaction/∂cd = −F2(cs)·(1+cl)

    asserted three ways: through jax.jvp of Fcs/Fcd (the cross-coupling path
    the Newton rhs uses), and through the analytic ``stencil_dFcd_dcd``
    diagonal (the production assembled-stencil path)."""
    from na_dd_tpu.ops.linsolve import diffusion_planes
    from na_dd_tpu.ops.stencils import Mx, My

    cp, T, cl, cd = 0.3, 0.7, 0.4, 0.9
    s = _const_state(grid, cp=cp, T=T, cl=cl, cd=cd, cs=cs_val)
    field = _make_field(variant, grid, model)
    im = np.asarray(grid.interior_mask)
    f2 = _f2(variant, cs_val)
    d_cl = f2 * (MC.Sd - cd)  # ∂reaction/∂cl
    d_cd = -f2 * (1.0 + cl)  # ∂reaction/∂cd

    rng = np.random.RandomState(23)
    w = jnp.asarray(rng.rand(*grid.full_shape))

    # Fcs depends on (T, cl, cd) ONLY through the reaction term
    for wrt, expect_factor in [("T", 0.0), ("cl", -d_cl), ("cd", -d_cd)]:
        _, jvp = jax.jvp(
            lambda u: field.Fcs(grid, OPS, s._replace(**{wrt: u}), 0.0),
            (getattr(s, wrt),),
            (w,),
        )
        assert np.allclose(
            np.asarray(jvp), expect_factor * np.asarray(w) * im, atol=1e-14
        ), f"Fcs partial wrt {wrt} lost the H-factor (variant={variant}, cs={cs_val})"

    # Fcd's cl-dependence is reaction-only (Dd depends on cp, T)
    _, jvp_cd_cl = jax.jvp(
        lambda u: field.Fcd(grid, OPS, s._replace(cl=u), 0.0), (s.cl,), (w,)
    )
    assert np.allclose(np.asarray(jvp_cd_cl), d_cl * np.asarray(w) * im, atol=1e-14)

    # analytic production path: stencil_dFcd_dcd minus the pure-diffusion
    # planes must leave exactly the reaction-derivative diagonal
    st = field.stencil_dFcd_dcd(grid, OPS, s)
    Dd_x = model.Dd(Mx(OPS, grid, s.cp), Mx(OPS, grid, s.T))
    Dd_y = model.Dd(My(OPS, grid, s.cp), My(OPS, grid, s.T))
    L = diffusion_planes(grid, OPS, Dd_x, Dd_y)
    dreac = np.asarray(st.c0) - np.asarray(L.c0)
    assert np.allclose(dreac, d_cd * im, atol=1e-14), (
        f"stencil_dFcd_dcd diagonal lost the H-factor (variant={variant}, cs={cs_val})"
    )
    for plane in ("cxm", "cxp", "cym", "cyp"):
        assert np.array_equal(np.asarray(getattr(st, plane)), np.asarray(getattr(L, plane)))


def test_jacobian_diag_constant_state_closed_form(grid, model):
    """Probed diagonal of dFcd/dcd at a constant state == analytic value:
    -2 Dd (1/h² + 1/k²) - Kd H_eta(cs)(1+cl) on the interior."""
    from na_dd_tpu.ops import linsolve

    cp, T, cl, cd, cs = 0.3, 0.7, 0.4, 0.9, 0.5
    s = _const_state(grid, cp, T, cl, cd, cs)
    field = _make_field("reg", grid, model)
    resid = lambda u: field.Fcd(grid, OPS, s._replace(cd=u), 0.0)
    _, lin = jax.linearize(resid, s.cd)
    mask = grid.interior_mask
    matvec = lambda w: lin(w * mask) * mask
    red, black = linsolve.checkerboard_masks(grid)
    diag = np.asarray(linsolve.probe_diag(matvec, red * mask, black * mask))

    h = 1.0 / grid.N
    Dd = float(model.Dd(jnp.asarray(cp), jnp.asarray(T)))
    react = -MC.Kd * float(heaviside_regularized(jnp.asarray(cs), ETA)) * (1 + cl)
    expected = (-4.0 * Dd / h**2 + react) * np.asarray(mask)
    # rows adjacent to the boundary lose one neighbor in the diffusion part?
    # No: the diagonal entry itself is unaffected by boundary masking of
    # *columns*; only off-diagonals are. So the closed form holds everywhere.
    assert np.allclose(diag, expected, rtol=1e-12)
