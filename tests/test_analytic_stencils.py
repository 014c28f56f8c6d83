"""Analytic Newton-stencil assembly vs probing the jax.linearize graph.

The three implicit solves (T, cl, cd) have 5-point self-Jacobians; the fields
expose them in closed form (``stencil_dFT_dT`` etc. — the analytic
counterpart of the reference's ``del*_ab_F*_ij`` tables,
reference src/prob1base.py:2674-2839).  These tests pin the contract that
the analytic planes are interchangeable with 5-color probing of the exact
``jax.linearize`` operator, on uniform AND non-uniform grids and for all
three model variants, so the integrator may use either path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from na_dd_tpu.core import (
    FieldCsTriple,
    FieldHCsTriple,
    FieldRegHCsTriple,
    MMSForcingRegHCsTriple,
    NoForcing,
)
from na_dd_tpu.core.state import State
from na_dd_tpu.mms.cases import MMSCaseExpSin
from na_dd_tpu.models import Model02, default_model_consts
from na_dd_tpu.ops import LOCAL_OPS, make_grid, make_uniform_grid
from na_dd_tpu.ops.linsolve import newton_planes, probe_stencil

SEED = 20260816


def _random_state(g, rng):
    def f():
        u = rng.standard_normal(g.xx.shape)
        return jnp.asarray(u * np.asarray(g.interior_mask))

    return State(cp=f(), T=jnp.abs(f()) + 0.5, cl=f(), cd=f(), cs=f())


def _field(variant, g, model):
    forcing = NoForcing()
    if variant == "cs":
        return FieldCsTriple(grid=g, model=model, forcing=forcing)
    if variant == "hcs":
        return FieldHCsTriple(grid=g, model=model, forcing=forcing)
    return FieldRegHCsTriple(
        grid=g, model=model, forcing=forcing, regularization_factor=50.0
    )


def _grids():
    gu = make_uniform_grid(9, 7)
    rng = np.random.default_rng(SEED + 1)
    xs = np.sort(np.concatenate([[0.0, 1.0], rng.uniform(0.05, 0.95, 6)]))
    ys = np.sort(np.concatenate([[0.0, 1.0], rng.uniform(0.05, 0.95, 8)]))
    gn = make_grid(xs, ys)
    return {"uniform": gu, "nonuniform": gn}


@pytest.mark.parametrize("variant", ["cs", "hcs", "reg"])
@pytest.mark.parametrize("gridkind", ["uniform", "nonuniform"])
def test_analytic_matches_probed(variant, gridkind):
    g = _grids()[gridkind]
    ops = LOCAL_OPS
    model = Model02(default_model_consts)
    field = _field(variant, g, model)
    rng = np.random.default_rng(SEED)
    s = _random_state(g, rng)
    t1 = 0.37
    dt = 1e-3
    mask = g.interior_mask

    specs = {
        "T": (
            lambda: field.stencil_dFT_dT(g, ops, s),
            lambda w: field.FT(g, ops, s._replace(T=w), t1),
            s.T,
        ),
        "cl": (
            lambda: field.stencil_dFcl_dcl(g, ops, s),
            lambda w: field.Fcl(g, ops, s._replace(cl=w), t1),
            s.cl,
        ),
        "cd": (
            lambda: field.stencil_dFcd_dcd(g, ops, s),
            lambda w: field.Fcd(g, ops, s._replace(cd=w), t1),
            s.cd,
        ),
    }
    for name, (analytic_fn, resid, u0) in specs.items():
        _f0, lin = jax.linearize(resid, u0)
        mv = lambda w: (2.0 * (w * mask) - dt * lin(w * mask)) * mask  # noqa: E731
        probed = probe_stencil(mv, g)
        analytic = newton_planes(g, ops, analytic_fn(), dt)
        for plane, (pa, pb) in zip(probed._fields, zip(probed, analytic)):
            np.testing.assert_allclose(
                np.asarray(pa),
                np.asarray(pb),
                rtol=1e-12,
                atol=1e-15,
                err_msg=f"{variant}/{gridkind}/{name}/{plane}",
            )


def test_analytic_under_jit_and_apply():
    """The assembled operator applies identically to the probed one inside
    jit, including a full matvec on a random vector."""
    g = make_uniform_grid(12, 12)
    ops = LOCAL_OPS
    model = Model02(default_model_consts)
    mms = MMSCaseExpSin(g, model=model)
    forcing = MMSForcingRegHCsTriple(mms_case=mms, model=model, regularization_factor=50.0)
    field = FieldRegHCsTriple(
        grid=g, model=model, forcing=forcing, regularization_factor=50.0
    )
    rng = np.random.default_rng(SEED + 2)
    s = _random_state(g, rng)
    w = jnp.asarray(rng.standard_normal(g.xx.shape))
    dt = 5e-4
    mask = g.interior_mask

    @jax.jit
    def both(s, w):
        _f0, lin = jax.linearize(
            lambda cl: field.Fcl(g, ops, s._replace(cl=cl), 0.1), s.cl
        )
        mv = lambda v: (2.0 * (v * mask) - dt * lin(v * mask)) * mask  # noqa: E731
        probed = probe_stencil(mv, g).apply(ops, w)
        analytic = newton_planes(g, ops, field.stencil_dFcl_dcl(g, ops, s), dt).apply(
            ops, w
        )
        return probed, analytic

    pa, pb = both(s, w)
    np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), rtol=1e-12, atol=1e-14)


@pytest.mark.parametrize("variant", ["cs", "hcs", "reg"])
@pytest.mark.parametrize("gridkind", ["uniform", "nonuniform"])
def test_analytic_cross_couplings_match_jvp(variant, gridkind):
    """The cross-coupling planes (dFcl/dT, dFcd/dT, dFcd/dcl) act exactly as
    jax.jvp of the fields on the interior — the contract that lets the
    Newton rhs coupling terms be plane applications (and the whole sweep
    pure stencil algebra) instead of jvp passes."""
    g = _grids()[gridkind]
    ops = LOCAL_OPS
    model = Model02(default_model_consts)
    field = _field(variant, g, model)
    rng = np.random.default_rng(SEED + 3)
    s = _random_state(g, rng)
    w = jnp.asarray(rng.standard_normal(g.xx.shape)) * g.interior_mask
    t1 = 0.37
    mask = np.asarray(g.interior_mask)

    cases = {
        "dFcl_dT": (
            lambda: field.stencil_dFcl_dT(g, ops, s).apply(ops, w),
            lambda u: field.Fcl(g, ops, s._replace(T=u), t1),
            s.T,
        ),
        "dFcd_dT": (
            lambda: field.stencil_dFcd_dT(g, ops, s).apply(ops, w),
            lambda u: field.Fcd(g, ops, s._replace(T=u), t1),
            s.T,
        ),
        "dFcd_dcl": (
            lambda: field.diag_dFcd_dcl(g, s) * w,
            lambda u: field.Fcd(g, ops, s._replace(cl=u), t1),
            s.cl,
        ),
    }
    for name, (plane_fn, resid, u0) in cases.items():
        _, jvp = jax.jvp(resid, (u0,), (w,))
        # the fields mask their stencil part with interior_mask; the planes
        # are unmasked (consumers mask the rhs) -> compare on the interior
        np.testing.assert_allclose(
            np.asarray(plane_fn()) * mask,
            np.asarray(jvp) * mask,
            rtol=1e-12,
            atol=1e-15,
            err_msg=f"{variant}/{gridkind}/{name}",
        )


def test_coupling_source_analytic_end_to_end_parity():
    """coupling_source='analytic' reproduces the jvp-coupling study error to
    rounding (same exact operators, different evaluation order)."""
    from na_dd_tpu.harness.studies import _make_trial, study_consts
    from na_dd_tpu.mms.cases import MMSCasePol

    def run(**kw):
        trial = _make_trial(
            MMSCasePol, 16, 50.0, mc=study_consts("pol"), krylov_unroll=8, **kw
        )
        return float(trial.run_for_errors(Tf=0.01, dt=5e-4).overall_combined_error)

    e_jvp = run()
    e_pl = run(coupling_source="analytic")
    np.testing.assert_allclose(e_pl, e_jvp, rtol=1e-9)
