"""3-D MODEL physics tests (beyond-reference capability): the five-field
NA-DD system on (N+1, M+1, P+1) grids.

Covers: the analytic Stencil7 Jacobian/coupling planes against the exact
``jax.linearize``/``jax.jvp`` of the 3-D fields, 3-D dual-cell quadrature
exactness, MMS convergence of the inherited PC machinery (spatial order 2
with CFL-scaled dt; temporal order 2 by self-convergence), forward Euler,
all three reaction variants, mixed-precision parity and sharded (2-D device
mesh) parity of a full PC step.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from na_dd_tpu.core.state import State
from na_dd_tpu.models import Model02, default_model_consts
from na_dd_tpu.parallel import make_mesh
from na_dd_tpu.three_d import (
    LOCAL_OPS3,
    ForwardEulerIntegrator3,
    HaloOps3,
    MMSCaseExpSin3,
    MMSCasePol3,
    avg_int3,
    make_grid3,
    make_setup3,
    make_uniform_grid3,
    mms_error3,
    run_trial3,
    state_from_mms_when3,
)

MC = default_model_consts._replace(
    K1=1e-3, K2=1e-3, K3=1e-3, K4=1e-3, Dl_max=1e-5, Kd=1e-2, Sd=1.0, Dd_max=1e-6
)
ETA = 50.0
OPS = LOCAL_OPS3


@pytest.fixture(scope="module")
def model():
    # gamma_T nonzero by default, so the advection planes are exercised;
    # bump it so the V1-coupling is far above roundoff in the plane tests.
    return Model02(MC._replace(gamma_T=1e-2))


def _rand_grid3(rng, N=5, M=6, Pn=4):
    def coords(n):
        d = 0.5 + rng.rand(n)
        c = np.concatenate([[0.0], np.cumsum(d)])
        return c / c[-1]

    return make_grid3(coords(N), coords(M), coords(Pn))


def _rand_setup(model, rng):
    g = _rand_grid3(rng)
    case = MMSCaseExpSin3(g, model)
    from na_dd_tpu.three_d import FieldRegHCsTriple3, MMSForcingRegHCsTriple3

    forcing = MMSForcingRegHCsTriple3(
        mms_case=case, model=model, regularization_factor=ETA
    )
    field = FieldRegHCsTriple3(
        grid=g, model=model, forcing=forcing, regularization_factor=ETA
    )
    # a generic (non-manufactured) state so no special structure hides bugs
    s = State(
        cp=jnp.asarray(0.2 + 0.1 * rng.rand(*g.full_shape)),
        T=jnp.asarray(0.3 + 0.1 * rng.rand(*g.full_shape)),
        cl=jnp.asarray(0.1 * rng.rand(*g.full_shape)),
        cd=jnp.asarray(0.1 * rng.rand(*g.full_shape)),
        cs=jnp.asarray(0.05 + 0.1 * rng.rand(*g.full_shape)),
    )
    return g, field, s


# ----------------------------------------------------------------------
# analytic Stencil7 planes vs the exact linearization
# ----------------------------------------------------------------------
@pytest.mark.parametrize("which", ["T", "cl", "cd"])
def test_self_jacobian_planes_match_linearize(model, which):
    """FT/Fcl/Fcd are linear in their own variable; the closed-form Stencil7
    planes must act identically to jax.linearize of the field (3-D twin of
    tests/test_analytic_stencils.py)."""
    rng = np.random.RandomState(7)
    g, field, s = _rand_setup(model, rng)
    t = 0.3

    F = {"T": field.FT, "cl": field.Fcl, "cd": field.Fcd}[which]
    st = {
        "T": field.stencil_dFT_dT,
        "cl": field.stencil_dFcl_dcl,
        "cd": field.stencil_dFcd_dcd,
    }[which](g, OPS, s)

    _, lin = jax.linearize(
        lambda u: F(g, OPS, s._replace(**{which: u}), t), getattr(s, which)
    )
    m = g.interior_mask
    for _ in range(3):
        w = jnp.asarray(rng.randn(*g.full_shape))
        np.testing.assert_allclose(
            np.asarray(st.apply(OPS, w) * m),
            np.asarray(lin(w) * m),
            rtol=0,
            atol=1e-11,
        )


@pytest.mark.parametrize("which", ["cl_T", "cd_T", "cd_cl"])
def test_cross_coupling_planes_match_jvp(model, which):
    """The analytic cross-coupling planes (dFcl/dT, dFcd/dT, dFcd/dcl) must
    equal the exact jax.jvp of the 3-D fields on interior tangents."""
    rng = np.random.RandomState(8)
    g, field, s = _rand_setup(model, rng)
    t = 0.3
    m = g.interior_mask
    w = jnp.asarray(rng.randn(*g.full_shape)) * m

    if which == "cl_T":
        got = field.stencil_dFcl_dT(g, OPS, s).apply(OPS, w)
        _, want = jax.jvp(lambda T: field.Fcl(g, OPS, s._replace(T=T), t), (s.T,), (w,))
    elif which == "cd_T":
        got = field.stencil_dFcd_dT(g, OPS, s).apply(OPS, w)
        _, want = jax.jvp(lambda T: field.Fcd(g, OPS, s._replace(T=T), t), (s.T,), (w,))
    else:
        got = field.diag_dFcd_dcl(g, s) * w
        _, want = jax.jvp(
            lambda cl: field.Fcd(g, OPS, s._replace(cl=cl), t), (s.cl,), (w,)
        )
    np.testing.assert_allclose(
        np.asarray(got * m), np.asarray(want * m), rtol=0, atol=1e-11
    )


def test_avg_int3_polynomial_exactness():
    """3×3×3 Gauss–Legendre is exact for per-axis degree ≤ 5: the dual-cell
    average of x²y³z must match the closed-form antiderivative average."""
    g = make_uniform_grid3(5, 4, 6)
    got = avg_int3(lambda x, y, z: x**2 * y**3 * z, g, OPS)

    xm = np.asarray(OPS.shift_xm(g.xx_phalf))
    xp = np.asarray(g.xx_phalf)
    ym = np.asarray(OPS.shift_ym(g.yy_phalf))
    yp = np.asarray(g.yy_phalf)
    zm = np.asarray(OPS.shift_zm(g.zz_phalf))
    zp = np.asarray(g.zz_phalf)
    with np.errstate(divide="ignore", invalid="ignore"):
        ax = (xp**3 - xm**3) / (3.0 * (xp - xm))
        ay = (yp**4 - ym**4) / (4.0 * (yp - ym))
        az = (zp**2 - zm**2) / (2.0 * (zp - zm))
    want = np.nan_to_num(ax * ay * az) * np.asarray(g.interior_mask)
    np.testing.assert_allclose(np.asarray(got), want, rtol=0, atol=1e-14)


# ----------------------------------------------------------------------
# MMS convergence of the full five-field system
# ----------------------------------------------------------------------
def test_gradient_norm_weights_exact():
    """The staggered gradient weights w_gx/w_gy/w_gz must integrate the
    discrete gradient of u = x exactly: ||∇u||_p² = Σ w_gx
    = 1 · (1 − 1/M) · (1 − 1/P) on a uniform grid (gx ≡ 1 on its support)."""
    from na_dd_tpu.three_d.inner_products import norm_p3
    from na_dd_tpu.three_d.stencils import grad_H3

    g = make_uniform_grid3(5, 4, 8)
    gx, gy, gz = grad_H3(OPS, g, g.xx)
    val = float(norm_p3(OPS, g, gx, gy, gz) ** 2)
    want = (1 - 1 / 4) * (1 - 1 / 8)
    assert abs(val - want) < 1e-13, (val, want)


def test_pc3_spatial_order_2(model):
    """With dt ∝ h both error components contract at order 2, so the combined
    MMS error must show a clean 2nd-order ladder."""
    errs = [
        mms_error3(
            MMSCaseExpSin3,
            N=N,
            model=model,
            Tf=0.02,
            dt=0.01 * 4.0 / N,
            integrator_params=dict(num_newton_steps=2),
        )
        for N in (4, 8, 16)
    ]
    rates = [np.log2(errs[i] / errs[i + 1]) for i in range(len(errs) - 1)]
    assert all(e > 0 for e in errs)
    for r in rates:
        assert abs(r - 2.0) < 0.3, f"rates {rates}, errors {errs}"


def test_pc3_temporal_order_2(model):
    """Self-convergence against a 16x-finer-dt run on the same grid (cancels
    the spatial floor exactly, as in the 2-D FE order test)."""
    g, case, _field, integ = make_setup3(
        MMSCaseExpSin3, N=6, model=model, integrator_params=dict(num_newton_steps=3)
    )

    def final(dt):
        return run_trial3(g, case, integ, Tf=0.04, dt=dt)["state"]

    ref = final(2.5e-3 / 8)
    errs = []
    for k in range(3):
        s = final(1e-2 / 2**k)
        e = jnp.sqrt(
            jnp.sum(g.w_H * (s.T - ref.T) ** 2) + jnp.sum(g.w_H * (s.cs - ref.cs) ** 2)
        )
        errs.append(float(e))
    rates = [np.log2(errs[i] / errs[i + 1]) for i in range(2)]
    for r in rates:
        assert abs(r - 2.0) < 0.25, f"rates {rates}, errors {errs}"


def test_forward_euler3_step_is_euler(model):
    """FE in 3-D is the inherited step body verbatim: one eager step must
    equal s + dt·F(s) exactly."""
    g, case, field, _integ = make_setup3(MMSCaseExpSin3, N=4, model=model)
    fe = ForwardEulerIntegrator3(field)
    s0 = state_from_mms_when3(mms_case=case, t=0.0, grid=g)
    dt = 1e-3
    s1 = fe.step(s0, t0=0.0, dt=dt)
    F = field.all_fields(g, OPS, s0, 0.0)
    for v in State._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(s1, v)),
            np.asarray(getattr(s0, v) + dt * getattr(F, v)),
            rtol=0,
            atol=1e-15,
        )


@pytest.mark.parametrize("variant", ["cs", "hcs"])
def test_pc3_other_variants_run_and_converge(model, variant):
    """The Cs/HCs correctors (inherited pointwise machinery) must run in 3-D
    with converged solves and a sane MMS error."""
    g, case, _field, integ = make_setup3(
        MMSCasePol3, N=4, model=model, variant=variant
    )
    out = run_trial3(g, case, integ, Tf=0.01, dt=2.5e-3)
    assert out["krylov_converged"]
    assert 0 < out["error"] < 1e-2, out["error"]


@pytest.mark.parametrize("variant", ["hcs", "reghcs"])
def test_pc3_heaviside_variants_through_zero_crossing(model, variant):
    """Integrate THROUGH the cs zero crossing (cs = (0.005 − t)W, crossing at
    t = 0.005 < Tf): the sharp/regularized Heaviside correctors must stay
    converged with a small error — the switching scenario the Heaviside
    machinery exists for (2-D twins: tests/test_hcs_corrector.py etc.)."""
    from na_dd_tpu.three_d import MMSCaseCsZeroCrossing3

    g, case, _field, integ = make_setup3(
        MMSCaseCsZeroCrossing3,
        N=4,
        model=model,
        variant=variant,
        case_params=dict(cs_A=0.005, cs_B=1.0),
    )
    out = run_trial3(g, case, integ, Tf=0.01, dt=1e-3)
    assert out["krylov_converged"]
    assert 0 <= out["error"] < 1e-3, out["error"]
    # the solution really crossed: exact cs at Tf is negative in the interior
    ex = state_from_mms_when3(mms_case=case, t=0.01, grid=g)
    assert float(ex.cs[2, 2, 2]) < 0.0


def test_pc3_mixed_precision_matches_full(model):
    """precision='mixed' (f32 Krylov under f64 refinement) must reproduce the
    full-f64 3-D run to refinement accuracy — the shared wrapper, now on
    Stencil7 planes."""
    common = dict(N=5, model=model, Tf=0.01, dt=2.5e-3)
    e_full = mms_error3(MMSCaseExpSin3, **common)
    e_mixed = mms_error3(
        MMSCaseExpSin3, **common, integrator_params=dict(precision="mixed")
    )
    assert abs(e_mixed - e_full) <= 1e-8 * max(e_full, 1e-30), (e_full, e_mixed)


def test_pc3_pallas_backend_matches_jnp(model):
    """stencil_backend='pallas' in 3-D (interpret mode on CPU): the fused
    whole-BiCGStab-solve Stencil7 kernel inside the PC step must reproduce
    the jnp backend essentially exactly (the kernel shares bicgstab_unrolled's
    masked early-exit update), and the scanned-Krylov variant must engage the
    apply-only kernel path (the fused solve requires the unrolled shape)."""
    common = dict(N=5, model=model, Tf=0.01, dt=2.5e-3)
    e_jnp = mms_error3(
        MMSCaseExpSin3, **common, integrator_params=dict(krylov_unroll=24)
    )
    e_pal = mms_error3(
        MMSCaseExpSin3,
        **common,
        integrator_params=dict(krylov_unroll=24, stencil_backend="pallas"),
    )
    assert abs(e_pal - e_jnp) <= 1e-10 * abs(e_jnp), (e_jnp, e_pal)
    # scanned Krylov: fused-solve gate is off -> stencil7 apply kernel matvec
    e_pal_scan = mms_error3(
        MMSCaseExpSin3,
        **common,
        integrator_params=dict(
            krylov_unroll=24, krylov_scanned=True, stencil_backend="pallas"
        ),
    )
    assert abs(e_pal_scan - e_jnp) <= 1e-9 * abs(e_jnp), (e_jnp, e_pal_scan)


def test_pc3_mixed_with_pallas_matches_full(model):
    """precision='mixed' + stencil_backend='pallas' in 3-D: the f32-only
    Mosaic kernels run the inner solves of an f64-accurate refinement run
    (2-D twin: tests/test_mixed_precision.py::test_mixed_with_pallas_kernels
    _matches_f64)."""
    common = dict(N=5, model=model, Tf=0.01, dt=2.5e-3)
    e_full = mms_error3(
        MMSCaseExpSin3, **common, integrator_params=dict(krylov_unroll=24)
    )
    e_mp = mms_error3(
        MMSCaseExpSin3,
        **common,
        integrator_params=dict(
            krylov_unroll=24, precision="mixed", stencil_backend="pallas"
        ),
    )
    assert abs(e_mp - e_full) <= 1e-8 * max(e_full, 1e-30), (e_full, e_mp)


def test_integrator3_restrictions(model):
    """No construction-time feature restrictions remain in 3-D (pallas and
    direct landed in round 3); the argument validation still bites."""
    from na_dd_tpu.three_d import PCTrapezoidalRegHCsTriple3

    g, _case, field, _integ = make_setup3(MMSCaseExpSin3, N=4, model=model)
    for kw in (
        dict(linear_solver="direct"),
        dict(stencil_backend="pallas"),
    ):
        PCTrapezoidalRegHCsTriple3(field, regularization_factor=ETA, **kw)
    # the base-class argument validation is inherited
    with pytest.raises(ValueError):
        PCTrapezoidalRegHCsTriple3(
            field, regularization_factor=ETA, linear_solver="nope"
        )
    # make_setup3 takes exactly one of N / grid
    with pytest.raises(ValueError):
        make_setup3(MMSCaseExpSin3, model=model)
    with pytest.raises(ValueError):
        make_setup3(MMSCaseExpSin3, N=4, model=model, grid=g)


def test_probe_and_matrix_free_match_analytic_3d(model):
    """The generic solve paths — 7-color plane probing of the linearized
    fields (stencil_source='probe') and the fully matrix-free
    2-color-diagonal path (assemble_stencil=False) — must reproduce the
    analytic-plane step: the probed planes ARE the analytic planes (the
    Jacobians are 7-point by construction), so states agree to solve
    tolerance."""
    from na_dd_tpu.three_d import PCTrapezoidalRegHCsTriple3

    g, case, field, integ_an = make_setup3(
        MMSCaseExpSin3, N=5, model=model, integrator_params=dict(krylov_unroll=24)
    )
    s0 = state_from_mms_when3(mms_case=case, t=0.0, grid=g)
    t0, dt = 0.0, 1e-3
    s_an, _ = integ_an.step_fn(g, OPS, s0, t0, dt)

    for kw in (
        dict(stencil_source="probe"),
        dict(assemble_stencil=False),
    ):
        integ = PCTrapezoidalRegHCsTriple3(
            field, regularization_factor=ETA, krylov_unroll=24, **kw
        )
        s_g, diag = integ.step_fn(g, OPS, s0, t0, dt)
        assert bool(diag.krylov_converged), kw
        for v in State._fields:
            d = np.max(np.abs(np.asarray(getattr(s_g, v)) - np.asarray(getattr(s_an, v))))
            assert d < 1e-11, (kw, v, d)


def test_production_drivers_in_3d(model):
    """The production drivers (simulate, simulate_adaptive,
    released_drug_fraction — harness/simulate.py) are dimension-agnostic:
    they must run UNCHANGED on a 3-D grid/integrator with ops=LOCAL_OPS3."""
    from na_dd_tpu.harness.simulate import (
        released_drug_fraction,
        simulate,
        simulate_adaptive,
    )
    from na_dd_tpu.three_d import make_integrator3

    g = make_uniform_grid3(6, 6, 6)
    integ = make_integrator3(g, model)
    # physical-style initial condition: loaded solid drug in the interior
    bump = (
        jnp.sin(jnp.pi * g.xx) * jnp.sin(jnp.pi * g.yy) * jnp.sin(jnp.pi * g.zz)
    ) * g.interior_mask
    s0 = State(cp=0.2 * bump, T=0.1 * bump, cl=0.0 * bump, cd=0.05 * bump, cs=bump)

    s_fin, times, snaps = simulate(
        integ, g, s0, dt=1e-3, num_steps=4, snapshot_every=2, ops=OPS
    )
    assert snaps.T.shape == (2,) + g.full_shape
    assert np.isfinite(np.asarray(s_fin.cs)).all()

    frac = released_drug_fraction(OPS, g, s_fin, s0)
    assert 0.0 <= float(frac) < 1.0

    s_ad, info = simulate_adaptive(
        integ, g, s0, Tf=5e-3, dt0=1e-3, tol=1e-5, ops=OPS
    )
    assert info["steps"] >= 1 and info["t"] >= 5e-3 - 1e-12
    assert np.isfinite(np.asarray(s_ad.T)).all()


def test_eta_vmapped_sweep_in_3d(model):
    """Batched η sweeps work in 3-D exactly as in 2-D: the regularization
    factor may be a TRACED scalar through field + forcing + corrector, so one
    vmapped program evaluates every η at once — must match per-η runs to
    roundoff."""
    from na_dd_tpu.three_d import (
        FieldRegHCsTriple3,
        MMSForcingRegHCsTriple3,
        PCTrapezoidalRegHCsTriple3,
    )
    from na_dd_tpu.three_d.harness import build_runner3
    from na_dd_tpu.three_d.mms import MMSCaseExpSin3

    g = make_uniform_grid3(4, 4, 4)
    case = MMSCaseExpSin3(g, model)
    etas = [10.0, 100.0]

    def run_eta(eta):
        forcing = MMSForcingRegHCsTriple3(
            mms_case=case, model=model, regularization_factor=eta
        )
        field = FieldRegHCsTriple3(
            grid=g, model=model, forcing=forcing, regularization_factor=eta
        )
        integ = PCTrapezoidalRegHCsTriple3(
            field, regularization_factor=eta, krylov_unroll=16
        )
        run, s0 = build_runner3(g, case, integ, Tf=5e-3, dt=2.5e-3)
        _s, worst, _ok, _hcs, _pv = run(s0)
        return jnp.sqrt(worst)

    serial = np.asarray([float(run_eta(e)) for e in etas])
    batched = np.asarray(jax.vmap(run_eta)(jnp.asarray(etas)))
    np.testing.assert_allclose(batched, serial, rtol=1e-13)


def test_checkpointed_run_in_3d(model, tmp_path):
    """run_checkpointed (harness/checkpoint.py) is dimension-agnostic: a 3-D
    checkpointed run must equal the straight 3-D simulate() result exactly,
    and resuming from the last checkpoint must reproduce it."""
    from na_dd_tpu.harness.checkpoint import run_checkpointed
    from na_dd_tpu.harness.simulate import simulate
    from na_dd_tpu.three_d import make_integrator3

    g = make_uniform_grid3(5, 5, 5)
    integ = make_integrator3(g, model)
    bump = (
        jnp.sin(jnp.pi * g.xx) * jnp.sin(jnp.pi * g.yy) * jnp.sin(jnp.pi * g.zz)
    ) * g.interior_mask
    s0 = State(cp=0.2 * bump, T=0.1 * bump, cl=0.0 * bump, cd=0.05 * bump, cs=bump)
    dt = 1e-3

    step_fn = lambda s, t, dts: integ.step_fn(g, OPS, s, t, dts)[0]  # noqa: E731
    d = str(tmp_path / "ck3")
    s_ck, t_fin = run_checkpointed(
        step_fn, s0, t0=0.0, dt=dt, num_steps=4, directory=d, every=2
    )
    s_straight, _, _ = simulate(integ, g, s0, dt=dt, num_steps=4, ops=OPS)
    assert abs(t_fin - 4 * dt) < 1e-15
    for v in State._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(s_ck, v)), np.asarray(getattr(s_straight, v))
        )

    # resume: drop back to the step-2 checkpoint and integrate to step 4
    s_res, _ = run_checkpointed(
        step_fn, s0, t0=0.0, dt=dt, num_steps=4, directory=d, every=2, resume=True
    )
    for v in State._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(s_res, v)), np.asarray(getattr(s_ck, v))
        )


def test_batched_ladder3_matches_serial(model):
    """The pad-to-max + vmap 3-D ladder (ONE compile for all levels) must
    reproduce the per-level serial runner: zero padding is exactly inert
    (0-sentinel metrics, masked weights incl. w_g*, recomputed colorings)."""
    from na_dd_tpu.three_d.batched_ladder import run_spatial_ladder3_batched

    res = run_spatial_ladder3_batched(
        MMSCaseExpSin3, model=model, levels=2, base_N=4, verbose=False
    )
    assert all(res["converged"]), res["converged"]
    for i, N in enumerate(res["Ns"]):
        e_serial = mms_error3(
            MMSCaseExpSin3,
            N=N,
            model=model,
            Tf=0.02,
            dt=1e-2 / 2**i,
            integrator_params=dict(
                num_newton_steps=2, krylov_unroll=24, krylov_scanned=True
            ),
        )
        d = abs(res["errors"][i] - e_serial) / e_serial
        assert d < 1e-12, (N, res["errors"][i], e_serial, d)


def test_stencil7_pallas_apply_interpret(model):
    """The 3-D single-block Pallas apply (interpret mode) must equal the jnp
    Stencil7.apply exactly on a nonuniform grid with a full Newton-operator
    stencil.  (Real-Mosaic lowering validation is queued on hardware —
    studies/tpu_queue_r3d.sh; until then the 3-D integrators do not route
    through the kernel.)"""
    from na_dd_tpu.ops.pallas_kernels import apply3_fits, stencil7_apply_pallas
    from na_dd_tpu.three_d import newton_planes3

    rng = np.random.RandomState(11)
    g, field, s = _rand_setup(model, rng)
    st = newton_planes3(g, OPS, field.stencil_dFcd_dcd(g, OPS, s), 1e-3)
    u = jnp.asarray(rng.randn(*g.full_shape))
    assert apply3_fits(u.shape, u.dtype)
    got = stencil7_apply_pallas(st, u, interpret=True)
    want = st.apply(OPS, u)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=1e-12)


def test_bicgstab_solve3_pallas_interpret(model):
    """The fused 3-D whole-solve kernel (interpret mode) must reproduce
    bicgstab_unrolled on a Newton system: same solution, same effective
    iteration count (identical _bicgstab_inline update)."""
    from na_dd_tpu.ops import linsolve
    from na_dd_tpu.ops.pallas_kernels import bicgstab_solve3_pallas, fused_solve3_fits
    from na_dd_tpu.three_d import newton_planes3

    rng = np.random.RandomState(12)
    g, field, s = _rand_setup(model, rng)
    st = newton_planes3(g, OPS, field.stencil_dFT_dT(g, OPS, s), 1e-3)
    mask = g.interior_mask
    b = jnp.asarray(rng.randn(*g.full_shape)) * mask
    inv_diag = jnp.where(mask > 0, 1.0 / jnp.where(st.c0 == 0, 1.0, st.c0), 0.0)
    assert fused_solve3_fits(b.shape, b.dtype)

    x_k, info_k = bicgstab_solve3_pallas(
        st, b, inv_diag, mask, tol=1e-13, iters=32, interpret=True
    )
    x_u, info_u = linsolve.bicgstab_unrolled(
        lambda w: st.apply(OPS, w),
        b,
        jnp.zeros_like(b),
        dot=lambda u, v: OPS.asum(u * v),
        minv=lambda r: r * inv_diag,
        tol=1e-13,
        iters=32,
    )
    assert bool(info_k["converged"]) and bool(info_u["converged"])
    assert int(info_k["iters"]) == int(info_u["iters"])
    np.testing.assert_allclose(
        np.asarray(x_k * mask), np.asarray(x_u * mask), rtol=0, atol=1e-12
    )


def test_f32_mode_in_3d(model):
    """The f32 production mode (x64 disabled) must engage end-to-end in 3-D:
    f32 grid/state, dtype-aware Krylov tolerance, converged solves, and an
    error within 10% of the f64 value at a coarse level (far above the f32
    floor) — mirror of tests/test_f32_mode.py."""
    kw = dict(N=6, model=model, Tf=0.01, dt=2.5e-3)
    e64 = mms_error3(MMSCaseExpSin3, **kw)

    with jax.enable_x64(False):
        g, case, _field, integ = make_setup3(
            MMSCaseExpSin3, N=6, model=model, integrator_params=dict(krylov_unroll=24)
        )
        assert g.xx.dtype == jnp.float32
        assert integ.krylov_tol == 1e-5  # dtype-aware default, resolved f32
        out = run_trial3(g, case, integ, Tf=0.01, dt=2.5e-3)
        assert out["state"].T.dtype == jnp.float32
        assert out["krylov_converged"]
        e32 = out["error"]

    assert np.isfinite(e32)
    assert abs(e32 - e64) / e64 < 0.1, (e32, e64)


# ----------------------------------------------------------------------
# sharded parity: the full PC step on a 2-D device mesh
# ----------------------------------------------------------------------
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_sharded_pc3_step_matches_local(model):
    """One full 3-D PC step (Newton sweeps, Krylov solves with psum dots,
    MMS forcing incl. the 27-point quadrature via halo shifts, RegHCs
    pointwise-Newton corrector with pmax early exit) on a (4, 2) mesh must
    reproduce the local step to roundoff."""
    g, case, field, integ = make_setup3(
        MMSCaseExpSin3,
        model=model,
        grid=make_uniform_grid3(7, 7, 6),  # 8 x 8 x 7 arrays: 4 x 2 shards
        integrator_params=dict(krylov_unroll=24),
    )
    s0 = state_from_mms_when3(mms_case=case, t=0.0, grid=g)
    t0, dt = 0.0, 1e-3

    s1_local, diag_local = integ.step_fn(g, OPS, s0, t0, dt)

    mesh = make_mesh((4, 2), ("x", "y"))
    hops = HaloOps3(axis_x="x", nx=4, axis_y="y", ny=2)
    spec = P("x", "y")

    def raw(g_sh, s_sh):
        s1, diag = integ.step_fn(g_sh, hops, s_sh, t0, dt)
        # split per-node residual arrays (sharded) from the psum/pmax-built
        # scalars (mesh-invariant, so P() passes the check_vma net)
        return (
            s1,
            (diag.residual_T, diag.residual_cl, diag.residual_cd),
            (diag.krylov_iters, diag.krylov_converged),
        )

    sharded = jax.jit(
        jax.shard_map(
            raw,
            mesh=mesh,
            in_specs=(spec, spec),
            out_specs=(spec, (spec, spec, spec), P()),
            check_vma=True,
        )
    )
    put = lambda a: jax.device_put(a, NamedSharding(mesh, P("x", "y", None)))
    s1_sh, res_sh, (iters_sh, conv_sh) = sharded(jax.tree.map(put, g), jax.tree.map(put, s0))

    assert bool(conv_sh)
    for v in State._fields:
        d = np.max(np.abs(np.asarray(getattr(s1_sh, v)) - np.asarray(getattr(s1_local, v))))
        assert d < 1e-12, (v, d)
    d_res = np.max(np.abs(np.asarray(res_sh[0]) - np.asarray(diag_local.residual_T)))
    assert d_res < 1e-12, d_res
    # psum reduction order can flip a tolerance comparison at the boundary
    assert abs(int(iters_sh) - int(diag_local.krylov_iters)) <= 3


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_sharded_pc3_whole_simulation_matches_local(model):
    """WHOLE-simulation 3-D parity on the 4×2 mesh: multiple PC steps plus
    the in-scan combined-norm accumulation (H reductions, staggered-gradient
    p-norms, trapezoid integral) under shard_map must reproduce the local
    runner — a y-axis halo or weight-partition bug that only compounds over
    steps would be caught here (the single-step gate above would miss it)."""
    from na_dd_tpu.three_d.harness import build_runner3

    g, case, _field, integ = make_setup3(
        MMSCaseExpSin3,
        model=model,
        grid=make_uniform_grid3(7, 7, 6),
        integrator_params=dict(krylov_unroll=24),
    )
    Tf, dt = 4e-3, 1e-3

    run_local, s0 = build_runner3(g, case, integ, Tf=Tf, dt=dt)
    sf_l, worst_l, ok_l, _hcs_l, per_l = run_local(s0)
    assert bool(ok_l)

    mesh = make_mesh((4, 2), ("x", "y"))
    hops = HaloOps3(axis_x="x", nx=4, axis_y="y", ny=2)
    spec = P("x", "y")

    def raw(g_sh, s_sh):
        run, _s0_sh = build_runner3(g_sh, case, integ, Tf=Tf, dt=dt, ops=hops)
        s_fin, worst, ok, hcs_ok, per_var = run(s_sh)
        return s_fin, (worst, ok, hcs_ok, per_var)

    sharded = jax.jit(
        jax.shard_map(
            raw,
            mesh=mesh,
            in_specs=(spec, spec),
            out_specs=(spec, P()),
            check_vma=True,
        )
    )
    put = lambda a: jax.device_put(a, NamedSharding(mesh, P("x", "y", None)))  # noqa: E731
    sf_s, (worst_s, ok_s, _hcs_s, per_s) = sharded(
        jax.tree.map(put, g), jax.tree.map(put, s0)
    )
    assert bool(ok_s)
    for v in State._fields:
        d = np.max(np.abs(np.asarray(getattr(sf_s, v)) - np.asarray(getattr(sf_l, v))))
        assert d < 1e-12, (v, d)
        # per-var final H errors: psum-of-partials vs one global sum
        np.testing.assert_allclose(
            float(per_s[v]), float(per_l[v]), rtol=1e-8, atol=1e-22
        )
    np.testing.assert_allclose(float(worst_s), float(worst_l), rtol=1e-8)
