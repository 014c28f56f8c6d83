"""Pallas stencil kernel vs the jnp Stencil5.apply reference (interpret mode
on CPU; the compiled path is exercised on TPU by the f32 production mode)."""

import numpy as np
import jax.numpy as jnp

from na_dd_tpu.ops import LOCAL_OPS, linsolve, make_uniform_grid
from na_dd_tpu.ops.pallas_kernels import stencil5_apply_pallas


def _random_stencil(shape, rng, dtype):
    mk = lambda: jnp.asarray(rng.rand(*shape), dtype=dtype)
    return linsolve.Stencil5(c0=mk(), cxm=mk(), cxp=mk(), cym=mk(), cyp=mk())


def test_stencil5_pallas_matches_jnp():
    rng = np.random.RandomState(5)
    for shape in [(9, 9), (17, 33)]:
        st = _random_stencil(shape, rng, jnp.float64)
        u = jnp.asarray(rng.rand(*shape))
        ref = st.apply(LOCAL_OPS, u)
        out = stencil5_apply_pallas(st, u, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-14)


def test_stencil5_pallas_f32():
    rng = np.random.RandomState(6)
    shape = (33, 33)
    st = _random_stencil(shape, rng, jnp.float32)
    u = jnp.asarray(rng.rand(*shape), dtype=jnp.float32)
    ref = st.apply(LOCAL_OPS, u)
    out = stencil5_apply_pallas(st, u, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_stencil5_pallas_on_probed_operator():
    """End-to-end: probe a real Newton operator's stencil and apply it with
    the kernel."""
    import jax

    from na_dd_tpu.core import FieldRegHCsTriple, NoForcing, State

    from na_dd_tpu.models import Model02, default_model_consts
    from na_dd_tpu.ops import LOCAL_OPS as OPS

    g = make_uniform_grid(8, 8)
    model = Model02(default_model_consts)
    field = FieldRegHCsTriple(grid=g, model=model, forcing=NoForcing(), regularization_factor=50.0)
    rng = np.random.RandomState(7)
    s = State(*(jnp.asarray(0.4 + 0.1 * rng.rand(*g.full_shape)) for _ in range(5)))
    dt = 1e-3
    _, matvec = linsolve.interior_linearized_matvec(
        lambda T: field.FT(g, OPS, s._replace(T=T), 0.0), s.T, g, dt
    )
    st = linsolve.probe_stencil(matvec, g)
    w = jnp.asarray(rng.rand(*g.full_shape))
    np.testing.assert_allclose(
        np.asarray(stencil5_apply_pallas(st, w, interpret=True)),
        np.asarray(matvec(w)),
        rtol=1e-12,
        atol=1e-15,
    )


def test_bicgstab_solve_pallas_matches_unrolled():
    """The fused whole-solve kernel runs the exact bicgstab_unrolled update,
    so on the same system it must land on (essentially) the same solution."""
    from na_dd_tpu.ops.pallas_kernels import bicgstab_solve_pallas

    g = make_uniform_grid(10, 12)
    rng = np.random.RandomState(11)
    mask = g.interior_mask
    # diagonally dominant Newton-like stencil (2I - dt L shape)
    shape = g.full_shape
    mk = lambda s: jnp.asarray(s * rng.rand(*shape)) * mask
    st = linsolve.Stencil5(
        c0=(2.0 + mk(0.4)) * mask, cxm=mk(0.1), cxp=mk(0.1), cym=mk(0.1), cyp=mk(0.1)
    )
    x_true = jnp.asarray(rng.rand(*shape)) * mask
    b = st.apply(LOCAL_OPS, x_true)
    inv_diag = jnp.where(mask > 0, 1.0 / jnp.where(st.c0 == 0, 1.0, st.c0), 0.0)
    dot = lambda u, v: LOCAL_OPS.asum(u * v)

    x_ref, info_ref = linsolve.bicgstab_unrolled(
        lambda w: st.apply(LOCAL_OPS, w), b * mask, jnp.zeros_like(b),
        dot=dot, minv=lambda r: r * inv_diag, tol=1e-13, iters=24,
    )
    x_pal, info_pal = bicgstab_solve_pallas(
        st, b * mask, inv_diag, mask, tol=1e-13, iters=24, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(x_pal), np.asarray(x_ref * mask), rtol=1e-10, atol=1e-12
    )
    assert float(jnp.max(jnp.abs(x_pal - x_true))) < 1e-9
    assert bool(info_pal["converged"])
    # the in-kernel early-exit counter matches the unrolled solver's
    assert int(info_pal["iters"]) == int(info_ref["iters"])


def test_integrator_pallas_backend_matches_jnp_on_cpu():
    """The integrated pallas path (fused whole-solve kernel inside the PC
    step, interpret mode on CPU) must reproduce the jnp backend's study
    error essentially exactly."""
    from na_dd_tpu.harness.studies import _make_trial, study_consts
    from na_dd_tpu.mms import cases as mms_cases

    mc = study_consts("pol")
    kw = dict(mc=mc, krylov_unroll=8)
    e_jnp = (
        _make_trial(mms_cases.MMSCasePol, 12, 50.0, **kw)
        .run_for_errors(Tf=0.01, dt=1e-3)
        .overall_combined_error
    )
    e_pal = (
        _make_trial(mms_cases.MMSCasePol, 12, 50.0, stencil_backend="pallas", **kw)
        .run_for_errors(Tf=0.01, dt=1e-3)
        .overall_combined_error
    )
    assert abs(e_pal - e_jnp) <= 1e-10 * abs(e_jnp), (e_jnp, e_pal)


def test_vmem_budget_predicates():
    """The fallback chain (fused solve -> apply-only kernel -> jnp) is driven
    by these predicates; pin their boundaries so a silent budget change
    cannot reintroduce the trace-time AssertionError crash at large N."""
    from na_dd_tpu.ops.pallas_kernels import _VMEM_LIMIT_BYTES, apply_fits, fused_solve_fits

    assert fused_solve_fits((257, 257), jnp.float32)     # the bench level
    assert apply_fits((257, 257), jnp.float32)
    # beyond the fused-solve budget but still within the apply budget
    assert not fused_solve_fits((513, 513), jnp.float32)
    assert apply_fits((513, 513), jnp.float32)
    # beyond everything: jnp path
    assert not apply_fits((1025, 1025), jnp.float32)
    # exact boundary arithmetic
    import numpy as np
    n = int(np.sqrt(_VMEM_LIMIT_BYTES // (4 * 16)))
    assert fused_solve_fits((n, n), jnp.float32)
    assert not fused_solve_fits((n + 1, n + 1), jnp.float32)


def test_stencil5_tiled_matches_jnp_ragged_and_exact():
    """Row-tiled grid kernel == Stencil5.apply for ragged (R % T != 0) and
    tile-exact row counts, at several tile sizes including T=1-block edge
    programs (first/last halo zeroing)."""
    from na_dd_tpu.ops.pallas_kernels import stencil5_apply_tiled

    rng = np.random.RandomState(7)
    for shape, tiles in [((33, 33), [8, 16, 32]), ((40, 17), [8, 40]),
                         ((9, 129), [8])]:
        st = _random_stencil(shape, rng, jnp.float64)
        u = jnp.asarray(rng.rand(*shape))
        ref = np.asarray(st.apply(LOCAL_OPS, u))
        for T in tiles:
            out = stencil5_apply_tiled(st, u, row_tile=T, interpret=True)
            np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-14,
                                       err_msg=f"shape={shape} T={T}")


def test_stencil5_tiled_auto_tile_pick():
    """_pick_row_tile respects the VMEM budget and the tiled apply engages
    (and is exact) at a shape beyond the single-block predicate."""
    from na_dd_tpu.ops.pallas_kernels import (
        _VMEM_LIMIT_BYTES,
        _pick_row_tile,
        apply_fits,
        stencil5_apply_tiled,
    )

    # N=1024 f32 exceeds the single-block budget -> the integrator routes to
    # the tiled kernel; its auto tile must fit 7 row-blocks in VMEM
    big = (1025, 1025)
    assert not apply_fits(big, jnp.float32)
    T = _pick_row_tile(big, jnp.float32)
    cols_padded = -(-1025 // 128) * 128
    assert T >= 8 and T * cols_padded * 4 * 7 <= _VMEM_LIMIT_BYTES

    # numerically exact at a (cheap) ragged shape with the auto tile
    rng = np.random.RandomState(8)
    shape = (129, 65)
    st = _random_stencil(shape, rng, jnp.float32)
    u = jnp.asarray(rng.rand(*shape), dtype=jnp.float32)
    out = stencil5_apply_tiled(st, u, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(st.apply(LOCAL_OPS, u)), rtol=1e-6
    )


def test_fused_triple_solve_matches_per_solve_path():
    """backend='pallas' + coupling_source='analytic' routes the whole sweep
    through triple_solve_pallas (ONE kernel); the study error must match the
    per-solve analytic-coupling path to rounding, and the per-solve
    iteration diagnostics must survive the SMEM readback."""
    from na_dd_tpu.harness.studies import _make_trial, study_consts
    from na_dd_tpu.mms import cases as mms_cases
    from na_dd_tpu.mms.engine import state_from_mms_when

    def run(**kw):
        trial = _make_trial(
            mms_cases.MMSCasePol, 16, 50.0, mc=study_consts("pol"),
            krylov_unroll=8, **kw,
        )
        s = trial.run_for_errors(Tf=0.01, dt=5e-4)
        return trial, float(s.overall_combined_error)

    _, e_ref = run(coupling_source="analytic")
    trial_f, e_fused = run(coupling_source="analytic", stencil_backend="pallas")
    np.testing.assert_allclose(e_fused, e_ref, rtol=1e-9)

    # step diagnostics flow through (iters summed over the three solves)
    s0 = state_from_mms_when(
        mms_case=trial_f.mms_case, t=0.0, grid=trial_f.grid
    )
    _, diag = trial_f.integrator.step_fn(
        trial_f.grid, LOCAL_OPS, s0, 0.0, 1e-3
    )
    assert int(diag.krylov_iters) > 0
    assert bool(diag.krylov_converged)


def test_kernel_jaxprs_are_64bit_clean_under_x64():
    """Mosaic lowers neither f64 nor int64 (int64 conversion recurses
    unboundedly — measured RecursionError on TPU in the mixed+pallas mode,
    which traces the kernels with x64 ENABLED).  Guard: tracing every
    kernel entry point with f32 operands under x64 must produce jaxprs with
    no 64-bit dtype anywhere (the weak-python-int trap: `jnp.where(done, 0,
    1)` materializes int64 under x64)."""
    import jax

    from na_dd_tpu.ops.pallas_kernels import (
        bicgstab_solve_pallas,
        stencil5_apply_pallas,
        stencil5_apply_tiled,
        triple_solve_pallas,
    )

    rng = np.random.RandomState(11)
    shape = (17, 17)
    st = _random_stencil(shape, rng, jnp.float32)
    f = lambda: jnp.asarray(rng.rand(*shape), dtype=jnp.float32)
    u, invd, mask = f(), f(), jnp.ones(shape, jnp.float32)

    traces = {
        "apply": jax.make_jaxpr(
            lambda st, u: stencil5_apply_pallas(st, u, interpret=True)
        )(st, u),
        "tiled": jax.make_jaxpr(
            lambda st, u: stencil5_apply_tiled(st, u, row_tile=8, interpret=True)
        )(st, u),
        "solve": jax.make_jaxpr(
            lambda st, b, d, m: bicgstab_solve_pallas(
                st, b, d, m, tol=1e-5, iters=3, interpret=True
            )
        )(st, u, invd, mask),
        "triple": jax.make_jaxpr(
            lambda st, b, d, m: triple_solve_pallas(
                st, st, st, st, st, b, b, b, b, d, d, d, m, 1e-3,
                tol=1e-5, iters=3, interpret=True,
            )
        )(st, u, invd, mask),
    }

    # 3-D Stencil7 entry points (routed by the 3-D integrators' _pallas_ops
    # hook, incl. inside the mixed+pallas mode that traces under x64)
    from na_dd_tpu.ops.pallas_kernels import (
        bicgstab_solve3_pallas,
        stencil7_apply_pallas,
    )
    from na_dd_tpu.three_d.diffusion import Stencil7

    shape3 = (9, 9, 9)
    st3 = Stencil7(
        *(jnp.asarray(rng.rand(*shape3), dtype=jnp.float32) for _ in range(7))
    )
    u3 = jnp.asarray(rng.rand(*shape3), dtype=jnp.float32)
    invd3 = jnp.asarray(rng.rand(*shape3), dtype=jnp.float32)
    mask3 = jnp.ones(shape3, jnp.float32)
    traces["apply3"] = jax.make_jaxpr(
        lambda st, u: stencil7_apply_pallas(st, u, interpret=True)
    )(st3, u3)
    traces["solve3"] = jax.make_jaxpr(
        lambda st, b, d, m: bicgstab_solve3_pallas(
            st, b, d, m, tol=1e-5, iters=3, interpret=True
        )
    )(st3, u3, invd3, mask3)
    for name, jaxpr in traces.items():
        text = str(jaxpr)
        for bad in ("f64", "i64", "u64"):
            assert bad not in text, f"{name} kernel trace contains {bad} under x64"


def _random_stencil7(shape, rng, dtype):
    from na_dd_tpu.three_d.diffusion import Stencil7

    mk = lambda: jnp.asarray(rng.rand(*shape), dtype=dtype)
    return Stencil7(c0=mk(), cxm=mk(), cxp=mk(), cym=mk(), cyp=mk(),
                    czm=mk(), czp=mk())


def test_stencil7_tiled_matches_jnp_ragged_and_exact():
    """x-slab-tiled 3-D grid kernel == Stencil7.apply for ragged (A % T != 0)
    and tile-exact slab counts, at several tile sizes including T=1
    (every program sees both halo paths)."""
    from na_dd_tpu.ops.pallas_kernels import stencil7_apply_tiled
    from na_dd_tpu.three_d.shifts import LOCAL_OPS3

    rng = np.random.RandomState(17)
    for shape, tiles in [((9, 9, 9), [1, 2, 4]), ((12, 7, 5), [3, 4, 12]),
                         ((5, 6, 129), [2])]:
        st = _random_stencil7(shape, rng, jnp.float64)
        u = jnp.asarray(rng.rand(*shape))
        ref = np.asarray(st.apply(LOCAL_OPS3, u))
        for T in tiles:
            out = stencil7_apply_tiled(st, u, slab_tile=T, interpret=True)
            np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-14,
                                       err_msg=f"shape={shape} T={T}")


def test_stencil7_tiled_auto_tile_pick_and_fallback_boundary():
    """_pick_slab_tile3 respects the double-buffered tile-padded VMEM budget;
    apply3_tiled_fits covers the integrator's fallback chain boundaries
    (single-block -> tiled -> jnp)."""
    from na_dd_tpu.ops.pallas_kernels import (
        _VMEM_LIMIT_BYTES,
        _pick_slab_tile3,
        apply3_fits,
        apply3_tiled_fits,
        stencil7_apply_tiled,
    )

    # N=64 cube exceeds the single-block budget -> tiled engages
    big = (65, 65, 65)
    assert not apply3_fits(big, jnp.float32)
    T = _pick_slab_tile3(big, jnp.float32)
    b_pad, c_pad = 72, 128
    assert T >= 1 and 2 * (9 * T + 2) * b_pad * c_pad * 4 <= _VMEM_LIMIT_BYTES
    assert apply3_tiled_fits(big, jnp.float32)
    # far beyond any feasible tile -> the integrator hook falls back to jnp
    assert not apply3_tiled_fits((385, 385, 385), jnp.float32)

    # numerically exact at a (cheap) ragged shape with the auto tile
    rng = np.random.RandomState(18)
    shape = (11, 9, 13)
    st = _random_stencil7(shape, rng, jnp.float32)
    u = jnp.asarray(rng.rand(*shape), dtype=jnp.float32)
    from na_dd_tpu.three_d.shifts import LOCAL_OPS3

    out = stencil7_apply_tiled(st, u, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(st.apply(LOCAL_OPS3, u)), rtol=1e-6
    )
