"""Mixed-precision (f32 Krylov + f64 refinement) parity gates.

precision="mixed" keeps the state/fields/right-hand sides in f64 but runs
every Krylov iteration in native f32 under classical iterative refinement
(pc_trapezoidal.solve_assembled_mixed).  The contract: the refined linear
solves reach the SAME f64 tolerance as the full-f64 path, so the end-to-end
study error must agree with the f64 parity-certified value to deep-rounding
level — NOT to the f32 error floor.  (Contrast tests/test_f32_mode.py, where
the pure-f32 mode is only gated to 10%.)
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from na_dd_tpu.harness.studies import _make_trial, study_consts
from na_dd_tpu.mms import cases as mms_cases


def _pol_summary(**integ_kwargs):
    trial = _make_trial(
        mms_cases.MMSCasePol, 16, 50.0, mc=study_consts("pol"), krylov_unroll=8,
        **integ_kwargs,
    )
    return trial, trial.run_for_errors(Tf=0.01, dt=5e-4)


def test_mixed_matches_f64_parity():
    """End-to-end study error in mixed mode sits on the f64 value (far below
    the ~1e-2-relative f32 deviation), with every refined solve converged to
    the f64 tolerance and no Krylov warnings."""
    _, s64 = _pol_summary()
    e64 = float(s64.overall_combined_error)

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        trial_m, s_m = _pol_summary(precision="mixed")
    e_m = float(s_m.overall_combined_error)

    assert trial_m.integrator.precision == "mixed"
    # state stays f64 — only the inner Krylov iterations downcast
    assert trial_m.initial_state.T.dtype == jnp.float64
    assert not [w for w in caught if "Krylov" in str(w.message)], (
        "mixed-mode refined solves must reach the f64 tolerance"
    )
    # e64 ~1e-6 at N=16; pure f32 deviates ~1.6e-2 relative (test_f32_mode).
    # Refined mixed solves must reproduce the f64 trajectory ~exactly.
    assert abs(e_m - e64) / e64 < 1e-8, f"mixed {e_m} vs f64 {e64}"


def test_mixed_with_pallas_kernels_matches_f64():
    """precision='mixed' + stencil_backend='pallas' — the f32-only Mosaic
    kernels running INSIDE an f64-accurate run (interpret mode on CPU)."""
    _, s64 = _pol_summary()
    e64 = float(s64.overall_combined_error)
    _, s_mp = _pol_summary(precision="mixed", stencil_backend="pallas")
    e_mp = float(s_mp.overall_combined_error)
    assert abs(e_mp - e64) / e64 < 1e-8, f"mixed+pallas {e_mp} vs f64 {e64}"


def test_mixed_fused_triple_block_refinement_matches_f64():
    """precision='mixed' + pallas + analytic couplings routes the WHOLE
    triangular sweep through block-triangular iterative refinement around
    the fused f32 triple kernel (one kernel launch per refinement pass —
    the round-4 full-accuracy perf path).  Study error must sit on the f64
    value, and the diagnostics must survive the SMEM readback + f64
    verdicts."""
    from na_dd_tpu.mms.engine import state_from_mms_when
    from na_dd_tpu.ops import LOCAL_OPS

    _, s64 = _pol_summary()
    e64 = float(s64.overall_combined_error)
    trial, s_bt = _pol_summary(
        precision="mixed", stencil_backend="pallas", coupling_source="analytic"
    )
    e_bt = float(s_bt.overall_combined_error)
    assert abs(e_bt - e64) / e64 < 1e-8, f"block-refined {e_bt} vs f64 {e64}"

    s0 = state_from_mms_when(mms_case=trial.mms_case, t=0.0, grid=trial.grid)
    _, diag = trial.integrator.step_fn(trial.grid, LOCAL_OPS, s0, 0.0, 1e-3)
    assert int(diag.krylov_iters) > 0
    assert bool(diag.krylov_converged)

    # one refinement pass fewer (NA_DD_TPU_MIXED_REFINE A/B lever): still on
    # the f64 value for this well-conditioned protocol
    trial1, s_bt1 = _pol_summary(
        precision="mixed", stencil_backend="pallas",
        coupling_source="analytic", mixed_refine=1,
    )
    assert trial1.integrator.mixed_refine == 1
    e_bt1 = float(s_bt1.overall_combined_error)
    assert abs(e_bt1 - e64) / e64 < 1e-8, f"refine=1 {e_bt1} vs f64 {e64}"


def test_mixed_requires_x64_and_assembled_stencils():
    from na_dd_tpu.core import FieldRegHCsTriple, MMSForcingRegHCsTriple
    from na_dd_tpu.integrators import PCTrapezoidalRegHCsTriple
    from na_dd_tpu.models import Model02
    from na_dd_tpu.ops import LOCAL_OPS, make_uniform_grid

    grid = make_uniform_grid(8, 8)
    model = Model02(study_consts("pol"))
    mms = mms_cases.MMSCasePol(grid, model=model)
    forcing = MMSForcingRegHCsTriple(
        mms_case=mms, model=model, regularization_factor=50.0
    )
    field = FieldRegHCsTriple(
        grid=grid, model=model, forcing=forcing, regularization_factor=50.0
    )

    with pytest.raises(ValueError, match="assemble_stencil"):
        PCTrapezoidalRegHCsTriple(
            field, regularization_factor=50.0, precision="mixed",
            assemble_stencil=False,
        )

    with pytest.raises(ValueError, match="precision"):
        PCTrapezoidalRegHCsTriple(
            field, regularization_factor=50.0, precision="half"
        )

    integ = PCTrapezoidalRegHCsTriple(
        field, regularization_factor=50.0, precision="mixed", krylov_unroll=8
    )
    from na_dd_tpu.mms.engine import state_from_mms_when

    s0 = state_from_mms_when(mms_case=mms, t=0.0, grid=grid)
    with jax.enable_x64(False):
        with pytest.raises(ValueError, match="x64"):
            # tracing the step materializes the f32 ambient dtype → refuse
            integ.step_fn(
                jax.tree.map(lambda a: a.astype(jnp.float32), grid),
                LOCAL_OPS,
                jax.tree.map(lambda a: a.astype(jnp.float32), s0),
                0.0,
                1e-3,
            )


def test_mixed_iters_diagnostic_counts_all_passes():
    """The step diagnostics must report the summed inner iterations across
    refinement passes (3 passes at mixed_refine=2 → strictly more iterations
    than the single-pass f64 solve)."""
    from na_dd_tpu.mms.engine import state_from_mms_when
    from na_dd_tpu.ops import LOCAL_OPS

    def diag_for(**kw):
        trial = _make_trial(
            mms_cases.MMSCasePol, 8, 50.0, mc=study_consts("pol"),
            krylov_unroll=8, **kw,
        )
        s0 = state_from_mms_when(
            mms_case=trial.mms_case, t=0.0, grid=trial.grid
        )
        _, diag = trial.integrator.step_fn(
            trial.grid, LOCAL_OPS, s0, 0.0, 1e-3
        )
        return diag

    d64 = diag_for()
    dm = diag_for(precision="mixed")
    assert int(dm.krylov_iters) > int(d64.krylov_iters)
    assert bool(dm.krylov_converged)


def test_honest_residual_paths_converged_under_multi_sweep():
    """The 2nd Newton sweep's rhs is a near-cancellation of O(||Y||) terms,
    so it carries ~eps·||Y|| of absolute rounding noise; the honest-TRUE-
    residual paths (mixed refinement, BCR direct) must not flag a solve
    unconverged for sitting at that floor (their target is
    max(tol²·||b||², (10·eps·||Y||)²) — regression for a spurious
    krylov_converged=False at resnorm_sq ~1e-39 with num_newton_steps=2)."""
    from na_dd_tpu.harness.studies import _make_trial, study_consts
    from na_dd_tpu.mms import cases as mms_cases
    from na_dd_tpu.mms.engine import state_from_mms_when
    from na_dd_tpu.ops import LOCAL_OPS

    for kw in (dict(precision="mixed"), dict(linear_solver="direct")):
        trial = _make_trial(
            mms_cases.MMSCasePol, 8, 50.0, mc=study_consts("pol"),
            krylov_unroll=16, num_newton_steps=2, **kw,
        )
        s0 = state_from_mms_when(mms_case=trial.mms_case, t=0.0, grid=trial.grid)
        _, diag = trial.integrator.step_fn(trial.grid, LOCAL_OPS, s0, 0.0, 1e-3)
        assert bool(diag.krylov_converged), (kw, float(diag.krylov_resnorm_sq))


def test_mixed_final_check_off_is_bit_identical_and_cheaper_graph():
    """mixed_final_check=False skips only the diagnostic-only final f64
    residual: the stepped STATE must be bit-identical to the default path
    (the refinement passes are untouched), the verdict degrades to the last
    inner f32 solve's flag, and both the per-system and fused-triple block
    paths honor the knob (the latter exercised via interpret-mode pallas on
    CPU)."""
    from na_dd_tpu.mms.engine import state_from_mms_when
    from na_dd_tpu.ops import LOCAL_OPS

    for extra in (
        dict(),
        dict(stencil_backend="pallas", coupling_source="analytic"),
    ):
        def step_out(**kw):
            trial = _make_trial(
                mms_cases.MMSCasePol, 8, 50.0, mc=study_consts("pol"),
                krylov_unroll=8, precision="mixed", **extra, **kw,
            )
            s0 = state_from_mms_when(
                mms_case=trial.mms_case, t=0.0, grid=trial.grid
            )
            return trial.integrator.step_fn(
                trial.grid, LOCAL_OPS, s0, 0.0, 1e-3
            )

        s_on, d_on = step_out()
        s_off, d_off = step_out(mixed_final_check=False)
        for a, b in zip(s_on, s_off):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert bool(d_on.krylov_converged) and bool(d_off.krylov_converged)
        assert int(d_on.krylov_iters) == int(d_off.krylov_iters)


def test_mixed_final_check_env_default(monkeypatch):
    monkeypatch.setenv("NA_DD_TPU_MIXED_CHECK", "0")
    trial = _make_trial(
        mms_cases.MMSCasePol, 8, 50.0, mc=study_consts("pol"),
        precision="mixed",
    )
    assert trial.integrator.mixed_final_check is False


def test_mixed_df_residuals_match_f64_per_system_path():
    """mixed_df=True: the refinement's true residuals run in double-float
    (two-f32 EFT, ops/doublefloat.py) instead of emulated f64.  The study
    error must still sit on the f64 parity value — the DF residual's
    ~2^-47·‖b‖ absolute error is far inside the refinement contraction."""
    _, s64 = _pol_summary()
    e64 = float(s64.overall_combined_error)
    trial, s_df = _pol_summary(precision="mixed", mixed_df=True)
    assert trial.integrator.mixed_df
    e_df = float(s_df.overall_combined_error)
    assert abs(e_df - e64) / e64 < 1e-8, f"mixed_df {e_df} vs f64 {e64}"


def test_mixed_df_block_triple_matches_f64():
    """mixed_df on the fused block-triangular sweep (pallas + analytic):
    all three block residuals in DF, one f32 kernel launch per pass — the
    production mixed_fast path candidate.  Gate at the same 1e-8 as the
    emulated-f64 refinement, at both refine=2 (default) and refine=1 (the
    mixed_fast setting)."""
    _, s64 = _pol_summary()
    e64 = float(s64.overall_combined_error)
    for refine in (2, 1):
        trial, s_df = _pol_summary(
            precision="mixed", stencil_backend="pallas",
            coupling_source="analytic", mixed_df=True, mixed_refine=refine,
        )
        assert trial.integrator.mixed_df
        e_df = float(s_df.overall_combined_error)
        assert abs(e_df - e64) / e64 < 1e-8, (
            f"mixed_df block refine={refine}: {e_df} vs f64 {e64}"
        )
