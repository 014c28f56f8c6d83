"""precision="df" — the f32-state double-float integrator step (round 5).

The df mode removes the emulated-f64 field/rhs/corrector pipeline from the
step entirely: the state is carried as double-float pairs (two-f32 EFT,
ops/doublefloat.py) and every field evaluation, Jacobian-plane assembly,
rhs near-cancellation and corrector runs in native-f32 DF arithmetic via
the jaxpr lift (ops/df_lift.py); the Newton solves reuse the mixed-mode
iterative refinement with DF residuals.  Algorithm preserved exactly from
the reference (src/prob1base.py:3117-3149 step, :2953-2996 predictors/
correctors) — only the arithmetic substrate changes.

Gate: one full PC step in df mode must reproduce the f64 step to deep
rounding level (measured ~1e-15 relative per field on CPU — DF's 2^-48
per-op roundoff barely accumulates over one step).  The end-to-end study
error is gated on-chip by bench.py's MODE_REFERENCE guard (the df_fast
mode) rather than here.

CPU-specific caveat: the lifted step's XLA graph is ~50-175k primitives and
the CPU backend's LLVM codegen takes tens of minutes on it (the TPU
compiler handles the same graph in ~155 s), so this file runs the step
EAGERLY — op-by-op dispatch, ~1 min, no giant compile.  The jitted path is
exercised on the TPU by bench.py / studies/mixed_perf_probe.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from na_dd_tpu.harness.studies import _make_trial, study_consts
from na_dd_tpu.mms import cases as mms_cases
from na_dd_tpu.mms.engine import state_from_mms_when
from na_dd_tpu.ops import LOCAL_OPS


def _trial(**kw):
    return _make_trial(
        mms_cases.MMSCasePol, 8, 50.0, mc=study_consts("pol"),
        krylov_unroll=8, **kw,
    )


def test_df_step_matches_f64_step_to_rounding():
    """One eager PC step: every field of the df-mode output must sit on the
    f64 output to ~1e-13 relative (measured ~1e-15; the margin covers DF's
    2^-48 per-op noise on other platforms), with converged diagnostics."""
    tr64 = _trial()
    s0 = state_from_mms_when(mms_case=tr64.mms_case, t=0.0, grid=tr64.grid)
    out64, _ = tr64.integrator.step_fn(tr64.grid, LOCAL_OPS, s0, 0.0, 1e-3)

    trdf = _trial(precision="df", mixed_refine=1, mixed_final_check=False)
    assert trdf.integrator.precision == "df"
    outdf, diag = trdf.integrator.step_fn(trdf.grid, LOCAL_OPS, s0, 0.0, 1e-3)

    assert bool(diag.krylov_converged)
    assert int(diag.krylov_iters) > 0
    assert bool(diag.hcs_denominator_ok)
    for name in ("cp", "T", "cl", "cd", "cs"):
        a = np.asarray(getattr(out64, name))
        b = np.asarray(getattr(outdf, name))
        assert b.dtype == a.dtype  # f64 at the API boundary
        den = max(np.max(np.abs(a)), 1e-300)
        dev = np.max(np.abs(a - b)) / den
        assert dev < 1e-13, f"{name}: df vs f64 rel dev {dev:.3e}"
        # boundary semantics preserved (T re-zeroed; cl/cd keep theirs)
        np.testing.assert_array_equal(b[0, :], a[0, :])
        np.testing.assert_array_equal(b[-1, :], a[-1, :])


def test_df_validation_and_requirements():
    from na_dd_tpu.core import FieldRegHCsTriple, MMSForcingRegHCsTriple
    from na_dd_tpu.integrators import PCTrapezoidalRegHCsTriple
    from na_dd_tpu.models import Model02
    from na_dd_tpu.ops import make_uniform_grid

    grid = make_uniform_grid(8, 8)
    model = Model02(study_consts("pol"))
    mms = mms_cases.MMSCasePol(grid, model=model)
    forcing = MMSForcingRegHCsTriple(
        mms_case=mms, model=model, regularization_factor=50.0
    )
    field = FieldRegHCsTriple(
        grid=grid, model=model, forcing=forcing, regularization_factor=50.0
    )

    # needs the closed-form analytic planes and assembled stencils
    with pytest.raises(ValueError, match="assemble_stencil"):
        PCTrapezoidalRegHCsTriple(
            field, regularization_factor=50.0, precision="df",
            assemble_stencil=False,
        )
    with pytest.raises(ValueError, match="analytic"):
        PCTrapezoidalRegHCsTriple(
            field, regularization_factor=50.0, precision="df",
            stencil_source="probe",
        )
    # no VJP through the DF jaxpr interpreter
    with pytest.raises(ValueError, match="differentiable"):
        PCTrapezoidalRegHCsTriple(
            field, regularization_factor=50.0, precision="df",
            differentiable=True,
        )

    # x64 mode is required at trace/eval time (DF splits from f64)
    integ = PCTrapezoidalRegHCsTriple(
        field, regularization_factor=50.0, precision="df", krylov_unroll=8
    )
    s0 = state_from_mms_when(mms_case=mms, t=0.0, grid=grid)
    with jax.enable_x64(False):
        with pytest.raises(ValueError, match="x64"):
            integ.step_fn(
                jax.tree.map(lambda a: a.astype(jnp.float32), grid),
                LOCAL_OPS,
                jax.tree.map(lambda a: a.astype(jnp.float32), s0),
                0.0,
                1e-3,
            )


def test_df_env_selection(monkeypatch):
    monkeypatch.setenv("NA_DD_TPU_PRECISION", "df")
    trial = _trial()
    assert trial.integrator.precision == "df"
