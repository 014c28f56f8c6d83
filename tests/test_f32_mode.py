"""Production f32 mode regression: the whole study pipeline must run and
converge with x64 disabled (the TPU-native serving configuration selected by
NA_DD_TPU_X64=0 — native-speed MXU arithmetic instead of emulated f64).

The f64 path is the parity-certified one; f32 floats on its own roundoff
floor, so the gate here is mode engagement (everything really is float32),
sane convergence (error within 10% of the f64 value at a coarse level, far
above the f32 floor), and no NaN/inf poisoning.
"""

import jax
import jax.numpy as jnp
import numpy as np

from na_dd_tpu.harness.studies import _make_trial, study_consts
from na_dd_tpu.mms import cases as mms_cases


def _run_pol_level():
    trial = _make_trial(
        mms_cases.MMSCasePol, 16, 50.0, mc=study_consts("pol"), krylov_unroll=8
    )
    summary = trial.run_for_errors(Tf=0.01, dt=5e-4)
    return trial, summary


def test_f32_mode_matches_f64_to_its_floor():
    _, s64 = _run_pol_level()
    e64 = float(s64.overall_combined_error)

    with jax.enable_x64(False):
        trial32, s32 = _run_pol_level()
        e32 = float(s32.overall_combined_error)
        # mode engagement: grid metrics and state really are f32
        assert trial32.grid.xx.dtype == jnp.float32
        assert trial32.initial_state.T.dtype == jnp.float32

    assert np.isfinite(e32)
    # N=16 error ~1e-6 sits far above the f32 roundoff floor; measured
    # deviation on CPU is ~1.6e-2 relative
    assert abs(e32 - e64) / e64 < 0.1


def test_f32_mode_krylov_tol_is_dtype_aware_and_warning_clean():
    """With the default (None) krylov_tol the f32 mode must target a
    reachable f32 tolerance and finish with every solve converged — no
    spurious 'missed tolerance' warnings that would train users to ignore
    the diagnostic in f64 runs."""
    import warnings

    from na_dd_tpu.integrators.pc_trapezoidal import default_krylov_tol

    assert default_krylov_tol(jnp.float64) == 1e-13
    assert default_krylov_tol(jnp.float32) == 1e-5

    with jax.enable_x64(False):
        trial, _ = _run_pol_level()
        assert trial.integrator.krylov_tol == 1e-5  # resolved per-mode
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            trial.run_for_errors(Tf=0.01, dt=5e-4)
        krylov_warnings = [w for w in caught if "Krylov" in str(w.message)]
        assert not krylov_warnings, [str(w.message) for w in krylov_warnings]

    # back in f64 the same construction path resolves to the strict target
    trial64, _ = _run_pol_level()
    assert trial64.integrator.krylov_tol == 1e-13
