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
