"""Headline benchmark: MMSCasePol RegHCs spatial-study finest level.

Reference baseline (BASELINE.md): the MMSCasePol reghcstriple convergence
study's N=256 spatial level (Tf=0.01, dt=h^1.5, eta=50) took **280.4 s** on
the author's CPU (serial NumPy/SciPy, saved notebook output).  This script
runs the same level — identical protocol, identical error functional — as one
fused XLA program and reports wall-clock (excluding one-time jit compile,
which is printed to stderr).

Prints ONE JSON line:
    {"metric": "mmscasepol_spatial_N256_wallclock", "value": <s>,
     "unit": "s", "vs_baseline": <baseline/value>}
"""

import json
import os
import sys
import time

import jax

from na_dd_tpu.config import enable_persistent_compilation_cache, setup_x64

setup_x64()  # f64 by default; NA_DD_TPU_X64=0 selects the f32 production mode
enable_persistent_compilation_cache()

X64 = os.environ.get("NA_DD_TPU_X64", "1") != "0"
STENCIL_BACKEND = os.environ.get("NA_DD_TPU_STENCIL", "jnp")

from na_dd_tpu.core import FieldRegHCsTriple, MMSForcingRegHCsTriple
from na_dd_tpu.harness import MMSTrial
from na_dd_tpu.integrators import PCTrapezoidalRegHCsTriple
from na_dd_tpu.mms.cases import MMSCasePol
from na_dd_tpu.models import Model02
from na_dd_tpu.ops import make_uniform_grid

# Single source of truth for the protocol: the pol study's model constants
# (harness/studies.py POL_PEAKS_CONSTS — reference notebook cell 3 of
# MMSCasePol_reghcstriple_convergence_study.ipynb) and the notebook's saved
# finest-level error/wall-clock (studies/reference_values.py).
from na_dd_tpu.harness.studies import POL_PEAKS_CONSTS as STUDY_MC
from studies.reference_values import REFERENCE_ERRORS, REFERENCE_FINEST_WALLCLOCK

BASELINE_S = REFERENCE_FINEST_WALLCLOCK[("pol", "spatial")]  # 280.4
REFERENCE_ERROR = REFERENCE_ERRORS[("pol", "spatial")][-1]  # 4.38284e-9 at N=256


def main():
    N = int(os.environ.get("BENCH_N", "256"))
    eta = 50.0
    Tf = 0.01
    dt = (1.0 / N) ** 1.5

    from na_dd_tpu.harness.studies import choose_krylov_unroll

    unroll = choose_krylov_unroll(N, dt, STUDY_MC)
    model = Model02(STUDY_MC)
    grid = make_uniform_grid(N, N)
    trial = MMSTrial(
        grid,
        model,
        MMSCasePol,
        FieldRegHCsTriple,
        MMSForcingRegHCsTriple,
        PCTrapezoidalRegHCsTriple,
        forcing_terms_params=dict(regularization_factor=eta),
        field_params=dict(regularization_factor=eta),
        integrator_params=dict(
            regularization_factor=eta, track_residuals=False, krylov_unroll=unroll
        ),
    )

    # First call compiles + runs; second call measures steady-state.
    t0 = time.perf_counter()
    summary = trial.run_for_errors(Tf=Tf, dt=dt)
    first = time.perf_counter() - t0

    t0 = time.perf_counter()
    summary = trial.run_for_errors(Tf=Tf, dt=dt)
    steady = time.perf_counter() - t0

    err = summary.overall_combined_error
    mode = ("f64" if X64 else "f32") + ("" if STENCIL_BACKEND == "jnp" else f"+{STENCIL_BACKEND}")
    print(
        f"[bench] N={N} dt={dt:.3e} steps={round(Tf/summary.dt_used)} mode={mode} "
        f"first(compile+run)={first:.2f}s steady={steady:.3f}s "
        f"error={err:.4e} (reference {REFERENCE_ERROR:.2e}) "
        f"device={jax.devices()[0]}",
        file=sys.stderr,
    )
    # f64 must sit on the reference error; f32 floats on its own ~1e-7 floor.
    if X64 and N == 256 and not (err < 5 * REFERENCE_ERROR):
        print(f"[bench] WARNING: error {err} off reference {REFERENCE_ERROR}", file=sys.stderr)

    metric = "mmscasepol_spatial_N256_wallclock" + ("" if X64 else "_f32")
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(steady, 4),
                "unit": "s",
                "vs_baseline": round(BASELINE_S / steady, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
