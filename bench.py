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
from na_dd_tpu.models import Model02, ModelConsts
from na_dd_tpu.ops import make_uniform_grid

# Study constants (reference notebook cell 3 of
# MMSCasePol_reghcstriple_convergence_study.ipynb — the pol/peaks notebooks
# use larger Dl_max/Dd_max than the other four studies)
STUDY_MC = ModelConsts(
    R0=8.3144621,
    Ea=1.60217662e-19,
    K1=1e-3,
    K2=1e-3,
    K3=1e-3,
    K4=1e-3,
    DT=1e-3,
    Dl_max=8.01e-4,
    phi_l=1e-5,
    gamma_T=1e-9,
    Kd=1e-2,
    Sd=1.0,
    Dd_max=2.46e-6,
    phi_d=1e-5,
    phi_T=1.60217662e-19 / 8.3144621,
    r_sp=5e-2,
    T_ref=300.0,
)

BASELINE_S = 280.4  # reference wall-clock for this exact level (author CPU)
REFERENCE_ERROR = 4.38284e-9  # reference final combined error at N=256


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
