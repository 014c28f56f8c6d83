"""Headline benchmark: MMSCasePol RegHCs spatial-study finest level.

Reference baseline (BASELINE.md): the MMSCasePol reghcstriple convergence
study's N=256 spatial level (Tf=0.01, dt=h^1.5, eta=50) took **280.4 s** on
the author's CPU (serial NumPy/SciPy, saved notebook output).  This script
runs the same level — identical protocol, identical error functional — as one
fused XLA program, in EVERY production mode, and reports wall-clock
(excluding one-time jit compile, which is printed to stderr).

Modes (each in its own subprocess — x64/backend selection is process-global
and only one process may hold the TPU at a time):

* ``f64``        — the reference-parity mode (error must sit on the
                   reference's 4.38e-9); its steady time is the headline
                   ``value`` for baseline continuity across rounds.
* ``f32``        — the f32 production mode (NA_DD_TPU_X64=0).
* ``f32_pallas`` — f32 + the fused in-VMEM Pallas solve kernels
                   (NA_DD_TPU_STENCIL=pallas).

Prints ONE JSON line:
    {"metric": "mmscasepol_spatial_N256_wallclock", "value": <f64 s>,
     "unit": "s", "vs_baseline": <baseline/value>, "f64_error": ...,
     "f32_s": ..., "f32_vs_baseline": ..., "f32_error": ...,
     "f32_pallas_s": ..., "f32_pallas_vs_baseline": ..., "f32_pallas_error": ...}

``python bench.py --single`` runs just the mode selected by the current
NA_DD_TPU_X64 / NA_DD_TPU_STENCIL environment (the round-2 behaviour);
BENCH_MODES=f64,f32 restricts the orchestrated set; BENCH_MODES=all runs
everything.

Driver-budget survivability (round 5): the default mode set is cut to the
three rows a round actually needs (production mixed_fast, production-f32
f32_pallas_fast, parity-baseline f64) IN THAT ORDER, and the merged JSON
line is re-emitted after EVERY completed mode — a timeout mid-run leaves
the last complete line parseable instead of nothing (BENCH_r04 lesson:
rc=124, parsed=null).  The diagnostic modes stay available via BENCH_MODES.

Poison guard: each mode's error is checked against its own archived
reference value; a deviation beyond tolerance sets ``error_flags`` in the
JSON and a nonzero exit code, so a TPU-emulation-noise-poisoned number
cannot enter a round artifact unflagged.
"""

import json
import os
import subprocess
import sys
import time

BASELINE_S_FALLBACK = 280.4

#: archived per-mode reference errors (value, relative tolerance).  The
#: f64-accuracy family must reproduce its archived error to 1e-7 relative
#: (they historically agree to ~1e-10); the f32 family floats on its own
#: ~3.7e-7 discretization-independent rounding floor, which is stable to a
#: few percent but not to ulps.  Sources: BENCH_r03.json parsed values and
#: studies/results/mixed_perf_probe.json rows (mixed_fast = *_tail variant).
MODE_REFERENCE = {
    "f64": (4.382843255135883e-09, 1e-7),
    "mixed": (4.382843255135106e-09, 1e-7),
    "mixed_pallas": (4.382843255136001e-09, 1e-7),
    "mixed_fast": (4.382843254823708e-09, 1e-7),
    "f32": (3.703154398223585e-07, 1e-2),
    "f32_pallas": (3.704867759636057e-07, 1e-2),
    # no archived value of its own yet: gated loosely against f32_pallas
    # (the time-tables knob changes the forcing-evaluation shape slightly)
    "f32_pallas_fast": (3.704867759636057e-07, 5e-2),
    # f32-state double-float step (precision="df"): carries ~2^-48-relative
    # DF arithmetic instead of emulated f64's 2^-53, so the end-to-end error
    # sits on the f64 value to well under the 1e-8 parity gate but not to
    # 1e-7 ulp-level reproducibility; gate at 1e-4 relative (measured CPU
    # deviation ~1e-6; see tests/test_df_mode.py)
    "df_fast": (4.382843255135883e-09, 1e-4),
}

MODES = {
    "f64": {"NA_DD_TPU_X64": "1", "NA_DD_TPU_STENCIL": "jnp",
            "NA_DD_TPU_PRECISION": "full"},
    "f32": {"NA_DD_TPU_X64": "0", "NA_DD_TPU_STENCIL": "jnp",
            "NA_DD_TPU_PRECISION": "full"},
    "f32_pallas": {"NA_DD_TPU_X64": "0", "NA_DD_TPU_STENCIL": "pallas",
                   "NA_DD_TPU_PRECISION": "full"},
    # f64-accuracy modes with every Krylov iteration in native f32
    # (iterative refinement; see integrators/pc_trapezoidal.py precision=)
    "mixed": {"NA_DD_TPU_X64": "1", "NA_DD_TPU_STENCIL": "jnp",
              "NA_DD_TPU_PRECISION": "mixed"},
    "mixed_pallas": {"NA_DD_TPU_X64": "1", "NA_DD_TPU_STENCIL": "pallas",
                     "NA_DD_TPU_PRECISION": "mixed"},
    # production full-accuracy mode: mixed + pallas with every measured-
    # redundant f64 byte removed — one refinement pass (the accuracy floor:
    # refine=0 measured 2.3e-2 relative off the reference error, refine=1
    # exact), the diagnostic-only final residual skipped
    # (mixed_final_check=False; solution bit-identical), and the f32
    # norm/gradient tail on the per-step error collection (measured ~2e-9
    # relative on the final error vs the 1e-8 parity gate).  See
    # studies/mixed_perf_probe.py + studies/results/mixed_perf_probe.json.
    # (the batched exact-state pre-pass, NA_DD_TPU_TIME_TABLES, moves the
    # latency-bound per-step exact-MMS evaluations out of the scan)
    "mixed_fast": {"NA_DD_TPU_X64": "1", "NA_DD_TPU_STENCIL": "pallas",
                   "NA_DD_TPU_PRECISION": "mixed",
                   "NA_DD_TPU_MIXED_REFINE": "1",
                   "NA_DD_TPU_MIXED_CHECK": "0",
                   "NA_DD_TPU_COLLECT_TAIL": "f32",
                   "NA_DD_TPU_TIME_TABLES": "1"},
    # f32 production mode + the same time tables (the f32 exact/forcing
    # evals are native-speed but still per-step work)
    "f32_pallas_fast": {"NA_DD_TPU_X64": "0", "NA_DD_TPU_STENCIL": "pallas",
                        "NA_DD_TPU_PRECISION": "full",
                        "NA_DD_TPU_TIME_TABLES": "1"},
    # round-5 candidate production mode: the f32-state double-float step
    # (precision="df" — state/fields/planes/rhs/correctors all in native-f32
    # DF pairs via ops/df_lift.py, Newton solves as DF iterative refinement
    # around the fused f32 kernel).  Same fast knobs as mixed_fast.
    "df_fast": {"NA_DD_TPU_X64": "1", "NA_DD_TPU_STENCIL": "pallas",
                "NA_DD_TPU_PRECISION": "df",
                "NA_DD_TPU_MIXED_REFINE": "1",
                "NA_DD_TPU_MIXED_CHECK": "0",
                "NA_DD_TPU_COLLECT_TAIL": "f32",
                "NA_DD_TPU_TIME_TABLES": "1"},
}


def measure_triad_gbps():
    """Achievable HBM bandwidth on THIS chip at the bench working-set size.

    A scan-chained triad (z ← x + s·z: 2 reads + 1 write of 64 MiB f32 per
    iteration, 50 iterations inside ONE dispatch so tunnel latency
    amortizes), best of 3 timed runs.  Returns GB/s, or None on failure."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    try:
        n = 16 * 2**20  # 64 MiB per array
        iters = 50
        x = jnp.arange(n, dtype=jnp.float32) * jnp.float32(1e-7)
        z0 = jnp.ones((n,), jnp.float32)

        @jax.jit
        def run(x, z):
            def body(z, s):
                return x + s * z, ()

            z, _ = lax.scan(body, z, jnp.arange(iters, dtype=jnp.float32))
            return z

        run(x, z0).block_until_ready()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run(x, z0).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return iters * 3 * n * 4 / best / 1e9
    except Exception as exc:  # pragma: no cover - probe must never kill a row
        print(f"[bench] triad probe failed: {exc!r}", file=sys.stderr)
        return None


def run_single():
    """Run the benchmark level in the mode selected by the environment and
    print one JSON line (metric/value/vs_baseline/error)."""
    import jax

    from na_dd_tpu.config import enable_persistent_compilation_cache, setup_x64

    setup_x64()  # f64 by default; NA_DD_TPU_X64=0 selects the f32 mode
    enable_persistent_compilation_cache()

    x64 = os.environ.get("NA_DD_TPU_X64", "1") != "0"
    stencil_backend = os.environ.get("NA_DD_TPU_STENCIL", "jnp")
    precision = os.environ.get("NA_DD_TPU_PRECISION", "full")

    from na_dd_tpu.core import FieldRegHCsTriple, MMSForcingRegHCsTriple
    from na_dd_tpu.harness import MMSTrial
    from na_dd_tpu.harness.studies import POL_PEAKS_CONSTS as STUDY_MC
    from na_dd_tpu.harness.studies import choose_krylov_unroll
    from na_dd_tpu.integrators import PCTrapezoidalRegHCsTriple
    from na_dd_tpu.mms.cases import MMSCasePol
    from na_dd_tpu.models import Model02
    from na_dd_tpu.ops import make_uniform_grid
    from studies.reference_values import REFERENCE_ERRORS, REFERENCE_FINEST_WALLCLOCK

    baseline_s = REFERENCE_FINEST_WALLCLOCK[("pol", "spatial")]  # 280.4
    reference_error = REFERENCE_ERRORS[("pol", "spatial")][-1]  # 4.38284e-9

    N = int(os.environ.get("BENCH_N", "256"))
    eta = 50.0
    Tf = 0.01
    dt = (1.0 / N) ** 1.5

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

    # First call compiles + runs; steady-state is the MIN over several timed
    # calls: the device is tunneled, so a single run carries tens of ms of
    # host<->device latency jitter (measured spread 0.030-0.063 s on the same
    # 0.03 s program) — min over repeats estimates the compute time.
    repeats = int(os.environ.get("BENCH_REPEATS", "5"))
    t0 = time.perf_counter()
    summary = trial.run_for_errors(Tf=Tf, dt=dt)
    first = time.perf_counter() - t0

    steady = float("inf")
    for _ in range(max(repeats, 1)):
        t0 = time.perf_counter()
        summary = trial.run_for_errors(Tf=Tf, dt=dt)
        steady = min(steady, time.perf_counter() - t0)

    err = summary.overall_combined_error

    # ---- Roofline account, calibrated (VERDICT r4 task 4).  XLA's
    # post-optimization cost model over-counts "bytes accessed" by >=1.2-1.4x
    # (pre-fusion logical bytes: the PURE-f32 row used to come out at 122% of
    # the v5e datasheet peak, so the old f64-emulation explanation was wrong).
    # We therefore report the cost-model byte RATE next to an on-chip
    # MEASURED bandwidth (a scan-chained triad at the bench working-set
    # size), and express utilization only in calibrated units:
    #   bytes_inflation = cost-model rate / measured triad rate  (>1 means
    #   the cost model over-counts — it is NOT chip utilization), and
    #   implied_step_mb_at_triad = the most bytes a step could actually have
    #   moved (steady per-step time x measured bandwidth) — the honest byte
    #   budget any optimization must beat.
    roofline = {}
    try:
        num_steps = round(Tf / summary.dt_used)
        step = jax.jit(trial.integrator.step_fn, static_argnums=1)
        compiled = step.lower(
            grid, trial.ops, trial.initial_state, 0.0, summary.dt_used
        ).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        if ca:
            step_bytes = float(ca.get("bytes accessed", float("nan")))
            step_flops = float(ca.get("flops", float("nan")))
            cost_model_gbps = step_bytes * num_steps / steady / 1e9
            gflops = step_flops * num_steps / steady / 1e9
            triad = measure_triad_gbps()
            roofline = {
                "step_bytes_cost_model": step_bytes,
                "step_flops_cost_model": step_flops,
                "cost_model_gbps": round(cost_model_gbps, 1),
                "gflops_per_s": round(gflops, 1),
            }
            if triad:
                per_step_s = steady / num_steps
                roofline["triad_gbps_measured"] = round(triad, 1)
                roofline["cost_model_bytes_inflation"] = round(
                    cost_model_gbps / triad, 3
                )
                roofline["implied_step_mb_at_triad"] = round(
                    triad * per_step_s * 1e3, 1
                )
            print(
                f"[bench] roofline: cost-model {step_bytes / 1e6:.1f} MB + "
                f"{step_flops / 1e9:.2f} GF per step x {num_steps} steps "
                f"/ {steady:.3f}s -> {cost_model_gbps:.0f} GB/s cost-model rate"
                + (f" vs {triad:.0f} GB/s measured triad "
                   f"(inflation {cost_model_gbps / triad:.2f}x; step byte "
                   f"budget {roofline.get('implied_step_mb_at_triad')} MB)"
                   if triad else "")
                + f", {gflops:.0f} GFLOP/s",
                file=sys.stderr,
            )
    except Exception as exc:  # cost model unavailable on some backends
        print(f"[bench] roofline unavailable: {exc!r}", file=sys.stderr)

    mode = (
        ("f64" if x64 else "f32")
        + ("" if stencil_backend == "jnp" else f"+{stencil_backend}")
        + ("" if precision == "full" else f"+{precision}")
        + ("+r" + os.environ["NA_DD_TPU_MIXED_REFINE"]
           if os.environ.get("NA_DD_TPU_MIXED_REFINE") else "")
        + ("+nocheck" if os.environ.get("NA_DD_TPU_MIXED_CHECK") == "0" else "")
        + ("+tail" if os.environ.get("NA_DD_TPU_COLLECT_TAIL") else "")
    )
    print(
        f"[bench] N={N} dt={dt:.3e} steps={round(Tf/summary.dt_used)} mode={mode} "
        f"first(compile+run)={first:.2f}s steady={steady:.3f}s "
        f"error={err:.4e} (reference {reference_error:.2e}) "
        f"device={jax.devices()[0]}",
        file=sys.stderr,
    )
    # f64 must sit on the reference error; f32 floats on its own ~1e-7 floor.
    if x64 and N == 256 and not (err < 5 * reference_error):
        print(f"[bench] WARNING: error {err} off reference {reference_error}", file=sys.stderr)

    metric = "mmscasepol_spatial_N256_wallclock" + ("" if x64 else "_f32")
    payload = {
        "metric": metric,
        "value": round(steady, 4),
        "unit": "s",
        "vs_baseline": round(baseline_s / steady, 2),
        "error": err,
    }
    payload.update(roofline)
    print(json.dumps(payload))


def merged_line(results, pending):
    """The single merged JSON object for whatever modes have completed.

    ``value`` carries the f64 steady time for baseline continuity across
    rounds (null until/unless the f64 mode completes); every completed mode
    contributes its own ``<mode>_s`` / ``<mode>_error`` keys.  Modes whose
    error deviates from their archived reference beyond tolerance land in
    ``error_flags`` (the TPU-noise poison guard, VERDICT r4 task 6)."""
    out = {
        "metric": "mmscasepol_spatial_N256_wallclock",
        "value": None,
        "unit": "s",
        "vs_baseline": None,
    }
    f64 = results.get("f64")
    if f64 is not None:
        out["value"] = f64["value"]
        out["vs_baseline"] = f64["vs_baseline"]
        out["f64_error"] = f64["error"]
        if "cost_model_gbps" in f64:
            out["f64_cost_model_gbps"] = f64["cost_model_gbps"]
        if "triad_gbps_measured" in f64:
            out["f64_triad_gbps"] = f64["triad_gbps_measured"]
    for name in MODES:
        if name == "f64" or name not in results:
            continue
        r = results[name]
        out[f"{name}_s"] = r["value"]
        out[f"{name}_vs_baseline"] = r["vs_baseline"]
        out[f"{name}_error"] = r["error"]
        if "cost_model_gbps" in r:
            out[f"{name}_cost_model_gbps"] = r["cost_model_gbps"]
        if "implied_step_mb_at_triad" in r:
            out[f"{name}_step_mb_at_triad"] = r["implied_step_mb_at_triad"]
    flags = {}
    for name, r in results.items():
        ref = MODE_REFERENCE.get(name)
        if ref is None or r.get("error") is None:
            continue
        archived, tol = ref
        if abs(r["error"] - archived) > tol * archived:
            flags[name] = {"error": r["error"], "archived": archived,
                           "rel_dev": round(abs(r["error"] - archived) / archived, 3)}
    if flags:
        out["error_flags"] = flags
    if pending:
        out["modes_pending_or_failed"] = pending
    return out, flags


def main():
    """Orchestrate one subprocess per mode; re-emit the merged JSON line
    after EVERY completed mode (timeout-survivable — the driver keeps the
    last parseable line).

    This process never imports jax (the TPU must be free for each child);
    children run strictly sequentially and exit cleanly between modes.
    """
    default = "mixed_fast,f32_pallas_fast,f64"
    raw = os.environ.get("BENCH_MODES", default)
    if raw.strip() == "all":
        raw = ",".join(MODES)
    selected = [n.strip() for n in raw.split(",") if n.strip()]
    results = {}
    flags = {}
    consecutive_timeouts = 0
    for i, name in enumerate(selected):
        env = {**os.environ, **MODES[name]}
        # a mode that times out (e.g. the axon endpoint is down and the
        # child spins in the plugin's connect-retry loop) fails the MODE,
        # not the artifact; after TWO consecutive timeouts (systemic outage,
        # not one slow cold compile) the remaining modes get a short probe
        # budget so the merged JSON line still appears promptly
        budget = 3600 if consecutive_timeouts < 2 else 300
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--single"],
                env=env,
                stdout=subprocess.PIPE,
                stderr=sys.stderr,
                text=True,
                timeout=budget,
            )
        except subprocess.TimeoutExpired:
            print(f"[bench] mode {name} TIMED OUT after {budget}s", file=sys.stderr)
            consecutive_timeouts += 1
            continue
        if proc.returncode != 0:
            # a fast failure (e.g. UNAVAILABLE backend) does NOT reset the
            # timeout counter: during an endpoint outage the symptoms
            # alternate between fast-fail and hang (CLAUDE.md), and a reset
            # would keep re-arming the 3600s budget for the hanging modes
            print(f"[bench] mode {name} FAILED (rc={proc.returncode})", file=sys.stderr)
            continue
        consecutive_timeouts = 0
        line = proc.stdout.strip().splitlines()[-1]
        results[name] = json.loads(line)
        pending = [n for n in selected if n not in results]
        out, flags = merged_line(results, pending)
        print(json.dumps(out), flush=True)  # survivable incremental emission

    failed = [n for n in selected if n not in results]
    if not results:
        out, flags = merged_line(results, failed)
        print(json.dumps(out), flush=True)
    return 1 if (failed or flags) else 0


if __name__ == "__main__":
    if "--single" in sys.argv[1:]:
        run_single()
    else:
        sys.exit(main())
