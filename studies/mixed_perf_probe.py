#!/usr/bin/env python
"""Mixed-mode time-budget ablation at the headline level (pol N=256).

VERDICT r4 perf task: mixed+pallas sits at ~0.083 s vs the f32 floor of
~0.032 s, already at ~79% of v5e HBM peak — closing the gap needs BYTES
removed, not better scheduling.  This probe splits the per-run wall-clock
into its budget lines by timing ablated variants of the SAME level in one
x64 process (all knobs are per-integrator parameters):

* error collection cost     = run_for_errors - simulate_only
* final-residual diagnostics = default - mixed_final_check=False
* refinement-pass cost       = refine=2 - refine=1 (and refine=0 accuracy)
* solver-core cost           = micro-timed f64 Stencil5.apply and fused f32
                               kernel solve, scaled by solves/run
* everything else            = f64 field evals + rhs/plane assembly
                               (the remainder)

Writes studies/results/mixed_perf_probe.json and prints one line per row.

    python studies/mixed_perf_probe.py            # TPU (or CPU fallback)
"""

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from na_dd_tpu.config import enable_persistent_compilation_cache, setup_x64

setup_x64()
if "--cpu" not in sys.argv:
    enable_persistent_compilation_cache()

import jax.numpy as jnp

from na_dd_tpu.harness.studies import _make_trial, choose_krylov_unroll, study_consts
from na_dd_tpu.harness.trial import _collect_errors, _scan_step
from na_dd_tpu.mms import cases as mms_cases
from na_dd_tpu.mms.engine import state_from_mms_when
from na_dd_tpu.ops import LOCAL_OPS

N = int(os.environ.get("PROBE_N", "256"))
ETA = 50.0
TF = 0.01
REPEATS = int(os.environ.get("PROBE_REPEATS", "5"))

results = {}

#: comma-separated substrings: only rows whose label matches one run
#: (PROBE_ONLY=tail,forcing); empty = all rows.  Completed rows are merged
#: into the archive INCREMENTALLY so an endpoint compile stall loses nothing.
ONLY = [s for s in os.environ.get("PROBE_ONLY", "").split(",") if s]

_OUT_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "results",
    "mixed_perf_probe.json",
)


def _selected(label):
    return not ONLY or any(s in label for s in ONLY)


def _archive():
    merged = {}
    if os.path.exists(_OUT_PATH):
        try:
            with open(_OUT_PATH) as f:
                merged = json.load(f).get("rows", {})
        except Exception:
            merged = {}
    merged.update(results)
    out = {
        "N": N, "steps": math.ceil(TF / (1.0 / N) ** 1.5), "repeats": REPEATS,
        "rows": merged,
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    with open(_OUT_PATH, "w") as f:
        json.dump(out, f, indent=1)


def _steady(fn, label):
    """First call compiles; steady = min over REPEATS (tunnel jitter)."""
    t0 = time.perf_counter()
    out = fn()
    jax.block_until_ready(out)
    first = time.perf_counter() - t0
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"[probe {label:32s}] first={first:8.2f}s steady={best:.4f}s", flush=True)
    return first, best, out


def trial_for(**kw):
    mc = study_consts("pol")
    dt = (1.0 / N) ** 1.5
    args = dict(krylov_unroll=choose_krylov_unroll(N, dt, mc))
    args.update(kw)
    return _make_trial(mms_cases.MMSCasePol, N, ETA, mc=mc, **args)


def run_errors(label, run_kw=None, **kw):
    if not _selected(label):
        return None
    trial = trial_for(**kw)
    dt = (1.0 / N) ** 1.5
    rkw = run_kw or {}
    first, best, s = _steady(
        lambda: trial.run_for_errors(Tf=TF, dt=dt, **rkw), label
    )
    err = float(s.overall_combined_error)
    print(f"[probe {label:32s}] error={err:.10e}", flush=True)
    results[label] = {"first_s": first, "steady_s": best, "error": err}
    _archive()
    return trial


def run_sim_only(label, **kw):
    """Whole-run scan WITHOUT the per-step error collection — the jit is
    built ONCE so warm calls hit the in-process executable cache (a fresh
    closure per call would re-trace every time)."""
    if not _selected(label):
        return None
    trial = trial_for(**kw)
    dt = (1.0 / N) ** 1.5
    num = math.ceil(TF / dt)
    dt_run = TF / num
    integ, g = trial.integrator, trial.grid

    @jax.jit
    def run(s0):
        def body(s, k):
            s1, _ = _scan_step(integ, g, LOCAL_OPS, s, k * dt_run, dt_run)
            return s1, None
        ks = jnp.arange(num, dtype=jnp.result_type(float))
        s, _ = jax.lax.scan(body, s0, ks)
        return s.T

    first, best, _ = _steady(lambda: run(trial.initial_state), label)
    results[label] = {"first_s": first, "steady_s": best, "num_steps": num}
    return trial


def main():
    dt = (1.0 / N) ** 1.5
    num = math.ceil(TF / dt)
    dt_run = TF / num
    dev = str(jax.devices()[0])
    print(f"device={dev} N={N} steps={num} dt={dt_run:.4e}", flush=True)

    mixed = dict(precision="mixed", stencil_backend="pallas")

    # --- end-to-end rows ---
    run_errors("mixed_errors_r1", mixed_refine=1, **mixed)
    run_errors("mixed_errors_r1_nocheck", mixed_refine=1,
               mixed_final_check=False, **mixed)
    run_errors("mixed_errors_r0_nocheck", mixed_refine=0,
               mixed_final_check=False, **mixed)
    run_sim_only("mixed_sim_r1", mixed_refine=1, **mixed)
    run_sim_only("mixed_sim_r1_nocheck", mixed_refine=1,
                 mixed_final_check=False, **mixed)
    # f32 norm/gradient tail on the error collection (f64 subtraction kept)
    run_errors("mixed_errors_r1_tail", run_kw=dict(collect_tail="f32"),
               mixed_refine=1, **mixed)
    run_errors("mixed_errors_r1_nocheck_tail",
               run_kw=dict(collect_tail="f32"),
               mixed_refine=1, mixed_final_check=False, **mixed)
    # batched exact-state pre-pass feeding the scan (collect_precompute)
    run_errors("mixed_errors_r1_pre", run_kw=dict(collect_precompute=True),
               mixed_refine=1, **mixed)
    run_errors("mixed_errors_r1_pre_tail_nocheck",
               run_kw=dict(collect_precompute=True, collect_tail="f32"),
               mixed_refine=1, mixed_final_check=False, **mixed)
    # inner f32 kernel budget: mixed solves target MIXED_INNER_TOL=1e-6, so
    # the f64-tuned unroll=16 may be oversized (the in-kernel fori_loop runs
    # the full budget regardless of the masked early exit)
    run_errors("mixed_pre_tail_nocheck_u8",
               run_kw=dict(collect_precompute=True, collect_tail="f32"),
               mixed_refine=1, mixed_final_check=False,
               krylov_unroll=8, **mixed)
    run_errors("mixed_pre_tail_nocheck_u12",
               run_kw=dict(collect_precompute=True, collect_tail="f32"),
               mixed_refine=1, mixed_final_check=False,
               krylov_unroll=12, **mixed)
    # double-float residuals (ops/doublefloat.py): the refinement's
    # b - A·x in two-f32 EFT arithmetic instead of emulated f64 — the
    # round-4 "only lever left" candidate (ROADMAP).  A/B against
    # mixed_errors_r1_pre_tail_nocheck (identical config, DF off).
    run_errors("mixed_df_pre_tail_nocheck",
               run_kw=dict(collect_precompute=True, collect_tail="f32"),
               mixed_refine=1, mixed_final_check=False,
               mixed_df=True, **mixed)
    # DF on the fused block-triangular sweep (analytic couplings)
    run_errors("mixed_df_triple_pre_tail_nocheck",
               run_kw=dict(collect_precompute=True, collect_tail="f32"),
               mixed_refine=1, mixed_final_check=False,
               mixed_df=True, coupling_source="analytic", **mixed)
    # --- round 5: the f32-state double-float step (precision="df") ---
    # every field eval / plane assembly / rhs / corrector in native-f32 DF
    # via the jaxpr lift; Newton solves = DF refinement around the fused f32
    # kernel.  A/B rows mirror the mixed family.
    dfk = dict(precision="df", stencil_backend="pallas")
    run_errors("dfstate_errors_r1", mixed_refine=1, **dfk)
    run_errors("dfstate_pre_tail_nocheck",
               run_kw=dict(collect_precompute=True, collect_tail="f32"),
               mixed_refine=1, mixed_final_check=False, **dfk)
    run_sim_only("dfstate_sim_r1_nocheck", mixed_refine=1,
                 mixed_final_check=False, **dfk)
    # per-system (non-fused) df path for reference
    run_errors("dfstate_jnp_pre_tail_nocheck",
               run_kw=dict(collect_precompute=True, collect_tail="f32"),
               mixed_refine=1, mixed_final_check=False,
               precision="df", stencil_backend="jnp")
    run_errors("f64_errors")
    run_sim_only("f64_sim")

    # --- error-collection scan in isolation (41 evals of the exact MMS
    # solution + norms on a frozen state; t varies so nothing collapses) ---
    trial = trial_for(mixed_refine=1, **mixed)
    g = trial.grid
    s0 = state_from_mms_when(mms_case=trial.mms_case, t=0.0, grid=g)
    names = tuple(trial.variable_names)
    ivars = tuple(trial.integral_vars)

    @jax.jit
    def collect_scan(s, ts):
        def body(acc, t):
            h_sq, grad_sq = _collect_errors(
                g, LOCAL_OPS, trial.mms_case, s, t, names, ivars
            )
            return acc + sum(h_sq.values()) + sum(grad_sq.values()), None
        acc, _ = jax.lax.scan(body, jnp.asarray(0.0), ts)
        return acc

    ts = jnp.linspace(0.0, TF, num)
    if _selected("collect_scan_x41"):
        first, best, _ = _steady(lambda: collect_scan(s0, ts), "collect_scan_x41")
        results["collect_scan_x41"] = {"first_s": first, "steady_s": best}
        _archive()

    # --- component scans: where does the f64 simulate-only budget go? ---
    field = trial.integrator.semi_discrete_field
    forcing = trial.forcing_terms

    @jax.jit
    def forcing_scan(ts):
        """5 forcing-term evals per t (the step needs them at t0 AND t1)."""
        def body(acc, t):
            tot = (
                forcing.fT(g, LOCAL_OPS, t) + forcing.fcl(g, LOCAL_OPS, t)
                + forcing.fcd(g, LOCAL_OPS, t) + forcing.fcp(g, LOCAL_OPS, t)
                + forcing.fcs(g, LOCAL_OPS, t)
            )
            return acc + jnp.max(jnp.abs(tot)), None
        acc, _ = jax.lax.scan(body, jnp.asarray(0.0), ts)
        return acc

    ts = jnp.linspace(0.0, TF, num)
    if _selected("forcing5_scan_x41"):
        first, best, _ = _steady(lambda: forcing_scan(ts), "forcing5_scan_x41")
        results["forcing5_scan_x41"] = {"first_s": first, "steady_s": best}
        _archive()

    @jax.jit
    def fields_scan(s, ts):
        """FT+Fcl+Fcd at a frozen state (the Newton sweep's primal evals)."""
        def body(acc, t):
            tot = (
                field.FT(g, LOCAL_OPS, s, t) + field.Fcl(g, LOCAL_OPS, s, t)
                + field.Fcd(g, LOCAL_OPS, s, t)
            )
            return acc + jnp.max(jnp.abs(tot)), None
        acc, _ = jax.lax.scan(body, jnp.asarray(0.0), ts)
        return acc

    if _selected("fields3_scan_x41"):
        first, best, _ = _steady(lambda: fields_scan(s0, ts), "fields3_scan_x41")
        results["fields3_scan_x41"] = {"first_s": first, "steady_s": best}
        _archive()

    @jax.jit
    def planes_scan(s, ts):
        """The three Newton self-Jacobian plane assemblies per sweep."""
        dt_l = TF / num
        def body(acc, t):
            sT = s._replace(T=s.T + 1e-12 * t)  # defeat loop-invariant hoist
            stT = trial.integrator._newton_planes(
                g, LOCAL_OPS, field.stencil_dFT_dT(g, LOCAL_OPS, sT), dt_l
            )
            stcl = trial.integrator._newton_planes(
                g, LOCAL_OPS, field.stencil_dFcl_dcl(g, LOCAL_OPS, sT), dt_l
            )
            stcd = trial.integrator._newton_planes(
                g, LOCAL_OPS, field.stencil_dFcd_dcd(g, LOCAL_OPS, sT), dt_l
            )
            return acc + jnp.max(jnp.abs(stT.c0 + stcl.c0 + stcd.c0)), None
        acc, _ = jax.lax.scan(body, jnp.asarray(0.0), ts)
        return acc

    if _selected("planes3_scan_x41"):
        first, best, _ = _steady(lambda: planes_scan(s0, ts), "planes3_scan_x41")
        results["planes3_scan_x41"] = {"first_s": first, "steady_s": best}
        _archive()

    @jax.jit
    def exact_scan(ts):
        """The exact-MMS-state evaluations alone (5 fields per t)."""
        def body(acc, t):
            ex = state_from_mms_when(mms_case=trial.mms_case, t=t, grid=g)
            return acc + jnp.max(jnp.abs(ex.T + ex.cl + ex.cd + ex.cp + ex.cs)), None
        acc, _ = jax.lax.scan(body, jnp.asarray(0.0), ts)
        return acc

    if _selected("exact5_scan_x41"):
        first, best, _ = _steady(lambda: exact_scan(ts), "exact5_scan_x41")
        results["exact5_scan_x41"] = {"first_s": first, "steady_s": best}
        _archive()

    # --- micro: one f64-emulated plane apply x (3 solves * num steps) ---
    field = trial.integrator.semi_discrete_field
    st = trial.integrator._newton_planes(
        g, LOCAL_OPS, field.stencil_dFT_dT(g, LOCAL_OPS, s0), dt_run
    )
    reps = 3 * num

    @jax.jit
    def apply64_scan(x0):
        def body(x, _):
            y = st.apply(LOCAL_OPS, x)
            # renormalize so the scan cannot be strength-reduced
            return y / (1.0 + jnp.max(jnp.abs(y))), None
        x, _ = jax.lax.scan(body, x0, None, length=reps)
        return x

    if _selected("apply64"):
        first, best, _ = _steady(lambda: apply64_scan(s0.T), f"apply64_x{reps}")
        results[f"apply64_x{reps}"] = {"first_s": first, "steady_s": best}
        _archive()

    # --- micro: one fused f32 kernel solve x (3 * num) ---
    if jax.default_backend() != "cpu":
        from na_dd_tpu.integrators.pc_trapezoidal import MIXED_INNER_TOL
        from na_dd_tpu.ops.pallas_kernels import (
            bicgstab_solve_pallas,
            fused_solve_fits,
        )

        f32 = jnp.float32
        st32 = type(st)(*(p.astype(f32) for p in st))
        mask32 = g.interior_mask.astype(f32)
        inv32 = jnp.where(
            mask32 > 0, 1.0 / jnp.where(st32.c0 == 0, 1.0, st32.c0), 0.0
        ).astype(f32)
        unroll = trial.integrator.krylov_unroll
        if fused_solve_fits(s0.T.shape, f32) and _selected("fused32"):
            @jax.jit
            def fsolve_scan(b0):
                def body(b, _):
                    x, _info = bicgstab_solve_pallas(
                        st32, b, inv32, mask32,
                        tol=MIXED_INNER_TOL, iters=unroll,
                    )
                    return b + 0.0 * x[0, 0], None
                b, _ = jax.lax.scan(body, b0, None, length=reps)
                return b

            b0 = (s0.T * g.interior_mask).astype(f32)
            first, best, _ = _steady(
                lambda: fsolve_scan(b0), f"fused32_solve_x{reps}"
            )
            results[f"fused32_solve_x{reps}"] = {"first_s": first, "steady_s": best}

    # --- budget table (rows may be absent under PROBE_ONLY) ---
    print("\n--- budget (steady, per run of %d steps) ---" % num, flush=True)
    sec = lambda k: results.get(k, {}).get("steady_s")  # noqa: E731
    r1, sim = sec("mixed_errors_r1"), sec("mixed_sim_r1")
    if r1 is not None:
        print(f"total mixed_errors_r1   : {r1:.4f}s")
    if r1 is not None and sim is not None:
        print(f"  error collection      : {r1 - sim:.4f}s")
        print(f"  simulate-only remainder: {sim:.4f}s")
    for k, v in sorted(results.items()):
        if "steady_s" in v:
            line = f"  {k:32s}: {v['steady_s']:.4f}s"
            if "error" in v:
                line += f"  error={v['error']:.6e}"
            print(line)

    _archive()
    print(f"archived: {_OUT_PATH}", flush=True)


if __name__ == "__main__":
    main()
