"""3-D model convergence study + step-time probe (beyond-reference capability).

Runs a spatial ladder of the full five-field 3-D NA-DD system (RegHCs
variant, dt ∝ h so both error components contract at order 2), reports
per-level combined-H errors, observed rates and steady per-step wall-clock,
and archives everything under studies/results/three_d_study.json.

Usage:
    python studies/three_d_study.py                 # ladder on the attached TPU
    python studies/three_d_study.py --cpu           # force CPU (x64)
    python studies/three_d_study.py --levels 4 --n0 4
    python studies/three_d_study.py --variant cs    # reaction variant

The whole run per level is ONE fused scan program (three_d/harness.py), so
the TPU timing is the honest production number: steady = a second call on
the warm cache.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="force CPU")
    ap.add_argument("--levels", type=int, default=4)
    ap.add_argument("--n0", type=int, default=4, help="coarsest N (doubles per level)")
    ap.add_argument("--variant", default="reghcs", choices=["cs", "hcs", "reghcs"])
    ap.add_argument(
        "--batched",
        action="store_true",
        help="run the whole ladder as ONE vmapped XLA program "
        "(pad-to-max + vmap; RegHCs only)",
    )
    ap.add_argument(
        "--eta-sweep",
        action="store_true",
        help="regularization sweep eta=10..1000 (7 values) at N=--n0, "
        "dt=--dt0, as ONE vmapped program (RegHCs)",
    )
    ap.add_argument(
        "--temporal",
        action="store_true",
        help="temporal ladder: FIXED grid N=--n0, dt = --dt0 / 2^k "
        "(expected order 2 until the spatial floor; the 3-D twin of the "
        "reference's notebook cell 11)",
    )
    ap.add_argument("--tf", type=float, default=0.02)
    ap.add_argument("--dt0", type=float, default=1e-2, help="dt at the coarsest level")
    ap.add_argument(
        "--self-reference",
        action="store_true",
        help="temporal ladders only: ALSO measure each level's final state "
        "against a fine-dt run (dt0/2^(levels+1)) on the SAME grid and "
        "arithmetic, so the fixed grid's spatial error cancels exactly and "
        "the pure O(dt^2) temporal order is observable even when the MMS "
        "error sits on the spatial floor (the f32 N=16 ladder measured "
        "rates ~0.00 against the exact solution — all levels floored at "
        "3.4e-5 — which validates stability but not temporal order); the "
        "rate gate then runs on the self-reference errors",
    )
    ap.add_argument("--eta", type=float, default=50.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from na_dd_tpu import config

    config.setup_x64()
    if not args.cpu:
        # On CPU the persistent cache can deserialize AOT results compiled on
        # a different host generation (feature-mismatch warnings / SIGILL
        # risk) and compiles are cheap anyway; keep it TPU-only here.
        config.enable_persistent_compilation_cache()

    # Forces backend/session setup NOW and proves it in the log: with the
    # axon tunnel, a client that hangs here (no output past the xla_bridge
    # warning, threads in sk_wait_data) is waiting on a stale session — kill
    # it and relaunch after ~5 min idle (CLAUDE.md); a client that prints
    # devices and THEN goes quiet is compiling.
    print("devices:", jax.devices(), flush=True)

    from na_dd_tpu.models import Model02, default_model_consts
    from na_dd_tpu.three_d import MMSCaseExpSin3, make_setup3
    from na_dd_tpu.three_d.harness import build_runner3

    MC = default_model_consts._replace(
        K1=1e-3, K2=1e-3, K3=1e-3, K4=1e-3, Dl_max=1e-5, Kd=1e-2, Sd=1.0, Dd_max=1e-6
    )
    model = Model02(MC)

    if args.eta_sweep:
        from na_dd_tpu.three_d.harness import run_eta_sweep3

        etas = [float(x) for x in np.logspace(1, 3, 7)]
        t0 = time.perf_counter()
        res = run_eta_sweep3(
            MMSCaseExpSin3, model=model, N=args.n0, Tf=args.tf,
            dt=args.dt0, etas=etas,
        )
        wall = time.perf_counter() - t0
        for eta, err, conv in zip(res["etas"], res["errors"], res["converged"]):
            print(f"eta={eta:8.2f} err={err:.6e} conv={conv}", flush=True)
        ok = all(res["converged"]) and all(np.isfinite(res["errors"]))
        print(f"whole sweep in one vmapped program: {wall:.1f}s")
        print("[OK]" if ok else "[CONVERGENCE CHECK FAILED]")
        res.update(
            backend=jax.default_backend(),
            x64=bool(jax.config.jax_enable_x64),
            N=args.n0, Tf=args.tf, dt=args.dt0, wallclock_s=wall,
            timestamp=time.strftime("%Y-%m-%d %H:%M:%S"),
        )
        out_path = args.out or os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "results",
            "three_d_eta_sweep.json",
        )
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(res, f, indent=1)
        print("archived:", out_path)
        return 0 if ok else 1

    if args.batched:
        if args.variant != "reghcs":
            ap.error("--batched supports the reghcs variant only")
        from na_dd_tpu.three_d.batched_ladder import run_spatial_ladder3_batched

        res = run_spatial_ladder3_batched(
            MMSCaseExpSin3,
            model=model,
            levels=args.levels,
            base_N=args.n0,
            dt0=args.dt0,
            Tf=args.tf,
            eta=args.eta,
            measure_steady=True,
            precision=os.environ.get("NA_DD_TPU_PRECISION") or None,
        )
        # gate on the PAIRWISE log2 rates (levels-1 of them), same as the
        # serial path — the 3-point res['rates'] has only levels-2 entries
        # and would leave a 3-level run ungated
        pairwise = [
            float(np.log2(res["errors"][i] / res["errors"][i + 1]))
            for i in range(len(res["errors"]) - 1)
        ]
        print("observed rates (pairwise):", [f"{r:.3f}" for r in pairwise])
        ok = all(abs(r - 2.0) < 0.35 for r in pairwise[-2:]) and all(
            res["converged"]
        )
        print("[OK]" if ok else "[RATE/CONVERGENCE CHECK FAILED]")
        res.update(
            backend=jax.default_backend(),
            x64=bool(jax.config.jax_enable_x64),
            timestamp=time.strftime("%Y-%m-%d %H:%M:%S"),
        )
        out_path = args.out or os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "results",
            "three_d_study_batched.json",
        )
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(res, f, indent=1)
        print("archived:", out_path)
        return 0 if ok else 1

    if args.self_reference and not args.temporal:
        ap.error("--self-reference requires --temporal")

    levels = []
    final_states = []
    self_ref_grid = None
    for k in range(args.levels):
        # spatial ladder: N doubles and dt halves per level (order-2 in
        # both); temporal ladder: FIXED N, dt halves (notebook cell 11 twin)
        N = args.n0 if args.temporal else args.n0 * 2**k
        dt = args.dt0 / 2**k
        g, case, _field, integ = make_setup3(
            MMSCaseExpSin3,
            N=N,
            model=model,
            variant=args.variant,
            eta=args.eta,
            integrator_params=dict(num_newton_steps=2),
        )
        run, s0 = build_runner3(g, case, integ, Tf=args.tf, dt=dt)
        t0 = time.perf_counter()
        res = jax.block_until_ready(run(s0))
        t_cold = time.perf_counter() - t0
        if args.self_reference:
            final_states.append(res[0])
            self_ref_grid = g
            self_ref_parts = (case, integ)
        # steady = min over 3 calls of the SAME compiled program (tunneled
        # single calls carry tens of ms of jitter — same policy as bench.py)
        t_warm = min(
            _timed(lambda: jax.block_until_ready(run(s0))) for _ in range(3)
        )
        _s_fin, worst, conv, hcs_ok, _per = res
        if not bool(hcs_ok):
            from na_dd_tpu.integrators.pc_trapezoidal import (
                HCsCorrectorPositivityError,
            )

            raise HCsCorrectorPositivityError(
                f"level N={N}: HCs corrector denominator lost positivity"
            )
        num_steps = max(1, int(np.ceil(args.tf / dt)))
        lv = dict(
            N=N,
            dt=dt,
            nodes=(N + 1) ** 3,
            error=float(np.sqrt(worst)),
            converged=bool(conv),
            cold_s=t_cold,
            warm_s=t_warm,
            warm_per_step_s=t_warm / num_steps,
        )
        levels.append(lv)
        print(
            f"[L{k}] N={N:4d} ({lv['nodes']:>9,} nodes) dt={dt:.2e} "
            f"err={lv['error']:.6e} conv={lv['converged']} "
            f"cold={t_cold:.1f}s warm={t_warm:.3f}s "
            f"({lv['warm_per_step_s'] * 1e3:.1f} ms/step)",
            flush=True,
        )
        # incremental dump: a timeout at a later level (the endpoint can
        # stall 20-50 min per large-module compile during degradation
        # episodes) keeps every completed level on disk
        partial_path = args.out or os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "results",
            "three_d_study.json",
        )
        os.makedirs(os.path.dirname(partial_path), exist_ok=True)
        with open(partial_path, "w") as f:
            json.dump(
                dict(
                    backend=jax.default_backend(),
                    x64=bool(jax.config.jax_enable_x64),
                    variant=args.variant,
                    kind="temporal" if args.temporal else "spatial",
                    precision=os.environ.get("NA_DD_TPU_PRECISION", "full"),
                    Tf=args.tf,
                    eta=args.eta,
                    levels=levels,
                    partial=True,
                    timestamp=time.strftime("%Y-%m-%d %H:%M:%S"),
                ),
                f,
                indent=1,
            )

    errs = [lv["error"] for lv in levels]
    rates = [float(np.log2(errs[i] / errs[i + 1])) for i in range(len(errs) - 1)]
    print("observed rates:", [f"{r:.3f}" for r in rates])

    self_rates = None
    if args.self_reference:
        # Reference run: same grid/case/integrator, dt two halvings below
        # the finest level — its temporal error is 16x below the finest
        # level's, so it contaminates the observed rates by <log2(17/16).
        case, integ = self_ref_parts
        dt_ref = args.dt0 / 2 ** (args.levels + 1)
        run_ref, s0_ref = build_runner3(
            self_ref_grid, case, integ, Tf=args.tf, dt=dt_ref
        )
        t0 = time.perf_counter()
        res_ref = jax.block_until_ready(run_ref(s0_ref))
        print(
            f"[ref] dt={dt_ref:.2e} ({int(np.ceil(args.tf / dt_ref))} steps) "
            f"cold={time.perf_counter() - t0:.1f}s conv={bool(res_ref[2])}",
            flush=True,
        )
        s_ref = res_ref[0]

        from na_dd_tpu.three_d.inner_products import inner_H3
        from na_dd_tpu.three_d.shifts import LOCAL_OPS3

        @jax.jit
        def diff_norm_sq(sa, sb):
            tot = 0.0
            for v in type(sa)._fields:
                e = getattr(sa, v) - getattr(sb, v)
                tot = tot + inner_H3(LOCAL_OPS3, self_ref_grid, e, e)
            return tot

        self_errs = [
            float(np.sqrt(diff_norm_sq(s_k, s_ref))) for s_k in final_states
        ]
        self_rates = [
            float(np.log2(self_errs[i] / self_errs[i + 1]))
            for i in range(len(self_errs) - 1)
        ]
        for lv, se in zip(levels, self_errs):
            lv["self_ref_error"] = se
        print("self-reference errors:", [f"{e:.3e}" for e in self_errs])
        print("self-reference rates:", [f"{r:.3f}" for r in self_rates])

    if args.temporal and args.self_reference:
        rate_ok = (
            all(abs(r - 2.0) < 0.35 for r in self_rates[-2:])
            if len(self_rates) >= 2
            else True
        )
    elif args.temporal:
        # temporal ladders legitimately stall on the fixed grid's spatial
        # floor (the reference's own cell-11 behavior): a level passes on
        # rate ~2 OR on sitting at the floor (error stopped moving)
        floor = [
            abs(errs[i] - errs[i + 1]) < 0.05 * errs[i]
            for i in range(len(errs) - 1)
        ]
        rate_ok = all(
            abs(r - 2.0) < 0.35 or f for r, f in zip(rates[-2:], floor[-2:])
        ) if len(rates) >= 2 else True
    else:
        rate_ok = (
            all(abs(r - 2.0) < 0.35 for r in rates[-2:]) if len(rates) >= 2 else True
        )
    ok = rate_ok and all(lv["converged"] for lv in levels)
    print("[OK]" if ok else "[RATE/CONVERGENCE CHECK FAILED]")

    # CPU-x64 adjudication of one level (VERDICT r4 task 6): the 3-D ladders
    # have no external golden values, so the TPU-noise check is agreement
    # with exact-f64 CPU on the cheapest level (level 0: fewest steps on
    # temporal ladders, smallest grid on spatial ones).  Runs in a fresh
    # CPU-forced subprocess; a failure flags the archived JSON AND fails the
    # study exit code, so a poisoned TPU number cannot land unflagged.
    adjudication = None
    if jax.default_backend() != "cpu" and os.environ.get(
        "NA_DD_ADJUDICATE", "1"
    ) != "0":
        import subprocess

        lv0 = levels[0]
        cmd = [
            sys.executable,
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "adjudicate_three_d.py"),
            "--N", str(lv0["N"]), "--dt", repr(lv0["dt"]),
            "--tf", repr(args.tf), "--eta", repr(args.eta),
            "--variant", args.variant, "--tpu-error", repr(lv0["error"]),
        ]
        try:
            proc = subprocess.run(
                cmd, capture_output=True, text=True,
                timeout=float(os.environ.get("NA_DD_ADJUDICATE_TIMEOUT", "1800")),
            )
            for line in proc.stdout.splitlines():
                if line.startswith("ADJUDICATION_JSON: "):
                    adjudication = json.loads(line[len("ADJUDICATION_JSON: "):])
            if adjudication is None:
                adjudication = dict(passed=None, error="no ADJUDICATION_JSON",
                                    rc=proc.returncode,
                                    stderr=proc.stderr[-500:])
        except subprocess.TimeoutExpired:
            adjudication = dict(passed=None, error="timeout")
        print("adjudication (CPU x64, level 0):", json.dumps(adjudication),
              flush=True)
        if adjudication.get("passed") is False:
            ok = False
            print("[ADJUDICATION FAILED: TPU level-0 error deviates from "
                  "CPU x64 beyond tolerance]")

    result = dict(
        backend=jax.default_backend(),
        x64=bool(jax.config.jax_enable_x64),
        variant=args.variant,
        kind="temporal" if args.temporal else "spatial",
        precision=os.environ.get("NA_DD_TPU_PRECISION", "full"),
        Tf=args.tf,
        eta=args.eta,
        levels=levels,
        rates=rates,
        self_reference_rates=self_rates,
        adjudication=adjudication,
        timestamp=time.strftime("%Y-%m-%d %H:%M:%S"),
    )
    out_path = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results", "three_d_study.json"
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print("archived:", out_path)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
