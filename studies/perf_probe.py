#!/usr/bin/env python
"""Single-chip performance/numerics probes for the headline benchmark level.

Each probe runs the MMSCasePol spatial N=256 level (the BASELINE.md headline:
reference 280.4 s) or the ExpSin N=256 level under one configuration and
prints first(compile-or-cache)+steady timings and the combined error, so
solver/backend choices are decided by measurement.

    python studies/perf_probe.py baseline          # unroll=16 f64 (bench config)
    python studies/perf_probe.py unroll8           # smaller Krylov budget
    python studies/perf_probe.py scanned           # lax.scan Krylov body
    NA_DD_TPU_X64=0 python studies/perf_probe.py baseline      # f32
    NA_DD_TPU_X64=0 NA_DD_TPU_STENCIL=pallas python studies/perf_probe.py baseline
    python studies/perf_probe.py expsin_state      # save final state for the
                                                   # TPU-vs-CPU drift diagnostic
    python studies/perf_probe.py trace             # xla_trace a steady run
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from na_dd_tpu.config import enable_persistent_compilation_cache, setup_x64

setup_x64()
enable_persistent_compilation_cache()

import numpy as np

from na_dd_tpu.harness.studies import _make_trial, study_consts
from na_dd_tpu.mms import cases as mms_cases

N = int(os.environ.get("PROBE_N", "256"))


def _run(trial, Tf, dt, label):
    t0 = time.perf_counter()
    s = trial.run_for_errors(Tf=Tf, dt=dt)
    first = time.perf_counter() - t0
    t0 = time.perf_counter()
    s = trial.run_for_errors(Tf=Tf, dt=dt)
    steady = time.perf_counter() - t0
    print(
        f"[probe {label}] N={N} first={first:.2f}s steady={steady:.3f}s "
        f"error={s.overall_combined_error:.10e} device={jax.devices()[0]}",
        flush=True,
    )
    return s


def pol_trial(**kw):
    args = dict(krylov_unroll=16)
    args.update(kw)
    return _make_trial(mms_cases.MMSCasePol, N, 50.0, mc=study_consts("pol"), **args)


def main():
    probe = sys.argv[1] if len(sys.argv) > 1 else "baseline"
    dt = (1.0 / N) ** 1.5
    if probe == "baseline":
        _run(pol_trial(), 0.01, dt, f"pol/{os.environ.get('NA_DD_TPU_STENCIL','jnp')}")
    elif probe == "unroll8":
        _run(pol_trial(krylov_unroll=8), 0.01, dt, "pol/unroll8")
    elif probe == "unroll12":
        _run(pol_trial(krylov_unroll=12), 0.01, dt, "pol/unroll12")
    elif probe == "scanned":
        trial = pol_trial()
        trial.integrator.krylov_scanned = True
        _run(trial, 0.01, dt, "pol/scanned")
    elif probe == "expsin":
        trial = _make_trial(mms_cases.MMSCaseExpSin, N, 50.0, krylov_unroll=16)
        _run(trial, 0.01, dt, "expsin")
    elif probe == "expsin_state":
        # run the N=256 expsin level and dump the final state: diff the
        # TPU and CPU dumps to split simulation drift from error-norm drift
        import math

        from na_dd_tpu.harness.simulate import simulate

        trial = _make_trial(mms_cases.MMSCaseExpSin, N, 50.0, krylov_unroll=16)
        num = math.ceil(0.01 / dt)

        s_final, _, _ = simulate(
            trial.integrator, trial.grid, trial.initial_state, t0=0.0,
            dt=0.01 / num, num_steps=num,
        )
        backend = jax.default_backend()
        out = f"/tmp/expsin_state_{backend}.npz"
        np.savez(out, **{k: np.asarray(v) for k, v in s_final._asdict().items()})
        print(f"[probe expsin_state] saved {out} ({num} steps dt={0.01/num:.3e})", flush=True)
    elif probe == "trace":
        from na_dd_tpu.utils.timing import xla_trace

        trial = pol_trial()
        trial.run_for_errors(Tf=0.01, dt=dt)  # compile
        with xla_trace("/tmp/na_dd_trace"):
            trial.run_for_errors(Tf=0.01, dt=dt)
        print("[probe trace] wrote /tmp/na_dd_trace", flush=True)
    else:
        raise SystemExit(f"unknown probe {probe}")


if __name__ == "__main__":
    main()
