#!/usr/bin/env python
"""Minimal characterization of the axon-TPU f64-emulation scan-fusion drift.

Measured (TPU v5 lite, 2026-08, peaks N=128, dt=h^1.5, Krylov budget 8,
analytic stencils — the shape behind studies/peaks_budget_bisect.py):

* ``jit(step_fn)`` standalone: TPU matches CPU x64 to 3e-14 (normal
  emulation noise), and budget 8 vs 16 are BIT-IDENTICAL on both backends.
* ``jit(scan(step_fn, length=1))`` — the **same computation** wrapped in a
  one-trip ``lax.scan``: the TPU result moves by **2.0e-9** per step versus
  its own standalone step, while CPU scan-1 == standalone to 1 ulp.
* 100 scanned steps: TPU drifts 1.4e-7 from CPU (~per-step drift x steps);
  at budget 16 the scanned program is healthy (<=2e-11 after 100 steps).

Conclusion: wrapping the step in ``lax.scan`` changes how XLA fuses it, and
on the f64-emulation backend certain fused shapes compute part of the step
at reduced precision — an emulation-lowering property, NOT an algorithm or
loop-primitive property (studies/axon_while_probe.py shows all carry shapes
clean in isolation).  Defense in this framework: per-study measured solver
configs (min_krylov_unroll floors) + CPU-x64 adjudication of every
suspicious TPU number.

Run both phases on the attached accelerator and a CPU-forced process, then
compare:

    python studies/scan_fusion_noise_probe.py dump 8          # TPU dump
    CPU=1 python studies/scan_fusion_noise_probe.py dump 8    # CPU dump
    python studies/scan_fusion_noise_probe.py compare 8
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("CPU") == "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from na_dd_tpu.config import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

import numpy as np

N = 128
VARS = ("cp", "T", "cl", "cd", "cs")


def _trial(budget):
    from na_dd_tpu.harness.studies import STUDIES, _make_trial, study_consts

    cfg = STUDIES["peaks_fast1e1"]
    return _make_trial(
        cfg["case_cls"], N, 50.0, mc=study_consts("peaks_fast1e1"), krylov_unroll=budget
    )


def dump(budget):
    from na_dd_tpu.harness.simulate import simulate
    from na_dd_tpu.ops.shifts import LOCAL_OPS

    dt = (1.0 / N) ** 1.5
    tr = _trial(budget)
    backend = "cpu" if os.environ.get("CPU") == "1" else "tpu"

    s_step, _ = jax.jit(tr.integrator.step_fn, static_argnums=1)(
        tr.grid, LOCAL_OPS, tr.initial_state, 0.0, dt
    )
    s_scan1, *_ = simulate(
        tr.integrator, tr.grid, tr.initial_state, t0=0.0, dt=dt, num_steps=1
    )
    jax.block_until_ready((s_step, s_scan1))
    out = f"/tmp/scanprobe_{backend}_b{budget}.npz"
    np.savez(
        out,
        **{f"step_{k}": np.asarray(v) for k, v in s_step._asdict().items()},
        **{f"scan1_{k}": np.asarray(v) for k, v in s_scan1._asdict().items()},
    )
    print("saved", out)


def compare(budget):
    t = np.load(f"/tmp/scanprobe_tpu_b{budget}.npz")
    c = np.load(f"/tmp/scanprobe_cpu_b{budget}.npz")

    def worst(a, pa, b, pb):
        return max(float(np.max(np.abs(a[f"{pa}_{v}"] - b[f"{pb}_{v}"]))) for v in VARS)

    print(f"budget {budget}:")
    print(f"  TPU scan1 vs TPU step : {worst(t, 'scan1', t, 'step'):.3e}  <- the drift")
    print(f"  CPU scan1 vs CPU step : {worst(c, 'scan1', c, 'step'):.3e}")
    print(f"  TPU step  vs CPU step : {worst(t, 'step', c, 'step'):.3e}")


if __name__ == "__main__":
    mode, budget = sys.argv[1], int(sys.argv[2])
    {"dump": dump, "compare": compare}[mode](budget)
