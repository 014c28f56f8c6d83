#!/usr/bin/env python
"""Beyond-reference scale probe: the f32 production mode at N = 512..2048.

The reference's notebooks stop at N=256 (a 280 s serial-CPU run per finest
level); this probe runs the pol protocol at 4x-64x that node count in the
f32 production mode and measures the Pallas kernel-tier engagement across
the VMEM fallback chain (fused whole-solve kernel -> single-block apply ->
row-tiled apply, ops/pallas_kernels.py): at N >= ~1024 f32 the single-block
kernels no longer fit and the grid-spec row-tiled apply keeps the Krylov
matvec on the kernel path.

There are no reference values above N=256, so the accuracy gate is
cross-backend agreement: the pallas-tier run must match the jnp (XLA-fused)
run of the SAME f32 program to f32 roundoff.

Usage: python studies/scale_probe.py [N ...]   (default 512 1024 2048)
Writes studies/results/scale_probe.json.
"""

import os
import sys

os.environ["NA_DD_TPU_X64"] = "0"  # f32 production mode
# grid as traced jit argument: closed-over grids bake ~16 N^2-sized metric
# planes into the module as dense constants (539 MB of module text at
# N=2048), which overflows this environment's remote-compile request limit
# (HTTP 413) and bloats the compile cache.  Bit-identical on CPU; the f32
# probe gates accuracy by cross-backend agreement anyway.
os.environ.setdefault("NA_DD_TPU_TRACED_GRID", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("SCALE_PROBE_CPU"):  # sanity runs off the TPU
    import jax

    jax.config.update("jax_platforms", "cpu")

from na_dd_tpu.config import enable_persistent_compilation_cache, setup_x64

setup_x64()
enable_persistent_compilation_cache()

import json
import time

import jax.numpy as jnp

from na_dd_tpu.harness.studies import (
    STUDIES,
    _make_trial,
    choose_krylov_unroll,
    study_consts,
)
from na_dd_tpu.ops.pallas_kernels import apply_fits, fused_solve_fits


def run_one(cfg, mc, N, dt, Tf, tier, backend):
    trial = _make_trial(
        cfg["case_cls"], N, 50.0, mc=mc, krylov_unroll=tier,
        stencil_backend=backend,
    )
    t0 = time.perf_counter()
    summary = trial.run_for_errors(Tf=Tf, dt=dt)
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    summary = trial.run_for_errors(Tf=Tf, dt=dt)
    steady = time.perf_counter() - t0
    return {
        "error": float(summary.overall_combined_error),
        "cold_s": round(cold, 3),
        "steady_s": round(steady, 4),
    }


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [512, 1024, 2048]
    cfg = STUDIES["pol"]
    mc = study_consts("pol")

    out = {"study": "pol", "mode": "f32", "configs": []}
    for N in sizes:
        dt = 0.25 / N  # the spatial-ladder protocol's dt(N)
        Tf = 5 * dt
        tier = choose_krylov_unroll(N, dt, mc)
        shape = (N + 1, N + 1)
        row = {
            "N": N,
            "dt": dt,
            "steps": 5,
            "krylov_tier": tier,
            "fused_solve_fits": bool(fused_solve_fits(shape, jnp.float32)),
            "apply_fits": bool(apply_fits(shape, jnp.float32)),
        }
        # kernel tier that will engage on the pallas backend (fallback chain)
        row["pallas_tier"] = (
            "fused_solve" if row["fused_solve_fits"]
            else "single_block_apply" if row["apply_fits"]
            else "tiled_apply"
        )
        for backend in ("jnp", "pallas"):
            try:
                row[backend] = run_one(cfg, mc, N, dt, Tf, tier, backend)
            except Exception as exc:  # keep probing the other tiers/sizes
                import traceback

                traceback.print_exc()
                row[backend] = {"error": None, "failed": repr(exc)[:500]}
            print(json.dumps({"N": N, backend: row[backend]}), flush=True)
        ej = row["jnp"].get("error")
        ep = row["pallas"].get("error")
        if ej is not None and ep is not None:
            row["cross_backend_rel"] = abs(ep - ej) / max(abs(ej), 1e-300)
        out["configs"].append(row)
        print(json.dumps(row), flush=True)

    res = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")
    os.makedirs(res, exist_ok=True)
    with open(os.path.join(res, "scale_probe.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("saved", os.path.join(res, "scale_probe.json"))


if __name__ == "__main__":
    main()
