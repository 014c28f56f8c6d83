#!/usr/bin/env python
"""Bisect the peaks spatial-ladder deviation across solver program shapes.

Motivation (2026-08): with the generic tier-8 unrolled-Krylov budget the
peaks spatial ladder deviated up to 56% at N=256 ON TPU — with every solve
reporting converged, and with CPU x64 exact at the same budget.  This script
reruns one level (default N=128, reference 5.355729e-5) under five program
shapes; the measured TPU result was

    unroll8/analytic            2.22e-2   (the deviating production shape)
    unroll16/analytic           5.71e-8   (exact -> pinned via
                                           STUDIES['peaks_fast1e1']['min_krylov_unroll'])
    unroll8/probe               2.00e-4
    unroll16/probe              2.00e-4   (== unroll8/probe: not an
                                           iteration-count effect)
    unroll16/analytic/scanned   2.22e-2   (== unroll8/analytic)

i.e. the deviation is program-shape-dependent f64-emulation rounding, not an
unconverged solve.  On CPU x64 every shape is exact to ~5e-8.  Run on either
backend:

    python studies/peaks_budget_bisect.py          # attached accelerator
    PEAKS_BISECT_CPU=1 python studies/peaks_budget_bisect.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("PEAKS_BISECT_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from na_dd_tpu.config import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

from na_dd_tpu.harness.studies import STUDIES, _make_trial, study_consts

N = int(os.environ.get("PEAKS_BISECT_N", "128"))
REF = {128: 5.355729e-5, 256: 1.329324e-5}.get(N)

CONFIGS = [
    ("unroll8/analytic", dict(krylov_unroll=8)),
    ("unroll16/analytic", dict(krylov_unroll=16)),
    ("unroll8/probe", dict(krylov_unroll=8, stencil_source="probe")),
    ("unroll16/probe", dict(krylov_unroll=16, stencil_source="probe")),
    ("unroll16/analytic/scanned", dict(krylov_unroll=16, krylov_scanned=True)),
]


def main():
    dt = (1.0 / N) ** 1.5
    cfg = STUDIES["peaks_fast1e1"]
    mc = study_consts("peaks_fast1e1")
    print(f"device {jax.devices()[0]}  N={N}  reference={REF}", flush=True)
    for label, kw in CONFIGS:
        t0 = time.time()
        trial = _make_trial(cfg["case_cls"], N, 50.0, mc=mc, **kw)
        e = trial.run_for_errors(Tf=1.0, dt=dt).overall_combined_error
        rel = abs(e - REF) / REF if REF else float("nan")
        print(f"  {label:28s} err={e:.6e} rel_vs_ref={rel:.2e} ({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
