#!/usr/bin/env python
"""Generate runnable convergence-study notebooks.

Counterpart of the reference's notebook front-end (six hand-copied
``*_convergence_study.ipynb`` files plus the ``modify_notebook_cell``
templating helper, reference src/notebook_studies_helpers.py:183-211).
Instead of mutating a template, each notebook is generated from the study
registry — .ipynb is plain JSON, so no nbformat dependency is needed.

    python studies/make_notebook.py --study expsin
    python studies/make_notebook.py --all
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STUDY_KEYS = [
    "pol",
    "expsin",
    "nfsp_cpcsH2_TclcdH3",
    "nfsp_cpcsH2_TclcdH2",
    "nfsp_cpcsH1_TclcdH2",
    "peaks_fast1e1",
]


def _code(src):
    return {
        "cell_type": "code",
        "execution_count": None,
        "metadata": {},
        "outputs": [],
        "source": src.splitlines(keepends=True),
    }


def _md(src):
    return {"cell_type": "markdown", "metadata": {}, "source": src.splitlines(keepends=True)}


def build_notebook(study: str) -> dict:
    cells = [
        _md(
            f"# Convergence study: `{study}` (PC-RegHCsTriple, eta=50)\n\n"
            "TPU-native reproduction of the reference notebook protocol: spatial\n"
            "ladder N=2·2^k with dt=h^1.5, temporal dt-halving ladder, and the\n"
            "regularization-factor sweep. Each simulation runs as one fused XLA\n"
            "program."
        ),
        _code(
            "import jax\n"
            "jax.config.update('jax_enable_x64', True)\n"
            "from na_dd_tpu.config import enable_persistent_compilation_cache\n"
            "enable_persistent_compilation_cache()\n"
            "from na_dd_tpu.harness.studies import (\n"
            "    run_spatial_study, run_temporal_study, run_eta_study_batched, STUDIES)\n"
            "from na_dd_tpu.harness.rates import report_on_rates\n"
            "from na_dd_tpu.harness.plotting import plot_errors_and_rates, visualize_mms_solution\n"
            f"STUDY = {study!r}\n"
        ),
        _md("## Visualize the manufactured solution"),
        _code(
            "from na_dd_tpu.harness.studies import STUDY_MODEL_CONSTS\n"
            "from na_dd_tpu.models import Model02\n"
            "from na_dd_tpu.ops import make_uniform_grid\n"
            "case = STUDIES[STUDY]['case_cls'](grid=make_uniform_grid(32, 32),\n"
            "                                  model=Model02(STUDY_MODEL_CONSTS))\n"
            "visualize_mms_solution(case, time_point=0.1)\n"
        ),
        _md("## Spatial convergence (cell 9 protocol)"),
        _code(
            "spatial = run_spatial_study(STUDY, levels=8)\n"
            "report_on_rates(spatial['errors'], expected_rate=2.0, tolerance=0.3,\n"
            "                title=f'{STUDY} spatial rates')\n"
            "plot_errors_and_rates(spatial['errors'], spatial['rates'], spatial['Ns'],\n"
            "                      'N', f'{STUDY} spatial', expected_rate=2.0)\n"
        ),
        _md("## Temporal convergence (cell 11 protocol)"),
        _code(
            "temporal = run_temporal_study(STUDY)\n"
            "report_on_rates(temporal['errors'], expected_rate=2.0, tolerance=0.3,\n"
            "                title=f'{STUDY} temporal rates')\n"
            "plot_errors_and_rates(temporal['errors'], temporal['rates'], temporal['dts'],\n"
            "                      'dt', f'{STUDY} temporal', expected_rate=2.0)\n"
        ),
        _md("## Regularization-factor study (cell 13 protocol, vmapped)"),
        _code("eta = run_eta_study_batched(STUDY)\nprint(dict(zip(eta['etas'], eta['errors'])))\n"),
    ]
    return {
        "cells": cells,
        "metadata": {
            "kernelspec": {"display_name": "Python 3", "language": "python", "name": "python3"},
            "language_info": {"name": "python", "version": "3.12"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--study", choices=STUDY_KEYS)
    p.add_argument("--all", action="store_true")
    p.add_argument("--outdir", default=os.path.join(os.path.dirname(__file__), "notebooks"))
    args = p.parse_args()
    studies = STUDY_KEYS if args.all else [args.study or "expsin"]
    os.makedirs(args.outdir, exist_ok=True)
    for study in studies:
        path = os.path.join(args.outdir, f"{study}_reghcstriple_convergence_study.ipynb")
        with open(path, "w") as f:
            json.dump(build_notebook(study), f, indent=1)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
