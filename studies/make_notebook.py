#!/usr/bin/env python
"""Generate convergence-study notebooks, optionally with saved outputs.

Counterpart of the reference's notebook front-end (six hand-copied
``*_convergence_study.ipynb`` files plus the ``modify_notebook_cell``
templating helper, reference src/notebook_studies_helpers.py:183-211).
Instead of mutating a template, each notebook is generated from the study
registry — .ipynb is plain JSON, so no nbformat dependency is needed.

With ``--embed-results`` (the default when archived results exist) each study
cell carries SAVED OUTPUTS built from ``studies/results/*.json``: the
per-level error/wall-clock lines, the rate report, and the rendered
error/rate plot — so the notebooks are inspectable artifacts exactly like
the reference's executed notebooks, without re-running hours of TPU time.
The cells remain runnable; re-executing reproduces the embedded numbers.

    python studies/make_notebook.py --all
    python studies/make_notebook.py --study expsin --no-embed-results
"""

import argparse
import base64
import io
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS_DIR = os.path.join(os.path.dirname(__file__), "results")

STUDY_KEYS = [
    "pol",
    "expsin",
    "nfsp_cpcsH2_TclcdH3",
    "nfsp_cpcsH2_TclcdH2",
    "nfsp_cpcsH1_TclcdH2",
    "peaks_fast1e1",
]


def _code(src, outputs=None):
    return {
        "cell_type": "code",
        "execution_count": None,
        "metadata": {},
        "outputs": outputs or [],
        "source": src.splitlines(keepends=True),
    }


def _md(src):
    return {"cell_type": "markdown", "metadata": {}, "source": src.splitlines(keepends=True)}


def _stream(text):
    return {"output_type": "stream", "name": "stdout", "text": text.splitlines(keepends=True)}


def _png_output(fig_bytes):
    return {
        "output_type": "display_data",
        "data": {"image/png": base64.b64encode(fig_bytes).decode("ascii")},
        "metadata": {},
    }


def _load_result(study, kind):
    for name in (f"{study}_{kind}.json", f"{study}_{kind}_batched.json"):
        path = os.path.join(RESULTS_DIR, name)
        if os.path.exists(path):
            with open(path) as f:
                return json.load(f)
    return None


def _rate_plot_png(res, x_key, x_label, title):
    from na_dd_tpu.harness.plotting import plot_errors_and_rates

    fig = plot_errors_and_rates(
        res["errors"], res.get("rates") or [], res[x_key], x_label, title,
        expected_rate=2.0,
    )
    buf = io.BytesIO()
    fig.savefig(buf, format="png", bbox_inches="tight")
    import matplotlib.pyplot as plt

    plt.close(fig)
    return buf.getvalue()


def _study_outputs(study, kind, x_key, x_label):
    """Saved outputs for a spatial/temporal study cell from archived JSON."""
    res = _load_result(study, kind)
    if res is None:
        return None
    lines = []
    xs = res[x_key]
    steady = res.get("steady_s") or [None] * len(xs)
    for i, (x, err, t) in enumerate(zip(xs, res["errors"], res["wallclock_s"])):
        extra = f" steady={steady[i]:.2f}s" if steady[i] is not None else ""
        lines.append(f"  [{kind} {study}] {x_label}={x} err={err:.6e} ({t:.2f}s{extra})")
    if res.get("reference_errors"):
        lines.append(
            f"  reference per-level errors: "
            + ", ".join(f"{e:.4e}" for e in res["reference_errors"])
        )
        lines.append(
            f"  max relative deviation vs reference: "
            f"{res.get('max_rel_dev_vs_reference', float('nan')):.2e}"
        )
    if res.get("rates"):
        lines.append(f"  observed rates: " + ", ".join(f"{r:.3f}" for r in res["rates"]))
    outputs = [_stream("\n".join(lines) + "\n")]
    try:
        outputs.append(_png_output(_rate_plot_png(res, x_key, x_label, f"{study} {kind}")))
    except Exception:
        pass
    return outputs


def _eta_outputs(study):
    res = _load_result(study, "eta") or _load_result(study, "eta_batched")
    if res is None:
        return None
    lines = [
        f"  [eta {study}] eta={eta:7.1f} err={err:.6e}"
        for eta, err in zip(res["etas"], res["errors"])
    ]
    if res.get("reference_errors"):
        lines.append(
            "  reference: " + ", ".join(f"{e:.6e}" for e in res["reference_errors"])
        )
    lines.append(
        f"  whole sweep in one vmapped program: {res['wallclock_s'][-1]:.2f}s"
    )
    return [_stream("\n".join(lines) + "\n")]


def build_notebook(study: str, embed_results: bool = True) -> dict:
    sp_out = _study_outputs(study, "spatial", "Ns", "N") if embed_results else None
    tm_out = _study_outputs(study, "temporal", "dts", "dt") if embed_results else None
    eta_out = _eta_outputs(study) if embed_results else None
    cells = [
        _md(
            f"# Convergence study: `{study}` (PC-RegHCsTriple, eta=50)\n\n"
            "TPU-native reproduction of the reference notebook protocol: spatial\n"
            "ladder N=2·2^k with dt=h^1.5, temporal dt-halving ladder, and the\n"
            "regularization-factor sweep. Each simulation runs as one fused XLA\n"
            "program. Saved outputs below were produced on a TPU v5e chip\n"
            "(float64); see REPRODUCTION.md for the comparison against the\n"
            "reference's saved notebook outputs."
        ),
        _code(
            "import jax\n"
            "jax.config.update('jax_enable_x64', True)\n"
            "from na_dd_tpu.config import enable_persistent_compilation_cache\n"
            "enable_persistent_compilation_cache()\n"
            "from na_dd_tpu.harness.studies import (\n"
            "    run_spatial_study, run_temporal_study, run_eta_study_batched,\n"
            "    STUDIES, study_consts)\n"
            "from na_dd_tpu.harness.rates import report_on_rates\n"
            "from na_dd_tpu.harness.plotting import plot_errors_and_rates, visualize_mms_solution\n"
            f"STUDY = {study!r}\n"
        ),
        _md("## Visualize the manufactured solution"),
        _code(
            "from na_dd_tpu.models import Model02\n"
            "from na_dd_tpu.ops import make_uniform_grid\n"
            "case = STUDIES[STUDY]['case_cls'](grid=make_uniform_grid(32, 32),\n"
            "                                  model=Model02(study_consts(STUDY)))\n"
            "visualize_mms_solution(case, time_point=0.1)\n"
        ),
        _md("## Spatial convergence (cell 9 protocol)"),
        _code(
            "spatial = run_spatial_study(STUDY, levels=8, measure_steady=True)\n"
            "report_on_rates(spatial['errors'], expected_rate=2.0, tolerance=0.3,\n"
            "                title=f'{STUDY} spatial rates')\n"
            "plot_errors_and_rates(spatial['errors'], spatial['rates'], spatial['Ns'],\n"
            "                      'N', f'{STUDY} spatial', expected_rate=2.0)\n",
            outputs=sp_out,
        ),
        _md("## Temporal convergence (cell 11 protocol)"),
        _code(
            "temporal = run_temporal_study(STUDY, measure_steady=True)\n"
            "report_on_rates(temporal['errors'], expected_rate=2.0, tolerance=0.3,\n"
            "                title=f'{STUDY} temporal rates')\n"
            "plot_errors_and_rates(temporal['errors'], temporal['rates'], temporal['dts'],\n"
            "                      'dt', f'{STUDY} temporal', expected_rate=2.0)\n",
            outputs=tm_out,
        ),
        _md("## Regularization-factor study (cell 13 protocol, vmapped)"),
        _code(
            "eta = run_eta_study_batched(STUDY)\nprint(dict(zip(eta['etas'], eta['errors'])))\n",
            outputs=eta_out,
        ),
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


def _three_d_outputs():
    """Saved outputs for the 3-D study cell from archived JSON (CPU ladder
    always; TPU f32/f64 ladders appended when their archives exist)."""
    outputs = []
    for name, label in [
        ("three_d_study.json", "CPU f64"),
        ("three_d_study_tpu_f32.json", "TPU f32"),
        ("three_d_study_tpu_f64.json", "TPU f64"),
        ("three_d_study_batched.json", "batched"),
        ("three_d_study_tpu_f64_batched.json", "TPU f64, batched"),
    ]:
        path = os.path.join(RESULTS_DIR, name)
        if not os.path.exists(path):
            continue
        with open(path) as f:
            res = json.load(f)
        lines = [
            f"  [{label}] backend={res.get('backend', '?')} x64={res.get('x64', '?')}"
        ]
        if "levels" in res:  # serial-runner schema (per-level timing dicts)
            Ns = [lv["N"] for lv in res["levels"]]
            errors = [lv["error"] for lv in res["levels"]]
            for lv in res["levels"]:
                lines.append(
                    f"  N={lv['N']:4d} ({lv['nodes']:>9,} nodes) dt={lv['dt']:.2e} "
                    f"err={lv['error']:.6e} warm={lv['warm_s']:.3f}s "
                    f"({lv['warm_per_step_s'] * 1e3:.1f} ms/step)"
                )
        else:  # batched-ladder schema (ONE program for the whole ladder)
            Ns = res["Ns"]
            errors = res["errors"]
            for N, err in zip(Ns, errors):
                lines.append(f"  N={N:4d} err={err:.6e}")
            lines.append(
                f"  whole ladder in ONE program: compile+run "
                f"{res['compile_plus_run_s']:.1f}s"
                + (
                    f", steady {res['steady_s']:.2f}s"
                    if res.get("steady_s") is not None
                    else ""
                )
            )
        pairwise = [
            float(np.log2(errors[i] / errors[i + 1])) for i in range(len(errors) - 1)
        ]
        lines.append("  observed rates: " + ", ".join(f"{r:.3f}" for r in pairwise))
        outputs.append(_stream("\n".join(lines) + "\n"))
        try:
            # the plot helper wants the harness's 3-point rates (len-2), not
            # the pairwise log2 ratios (len-1)
            from na_dd_tpu.harness.rates import calculate_observed_rates

            compat = {
                "Ns": Ns,
                "errors": errors,
                "rates": [r for r, _s in calculate_observed_rates(errors)],
            }
            outputs.append(
                _png_output(_rate_plot_png(compat, "Ns", "N", f"3-D spatial ({label})"))
            )
        except Exception:
            pass
    return outputs or None


def build_three_d_notebook(embed_results: bool = True) -> dict:
    """Notebook presenting the beyond-reference 3-D model capability."""
    out = _three_d_outputs() if embed_results else None
    cells = [
        _md(
            "# 3-D model convergence study (beyond reference)\n\n"
            "The reference framework is strictly 2-D.  `na_dd_tpu.three_d`\n"
            "carries the FULL five-field NA-DD system to (N+1, M+1, P+1)\n"
            "grids — fields with analytic Stencil7 Jacobian/coupling planes,\n"
            "a (t,x,y,z) MMS engine, and the complete PC-trapezoidal\n"
            "integrator family inheriting the 2-D Newton/Krylov/mixed-\n"
            "precision machinery unchanged.  This notebook runs the spatial\n"
            "ladder of `studies/three_d_study.py` (dt ∝ h, so both error\n"
            "components contract at order 2) and reports the reference-style\n"
            "combined max-integral error norm."
        ),
        _code(
            "import jax\n"
            "jax.config.update('jax_enable_x64', True)\n"
            "from na_dd_tpu.config import enable_persistent_compilation_cache\n"
            "enable_persistent_compilation_cache()\n"
            "import numpy as np\n"
            "from na_dd_tpu.models import Model02, default_model_consts\n"
            "from na_dd_tpu.three_d import MMSCaseExpSin3, make_setup3, run_trial3\n"
            "MC = default_model_consts._replace(K1=1e-3, K2=1e-3, K3=1e-3, K4=1e-3,\n"
            "                                   Dl_max=1e-5, Kd=1e-2, Sd=1.0, Dd_max=1e-6)\n"
            "model = Model02(MC)\n"
        ),
        _md("## Visualize the manufactured solution (z slices)"),
        _code(
            "from na_dd_tpu.three_d import make_uniform_grid3\n"
            "from na_dd_tpu.harness.plotting import visualize_mms_solution3\n"
            "case_viz = MMSCaseExpSin3(make_uniform_grid3(24, 24, 24), model)\n"
            "visualize_mms_solution3(case_viz, time_point=0.1)\n"
        ),
        _md("## Spatial ladder (dt ∝ h)"),
        _code(
            "errs = []\n"
            "for k in range(4):\n"
            "    N, dt = 4 * 2**k, 1e-2 / 2**k\n"
            "    g, case, field, integ = make_setup3(\n"
            "        MMSCaseExpSin3, N=N, model=model,\n"
            "        integrator_params=dict(num_newton_steps=2))\n"
            "    out = run_trial3(g, case, integ, Tf=0.02, dt=dt)\n"
            "    errs.append(out['error'])\n"
            "    print(f'N={N:4d} err={out[\"error\"]:.6e} converged={out[\"krylov_converged\"]}')\n"
            "print('rates:', [float(np.log2(errs[i]/errs[i+1])) for i in range(len(errs)-1)])\n",
            outputs=out,
        ),
        _md(
            "## Notes\n\n"
            "- The same ladder is scriptable via `python studies/three_d_study.py`\n"
            "  (archives JSON under `studies/results/`).\n"
            "- Sharded execution: wrap `integ.step_fn` in `jax.shard_map` with\n"
            "  `HaloOps3` over a 2-D device mesh (x/y halo planes ride ICI; the z\n"
            "  axis stays on-device as the TPU lane dimension) — numerically gated\n"
            "  in tests/test_three_d_model.py and the driver dryrun.\n"
            "- Production runs: `na_dd_tpu.three_d.make_integrator3` + the\n"
            "  dimension-agnostic `harness.simulate` drivers."
        ),
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
    p.add_argument("--three-d", action="store_true", help="also write the 3-D notebook")
    p.add_argument("--no-embed-results", action="store_true")
    p.add_argument("--outdir", default=os.path.join(os.path.dirname(__file__), "notebooks"))
    args = p.parse_args()
    studies = STUDY_KEYS if args.all else ([args.study] if args.study else ["expsin"])
    if args.three_d and not args.study:
        studies = studies if args.all else []
    os.makedirs(args.outdir, exist_ok=True)
    for study in studies:
        path = os.path.join(args.outdir, f"{study}_reghcstriple_convergence_study.ipynb")
        with open(path, "w") as f:
            json.dump(build_notebook(study, embed_results=not args.no_embed_results), f, indent=1)
        print(f"wrote {path}")
    if args.three_d or args.all:
        path = os.path.join(args.outdir, "three_d_model_convergence_study.ipynb")
        with open(path, "w") as f:
            json.dump(
                build_three_d_notebook(embed_results=not args.no_embed_results),
                f,
                indent=1,
            )
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
