"""Legacy all-in-one convergence-study runner.

API-level counterpart of the reference's older driver
(``run_convergence_studies`` / ``StudyConfig`` / ``FullCvgReport``,
src/cvg_studies_base.py:304-486): one call runs a spatial ladder
(N doubling at fixed dt) and a temporal ladder (dt halving at fixed N) for
each configured case and returns a dict-of-dicts report.  The execution path
is the modern scan-based harness.
"""

from __future__ import annotations

import time
from typing import Any, Dict, List, Tuple

from na_dd_tpu.harness.rates import calculate_observed_rates
from na_dd_tpu.harness.trial import MMSTrial
from na_dd_tpu.ops import make_uniform_grid

# (field_cls, mms_case_cls, forcing_terms_cls, integrator_cls, label)
StudyConfig = Tuple[type, type, type, type, str]
FullCvgReport = Dict[str, Dict[str, list]]


def run_convergence_studies(
    study_configs: List[StudyConfig], study_params: Dict[str, Any]
) -> Dict[str, FullCvgReport]:
    """Spatial + temporal ladders for each study config.

    study_params keys (reference src/cvg_studies_base.py:341-346):
      Tf, model, N_base_spatial, num_spatial_refinements, dt_fixed_spatial,
      N_fixed_temporal, dt_base_temporal, num_temporal_refinements,
      optional: variable_names, integral_vars, num_pc_steps, num_newton_steps,
      and (extensions) forcing_terms_params / field_params / integrator_params.
    """
    variable_names = study_params.get("variable_names")
    integral_vars = study_params.get("integral_vars")
    Tf = study_params["Tf"]
    model = study_params["model"]
    refinement_factor = 2

    def extra_params():
        return dict(
            forcing_terms_params=study_params.get("forcing_terms_params", {}),
            field_params=study_params.get("field_params", {}),
            integrator_params=dict(
                num_pc_steps=study_params.get("num_pc_steps", 1),
                num_newton_steps=study_params.get("num_newton_steps", 1),
                **study_params.get("integrator_params", {}),
            ),
        )

    all_results: Dict[str, FullCvgReport] = {}
    for field_cls, mms_case_cls, forcing_terms_cls, integrator_cls, label in study_configs:
        case_results: FullCvgReport = {
            "spatial": {"errors": [], "rates": [], "statuses": []},
            "temporal": {"errors": [], "rates": [], "statuses": []},
        }

        # --- spatial ladder ---
        N_base = study_params["N_base_spatial"]
        dt_fixed = study_params["dt_fixed_spatial"]
        for k in range(study_params["num_spatial_refinements"]):
            N = N_base * refinement_factor**k
            grid = make_uniform_grid(N, N)
            trial = MMSTrial(
                grid, model, mms_case_cls, field_cls, forcing_terms_cls,
                integrator_cls, variable_names=variable_names,
                integral_vars=integral_vars, **extra_params(),
            )
            t0 = time.perf_counter()
            summary = trial.run_for_errors(Tf=Tf, dt=dt_fixed)
            print(
                f"  [{label}] spatial N={N}: err={summary.overall_combined_error:.4e}"
                f" ({time.perf_counter() - t0:.2f}s)"
            )
            case_results["spatial"]["errors"].append(summary.overall_combined_error)

        # --- temporal ladder (fixed grid, reused trial) ---
        N_fixed = study_params["N_fixed_temporal"]
        dt_base = study_params["dt_base_temporal"]
        grid = make_uniform_grid(N_fixed, N_fixed)
        trial = MMSTrial(
            grid, model, mms_case_cls, field_cls, forcing_terms_cls,
            integrator_cls, variable_names=variable_names,
            integral_vars=integral_vars, **extra_params(),
        )
        for k in range(study_params["num_temporal_refinements"]):
            dt = dt_base / refinement_factor**k
            t0 = time.perf_counter()
            summary = trial.run_for_errors(Tf=Tf, dt=dt)
            print(
                f"  [{label}] temporal dt={dt:.3e}: err={summary.overall_combined_error:.4e}"
                f" ({time.perf_counter() - t0:.2f}s)"
            )
            case_results["temporal"]["errors"].append(summary.overall_combined_error)

        for kind in ("spatial", "temporal"):
            errs = case_results[kind]["errors"]
            if len(errs) >= 3:
                pairs = calculate_observed_rates(errs, refinement_factor)
                case_results[kind]["rates"] = [r for r, _ in pairs]
                case_results[kind]["statuses"] = [s for _, s in pairs]
        all_results[label] = case_results
    return all_results
