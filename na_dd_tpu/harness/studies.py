"""Convergence-study driver: the six reference notebooks as parameterized runs.

Each reference notebook (``*_reghcstriple_convergence_study.ipynb``) runs, for
one MMS case, with shared study constants (notebook cell 3):

* cell 9  — spatial study: N = 2·2^k (8 levels), dt = h^1.5, PC-RegHCs η=50;
* cell 11 — temporal study: fixed grid, dt = BASE_DT/2^k;
* cell 13 — regularization study: N=32, dt=5e-4, η ∈ {10,…,1000}.

This module reproduces those protocols (same constants, same error
functional) with per-level wall-clock and compile-time split.  Results are
plain dicts, JSON-serializable for archiving under ``studies/results/``.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

from na_dd_tpu.core import FieldRegHCsTriple, MMSForcingRegHCsTriple
from na_dd_tpu.harness.rates import calculate_observed_rates
from na_dd_tpu.harness.trial import MMSTrial
from na_dd_tpu.integrators import PCTrapezoidalRegHCsTriple
from na_dd_tpu.mms import cases as mms_cases
from na_dd_tpu.models import Model02, ModelConsts
from na_dd_tpu.ops import make_uniform_grid

# Shared study constants — notebook cell 3 (identical across all six studies).
STUDY_MODEL_CONSTS = ModelConsts(
    R0=8.3144621,
    Ea=1.60217662e-19,
    K1=1e-3,
    K2=1e-3,
    K3=1e-3,
    K4=1e-3,
    DT=1e-3,
    Dl_max=1e-5,
    phi_l=1e-5,
    gamma_T=1e-9,
    Kd=1e-2,
    Sd=1.0,
    Dd_max=1e-6,
    phi_d=1e-5,
    phi_T=1.60217662e-19 / 8.3144621,
    r_sp=5e-2,
    T_ref=300.0,
)

DEFAULT_ETA = 50.0
ETA_LADDER = [10.0, 50.0, 100.0, 200.0, 300.0, 500.0, 1000.0]

# Registry of the six studies: MMS case class + protocol parameters taken
# from the corresponding notebook's cells 9/11.
STUDIES: Dict[str, dict] = {
    "pol": dict(
        case_cls=mms_cases.MMSCasePol,
        spatial_Tf=0.01,
        temporal=dict(N=256, base_dt=1e-2, levels=4, Tf=0.01),
    ),
    "expsin": dict(
        case_cls=mms_cases.MMSCaseExpSin,
        spatial_Tf=0.01,
        temporal=dict(N=32, base_dt=1e-2, levels=6, Tf=0.01),
    ),
    "nfsp_cpcsH2_TclcdH3": dict(
        case_cls=mms_cases.MMSCaseNonFullySmoothPol_cpcsH2_TclcdH3,
        spatial_Tf=1.0,
        temporal=dict(N=256, base_dt=1e-2, levels=4, Tf=0.01),
    ),
    "nfsp_cpcsH2_TclcdH2": dict(
        case_cls=mms_cases.MMSCaseNonFullySmoothPol_cpcsH2_TclcdH2,
        spatial_Tf=1.0,
        temporal=dict(N=256, base_dt=1e-2, levels=4, Tf=0.01),
    ),
    "nfsp_cpcsH1_TclcdH2": dict(
        case_cls=mms_cases.MMSCaseNonFullySmoothPol_cpcsH1_TclcdH2,
        spatial_Tf=1.0,
        temporal=dict(N=256, base_dt=1e-2, levels=4, Tf=0.01),
    ),
    "peaks_fast1e1": dict(
        case_cls=mms_cases.MMSCaseSlowlyChangingPeaks_Fast1e1,
        spatial_Tf=1.0,
        temporal=dict(N=200, base_dt=1.0, levels=9, Tf=10.0),
    ),
}


def _make_trial(case_cls, N: int, eta: float, *, track_residuals=False) -> MMSTrial:
    grid = make_uniform_grid(N, N)
    model = Model02(STUDY_MODEL_CONSTS)
    return MMSTrial(
        grid,
        model,
        case_cls,
        FieldRegHCsTriple,
        MMSForcingRegHCsTriple,
        PCTrapezoidalRegHCsTriple,
        forcing_terms_params=dict(regularization_factor=eta),
        field_params=dict(regularization_factor=eta),
        integrator_params=dict(regularization_factor=eta, track_residuals=track_residuals),
    )


def run_spatial_study(
    study: str,
    *,
    levels: int = 8,
    base_N: int = 2,
    eta: float = DEFAULT_ETA,
    verbose: bool = True,
) -> dict:
    """Notebook cell 9: N = base_N·2^k ladder with dt = h^1.5."""
    cfg = STUDIES[study]
    Tf = cfg["spatial_Tf"]
    errors: List[float] = []
    times: List[float] = []
    Ns: List[int] = []
    for k in range(levels):
        N = base_N * 2**k
        dt = (1.0 / N) ** 1.5
        trial = _make_trial(cfg["case_cls"], N, eta)
        t0 = time.perf_counter()
        summary = trial.run_for_errors(Tf=Tf, dt=dt)
        elapsed = time.perf_counter() - t0
        errors.append(summary.overall_combined_error)
        times.append(elapsed)
        Ns.append(N)
        if verbose:
            print(f"  [spatial {study}] N={N:4d} dt={dt:.3e} err={errors[-1]:.6e} ({elapsed:.2f}s)")
    rates = calculate_observed_rates(errors) if len(errors) >= 3 else []
    return dict(
        study=study,
        kind="spatial",
        Ns=Ns,
        Tf=Tf,
        eta=eta,
        errors=errors,
        wallclock_s=times,
        rates=[r for r, _ in rates],
        statuses=[s for _, s in rates],
    )


def run_temporal_study(
    study: str,
    *,
    levels: Optional[int] = None,
    eta: float = DEFAULT_ETA,
    verbose: bool = True,
) -> dict:
    """Notebook cell 11: fixed grid, dt = base_dt / 2^k ladder."""
    cfg = STUDIES[study]
    tcfg = cfg["temporal"]
    levels = levels or tcfg["levels"]
    N = tcfg["N"]
    Tf = tcfg["Tf"]
    trial = _make_trial(cfg["case_cls"], N, eta)
    errors: List[float] = []
    times: List[float] = []
    dts: List[float] = []
    for k in range(levels):
        dt = tcfg["base_dt"] / 2**k
        t0 = time.perf_counter()
        summary = trial.run_for_errors(Tf=Tf, dt=dt)
        elapsed = time.perf_counter() - t0
        errors.append(summary.overall_combined_error)
        times.append(elapsed)
        dts.append(dt)
        if verbose:
            print(f"  [temporal {study}] dt={dt:.3e} err={errors[-1]:.6e} ({elapsed:.2f}s)")
    rates = calculate_observed_rates(errors) if len(errors) >= 3 else []
    return dict(
        study=study,
        kind="temporal",
        N=N,
        Tf=Tf,
        eta=eta,
        dts=dts,
        errors=errors,
        wallclock_s=times,
        rates=[r for r, _ in rates],
        statuses=[s for _, s in rates],
    )


def run_eta_study(
    study: str,
    *,
    N: int = 32,
    dt: float = 5e-4,
    Tf: float = 0.01,
    etas: Optional[List[float]] = None,
    verbose: bool = True,
) -> dict:
    """Notebook cell 13: regularization-factor sweep at fixed N and dt."""
    cfg = STUDIES[study]
    etas = etas or ETA_LADDER
    errors: List[float] = []
    times: List[float] = []
    for eta in etas:
        trial = _make_trial(cfg["case_cls"], N, eta)
        t0 = time.perf_counter()
        summary = trial.run_for_errors(Tf=Tf, dt=dt)
        elapsed = time.perf_counter() - t0
        errors.append(summary.overall_combined_error)
        times.append(elapsed)
        if verbose:
            print(f"  [eta {study}] eta={eta:7.1f} err={errors[-1]:.6e} ({elapsed:.2f}s)")
    return dict(
        study=study,
        kind="eta",
        N=N,
        dt=dt,
        Tf=Tf,
        etas=list(etas),
        errors=errors,
        wallclock_s=times,
    )
