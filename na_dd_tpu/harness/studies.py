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


def choose_krylov_unroll(
    N: int,
    dt: float,
    mc: ModelConsts = STUDY_MODEL_CONSTS,
    *,
    num_steps: int | None = None,
):
    """Pick the unrolled-BiCGStab iteration budget from the stiffness number
    s = 4 dt D_max / h² of the trapezoidal Jacobian J = 2I - dt·L.

    The studies always use the *unrolled* solver: besides being far faster per
    step on TPU (no while_loop latency), it is the only numerically safe
    choice there — loop-carried 0-d scalars inside lax.while_loop bodies are
    computed at ~f32 precision by the TPU f64-emulation backend (measured:
    1.6e-7 absolute study-error corruption with the while solver vs 1.5e-11
    with the unrolled one).  The early-exit masking makes any sufficient
    budget exact; stiffer ladders get bigger budgets.  ``num_steps`` is
    accepted for API stability but no longer selects the while solver.
    """
    del num_steps  # retained for call-site compatibility
    h = 1.0 / N
    d_max = max(mc.DT, mc.Dl_max, mc.Dd_max)
    s = 4.0 * dt * d_max / (h * h)
    if s <= 1.0:
        return 16
    if s <= 8.0:
        return 32
    if s <= 64.0:
        return 48
    # very stiff (coarse-dt temporal levels, e.g. peaks dt=1 at N=200 has
    # s=160): Jacobi-BiCGStab needs ~sqrt(s) iterations to reach 1e-13, so
    # grow the budget with sqrt(s) but cap it — compile cost is ~linear in
    # the budget and the harness warns if any solve misses tolerance.
    if s <= 256.0:
        return 96
    return 160


def _make_trial(
    case_cls, N: int, eta: float, *, track_residuals=False, krylov_unroll=16
) -> MMSTrial:
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
        integrator_params=dict(
            regularization_factor=eta,
            track_residuals=track_residuals,
            krylov_unroll=krylov_unroll,
        ),
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
    import math

    for k in range(levels):
        N = base_N * 2**k
        dt = (1.0 / N) ** 1.5
        nsteps = math.ceil(Tf / dt)
        trial = _make_trial(
            cfg["case_cls"], N, eta,
            krylov_unroll=choose_krylov_unroll(N, dt, num_steps=nsteps),
        )
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
    # the coarsest dt level is the stiffest; one budget serves the ladder,
    # sized for the finest level's step count (where runtime dominates)
    import math

    finest_steps = math.ceil(Tf / (tcfg["base_dt"] / 2 ** (levels - 1)))
    trial = _make_trial(
        cfg["case_cls"], N, eta,
        krylov_unroll=choose_krylov_unroll(N, tcfg["base_dt"], num_steps=finest_steps),
    )
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


def run_eta_study_batched(
    study: str,
    *,
    N: int = 32,
    dt: float = 5e-4,
    Tf: float = 0.01,
    etas: Optional[List[float]] = None,
    verbose: bool = True,
) -> dict:
    """TPU-native regularization sweep: all eta values integrate **in one
    vmapped XLA program** (the reference loops them serially,
    notebook cell 13).  Exactness: the unrolled BiCGStab and the unrolled
    pointwise cs-Newton use pure where-masked early exits, so vmap batching is
    bit-identical to the serial runs.
    """
    import math

    import jax
    import jax.numpy as jnp

    from na_dd_tpu.core import FieldRegHCsTriple as _Field
    from na_dd_tpu.core import MMSForcingRegHCsTriple as _Forcing
    from na_dd_tpu.harness.trial import (
        ALL_VARIABLES,
        DEFAULT_INTEGRAL_VARS,
        ErrorTimeSeries,
        NumericalErrorSummary,
        _collect_errors,
    )
    from na_dd_tpu.mms import state_from_mms_when
    from na_dd_tpu.ops.shifts import LOCAL_OPS

    cfg = STUDIES[study]
    etas = etas or ETA_LADDER
    grid = make_uniform_grid(N, N)
    model = Model02(STUDY_MODEL_CONSTS)
    case = cfg["case_cls"](grid=grid, model=model)
    s0 = state_from_mms_when(mms_case=case, t=0.0, grid=grid)
    num_steps = math.ceil(Tf / dt)
    dt_adj = Tf / num_steps
    unroll = choose_krylov_unroll(N, dt_adj)

    def simulate_one(eta):
        forcing = _Forcing(mms_case=case, model=model, regularization_factor=eta)
        field = _Field(grid=grid, model=model, forcing=forcing, regularization_factor=eta)
        integ = PCTrapezoidalRegHCsTriple(
            field,
            regularization_factor=eta,
            track_residuals=False,
            krylov_unroll=unroll,
        )

        def body(s, k):
            t_k = k * dt_adj
            s1, _diag = integ.step_fn(grid, LOCAL_OPS, s, t_k, dt_adj)
            h_sq, grad_sq = _collect_errors(
                grid, LOCAL_OPS, case, s1, t_k + dt_adj, ALL_VARIABLES, DEFAULT_INTEGRAL_VARS
            )
            return s1, (h_sq, grad_sq)

        h0, g0 = _collect_errors(
            grid, LOCAL_OPS, case, s0, 0.0, ALL_VARIABLES, DEFAULT_INTEGRAL_VARS
        )
        ks = jnp.arange(num_steps, dtype=jnp.result_type(float))
        _s_final, (h_sq, grad_sq) = jax.lax.scan(body, s0, ks)
        return h0, g0, h_sq, grad_sq

    t0 = time.perf_counter()
    h0, g0, h_sq, grad_sq = jax.jit(jax.vmap(simulate_one))(
        jnp.asarray(etas, dtype=jnp.result_type(float))
    )
    jax.block_until_ready(h_sq)
    elapsed = time.perf_counter() - t0

    import numpy as np

    errors = []
    for i, eta in enumerate(etas):
        series = ErrorTimeSeries(
            t=dt_adj * np.arange(num_steps + 1),
            h_norm_sq_errors={
                v: np.concatenate([[float(h0[v][i])], np.asarray(h_sq[v][i])])
                for v in ALL_VARIABLES
            },
            grad_h_norm_p_sq_errors={
                v: np.concatenate([[float(g0[v][i])], np.asarray(grad_sq[v][i])])
                for v in ALL_VARIABLES
            },
        )
        summ = NumericalErrorSummary(dt_adj, series, list(ALL_VARIABLES), list(DEFAULT_INTEGRAL_VARS))
        errors.append(summ.overall_combined_error)
        if verbose:
            print(f"  [eta-batched {study}] eta={eta:7.1f} err={errors[-1]:.6e}")
    if verbose:
        print(f"  [eta-batched {study}] total wall-clock {elapsed:.2f}s for {len(etas)} runs")
    return dict(
        study=study,
        kind="eta_batched",
        N=N,
        dt=dt_adj,
        Tf=Tf,
        etas=list(etas),
        errors=errors,
        wallclock_s=[elapsed],
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
    import math

    nsteps = math.ceil(Tf / dt)
    for eta in etas:
        trial = _make_trial(
            cfg["case_cls"], N, eta,
            krylov_unroll=choose_krylov_unroll(N, dt, num_steps=nsteps),
        )
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
