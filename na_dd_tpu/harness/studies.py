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

import math
import time
from typing import Dict, List, Optional

from na_dd_tpu.core import FieldRegHCsTriple, MMSForcingRegHCsTriple
from na_dd_tpu.harness.rates import calculate_observed_rates
from na_dd_tpu.harness.trial import MMSTrial
from na_dd_tpu.integrators import PCTrapezoidalRegHCsTriple
from na_dd_tpu.mms import cases as mms_cases
from na_dd_tpu.models import Model02, ModelConsts
from na_dd_tpu.ops import make_uniform_grid

# Study constants — notebook cell 3.  Four notebooks (expsin + the three
# NonFullySmoothPol regularity studies) share these values; the pol and peaks
# notebooks override Dl_max=8.01e-4 and Dd_max=2.46e-6 (see POL_PEAKS_CONSTS).
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

# The MMSCasePol and SlowlyChangingPeaks notebooks use larger diffusion
# maxima (their cell 3 differs from the other four only in these two fields).
POL_PEAKS_CONSTS = STUDY_MODEL_CONSTS._replace(Dl_max=8.01e-4, Dd_max=2.46e-6)

DEFAULT_ETA = 50.0
ETA_LADDER = [10.0, 50.0, 100.0, 200.0, 300.0, 500.0, 1000.0]


def _peaks_temporal_N(dt: float) -> int:
    """The peaks temporal study scales the grid with dt: h = 2·dt, i.e.
    N = ceil(1/(2·dt)) — the notebook's FIXED_GRID_SIZE=200 is dead code
    (its cell 11 recomputes the grid inside the dt loop).  The reference
    Grid accepts the degenerate N=1 (a 2×2 all-boundary grid: every node is
    pinned to 0 and the exact solution vanishes on the boundary, so every
    error norm is identically 0.0 — the 0.0 entries in the saved outputs);
    ours requires an interior point, so run_temporal_study emits that exact
    0.0 analytically for N < 2 instead of simulating."""

    return math.ceil(1.0 / (2.0 * dt))


# Registry of the six studies: MMS case class + protocol parameters taken
# from the corresponding notebook's cells 3/9/11.
STUDIES: Dict[str, dict] = {
    "pol": dict(
        case_cls=mms_cases.MMSCasePol,
        consts=POL_PEAKS_CONSTS,
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
        consts=POL_PEAKS_CONSTS,
        spatial_Tf=1.0,
        temporal=dict(N_of_dt=_peaks_temporal_N, base_dt=1.0, levels=9, Tf=10.0),
        # Measured (TPU, 2026-08): at the generic tier-8 budget the peaks
        # SPATIAL ladder deviates up to 56% at N=256 with all solves
        # reporting converged (CPU x64 at the same budget is exact to 5e-8,
        # and budget 16 is exact on TPU too — studies/peaks_budget_bisect.py,
        # N=128: unroll8/analytic 2.2e-2, unroll16/analytic 5.7e-8).  The
        # violently-moving-Gaussian case needs more slack against the
        # program-shape-dependent f64-emulation rounding than the smooth ones.
        # Further localized (studies/mixed_peaks_probe.py, TPU 2026-08-17):
        # precision="mixed" — every Krylov iteration in NATIVE f32, no f64
        # emulation in the solver loop — reproduces the full-f64 tier-8
        # value to 9.5e-12 INCLUDING its 2.2e-2 drift, so the drift is NOT
        # Krylov arithmetic: it enters through the emulated-f64
        # transcendental forcing under scan fusion (consistent with the
        # framework-free repro, studies/scan_fusion_synthetic_repro.py).
        # The pin therefore applies to every precision mode.
        min_krylov_unroll=16,
    ),
}


def study_consts(study: str) -> ModelConsts:
    """The ModelConsts the given study's notebook uses."""
    return STUDIES[study].get("consts", STUDY_MODEL_CONSTS)


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
    if s <= 0.25:
        # measured worst-case demand at the tier boundary is 4 total
        # BiCGStab iterations per step across the 3 solves (>= 4x margin);
        # every spatial ladder and eta sweep in BASELINE.md lands here
        return 8
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


def _study_unroll(cfg: dict, N: int, dt: float, mc: ModelConsts, num_steps=None) -> int:
    """Per-study unrolled-Krylov budget: the generic stiffness tier, floored
    by the study's measured ``min_krylov_unroll`` (see the peaks registry
    entry for the measurement that motivates the floor)."""
    return max(
        choose_krylov_unroll(N, dt, mc, num_steps=num_steps),
        cfg.get("min_krylov_unroll", 0),
    )


def _make_trial(
    case_cls,
    N: int,
    eta: float,
    *,
    track_residuals=False,
    krylov_unroll=16,
    mc: ModelConsts = STUDY_MODEL_CONSTS,
    **integrator_kwargs,
) -> MMSTrial:
    grid = make_uniform_grid(N, N)
    model = Model02(mc)
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
            **integrator_kwargs,
        ),
    )


def run_spatial_study(
    study: str,
    *,
    levels: int = 8,
    base_N: int = 2,
    eta: float = DEFAULT_ETA,
    verbose: bool = True,
    measure_steady: bool = False,
    parallel_compile: bool = False,
) -> dict:
    """Notebook cell 9: N = base_N·2^k ladder with dt = h^1.5.

    measure_steady: re-run each level once more after the timed run; the
    second execution hits the in-process jit cache, so its wall-clock is the
    steady (compile-free) per-level time reported as ``steady_s``.

    parallel_compile: dispatch every level's first run from a thread pool
    BEFORE the serial measurement loop — the backend compiles different
    programs concurrently (measured on the axon TPU: two fresh study
    programs compile together in the time of one), so a cold ladder costs
    ~the slowest single compile instead of the sum of all eight.  The serial
    loop then re-runs each level warm, so per-level wallclock/steady stay
    honest.  Numerics are unaffected (each level is its own XLA program;
    device execution serializes regardless of dispatch order).  The prepass
    wall-clock is reported as ``parallel_compile_s``.
    """
    cfg = STUDIES[study]
    mc = study_consts(study)
    Tf = cfg["spatial_Tf"]
    errors: List[float] = []
    times: List[float] = []
    steady: List[float] = []
    Ns: List[int] = []

    ladder = []
    for k in range(levels):
        N = base_N * 2**k
        dt = (1.0 / N) ** 1.5
        nsteps = math.ceil(Tf / dt)
        trial = _make_trial(
            cfg["case_cls"], N, eta, mc=mc,
            krylov_unroll=_study_unroll(cfg, N, dt, mc, num_steps=nsteps),
        )
        ladder.append((N, dt, trial))

    parallel_compile_s = None
    if parallel_compile:
        import concurrent.futures as cf

        t0 = time.perf_counter()
        with cf.ThreadPoolExecutor(max_workers=len(ladder)) as ex:
            futs = [
                ex.submit(trial.run_for_errors, Tf=Tf, dt=dt)
                for _N, dt, trial in ladder
            ]
            for f in futs:
                f.result()  # surface any exception
        parallel_compile_s = time.perf_counter() - t0
        if verbose:
            print(
                f"  [spatial {study}] parallel compile+first-run of "
                f"{len(ladder)} levels in {parallel_compile_s:.1f}s",
                flush=True,
            )

    for N, dt, trial in ladder:
        t0 = time.perf_counter()
        summary = trial.run_for_errors(Tf=Tf, dt=dt)
        elapsed = time.perf_counter() - t0
        if measure_steady:
            t0 = time.perf_counter()
            trial.run_for_errors(Tf=Tf, dt=dt)
            steady.append(time.perf_counter() - t0)
        errors.append(summary.overall_combined_error)
        times.append(elapsed)
        Ns.append(N)
        if verbose:
            extra = f" steady={steady[-1]:.2f}s" if measure_steady else ""
            print(f"  [spatial {study}] N={N:4d} dt={dt:.3e} err={errors[-1]:.6e} ({elapsed:.2f}s{extra})")
    rates = calculate_observed_rates(errors) if len(errors) >= 3 else []
    return dict(
        study=study,
        kind="spatial",
        Ns=Ns,
        Tf=Tf,
        eta=eta,
        errors=errors,
        wallclock_s=times,
        steady_s=steady or None,
        parallel_compile_s=parallel_compile_s,
        rates=[r for r, _ in rates],
        statuses=[s for _, s in rates],
    )


def run_temporal_study(
    study: str,
    *,
    levels: Optional[int] = None,
    eta: float = DEFAULT_ETA,
    verbose: bool = True,
    measure_steady: bool = False,
    shared_compile: bool = False,
) -> dict:
    """Notebook cell 11: dt = base_dt / 2^k ladder.

    The grid is fixed (``N``) for five studies; the peaks study recomputes
    it per level from dt (``N_of_dt`` — see :func:`_peaks_temporal_N`).

    shared_compile=False (default): each level bakes its dt as a program
    constant — one multi-minute XLA compile per level on the f64-emulation
    backend, with every dt-dependent coefficient folded.
    shared_compile=True: dt enters as a traced (1,1) argument and the scan is
    padded to the finest level's step count, so every same-N level of the
    ladder reuses ONE compiled program (see trial.run_simulation_collect_data
    traced_dt); the Krylov budget is unified to the ladder's max so budgets
    don't split the program cache (the unrolled solver's masked early exit
    makes a larger budget bit-identical, just costlier to compile once).
    """
    cfg = STUDIES[study]
    mc = study_consts(study)
    tcfg = cfg["temporal"]
    levels = levels or tcfg["levels"]
    Tf = tcfg["Tf"]
    N_of_dt = tcfg.get("N_of_dt")

    ladder = []
    for k in range(levels):
        dt = tcfg["base_dt"] / 2**k
        N = N_of_dt(dt) if N_of_dt is not None else tcfg["N"]
        ladder.append((dt, N))

    # shared-compile mode: one budget + one padded step count per grid size
    max_budget: Dict[int, int] = {}
    max_pad: Dict[int, int] = {}
    if shared_compile:
        for dt, N in ladder:
            if N < 2:
                continue
            nsteps = math.ceil(Tf / dt)
            max_budget[N] = max(max_budget.get(N, 0), _study_unroll(cfg, N, dt, mc))
            max_pad[N] = max(max_pad.get(N, 0), nsteps)

    errors: List[float] = []
    times: List[float] = []
    steady: List[float] = []
    dts: List[float] = []
    Ns: List[int] = []
    trials: Dict[tuple, MMSTrial] = {}  # keyed on (N, budget); ladders share
    for dt, N in ladder:
        dts.append(dt)
        Ns.append(N)
        if N < 2:
            # Degenerate all-boundary grid: every node pinned at 0 and the
            # exact solution vanishes there, so the combined error is
            # identically zero (reproduces the reference's saved 0.0 levels).
            errors.append(0.0)
            times.append(0.0)
            if measure_steady:
                steady.append(0.0)
            if verbose:
                print(f"  [temporal {study}] dt={dt:.3e} N={N} err=0 (degenerate all-boundary grid)")
            continue
        unroll = max_budget[N] if shared_compile else _study_unroll(cfg, N, dt, mc)
        run_kwargs = (
            dict(traced_dt=True, pad_steps=max_pad[N]) if shared_compile else {}
        )
        trial = trials.get((N, unroll))
        if trial is None:
            trial = trials[(N, unroll)] = _make_trial(
                cfg["case_cls"], N, eta, mc=mc, krylov_unroll=unroll
            )
        t0 = time.perf_counter()
        summary = trial.run_for_errors(Tf=Tf, dt=dt, **run_kwargs)
        elapsed = time.perf_counter() - t0
        if measure_steady:
            t0 = time.perf_counter()
            trial.run_for_errors(Tf=Tf, dt=dt, **run_kwargs)
            steady.append(time.perf_counter() - t0)
        errors.append(summary.overall_combined_error)
        times.append(elapsed)
        if verbose:
            extra = f" steady={steady[-1]:.2f}s" if measure_steady else ""
            print(f"  [temporal {study}] dt={dt:.3e} N={N} err={errors[-1]:.6e} ({elapsed:.2f}s{extra})")
    rates = calculate_observed_rates(errors) if len(errors) >= 3 else []
    return dict(
        study=study,
        kind="temporal",
        N=Ns[-1] if N_of_dt is not None else tcfg["N"],
        Ns=Ns,
        Tf=Tf,
        eta=eta,
        dts=dts,
        errors=errors,
        wallclock_s=times,
        steady_s=steady or None,
        # In shared_compile mode each same-N level executes the PADDED
        # (ladder-max) step count, so per-level wallclock/steady measure the
        # shared program, not the level's own step count — flagged here so
        # archived timings are interpretable.
        shared_compile=shared_compile,
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
    mc = study_consts(study)
    etas = etas or ETA_LADDER
    grid = make_uniform_grid(N, N)
    model = Model02(mc)
    case = cfg["case_cls"](grid=grid, model=model)
    s0 = state_from_mms_when(mms_case=case, t=0.0, grid=grid)
    num_steps = math.ceil(Tf / dt)
    dt_adj = Tf / num_steps
    unroll = _study_unroll(cfg, N, dt_adj, mc)

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

    run = jax.jit(jax.vmap(simulate_one))
    etas_arr = jnp.asarray(etas, dtype=jnp.result_type(float))
    t0 = time.perf_counter()
    h0, g0, h_sq, grad_sq = run(etas_arr)
    jax.block_until_ready(h_sq)
    elapsed = time.perf_counter() - t0
    # second call hits the in-process jit cache: compile-free steady time
    t0 = time.perf_counter()
    jax.block_until_ready(run(etas_arr))
    steady = time.perf_counter() - t0

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
        steady_s=[steady],
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
    mc = study_consts(study)
    etas = etas or ETA_LADDER
    errors: List[float] = []
    times: List[float] = []

    nsteps = math.ceil(Tf / dt)
    for eta in etas:
        trial = _make_trial(
            cfg["case_cls"], N, eta, mc=mc,
            krylov_unroll=_study_unroll(cfg, N, dt, mc, num_steps=nsteps),
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
