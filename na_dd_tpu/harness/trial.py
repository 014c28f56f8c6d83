"""MMS trial harness: whole-simulation execution and error summaries.

The reference drives the time loop from Python, calling the integrator and
collecting per-step error norms eagerly (``run_simulation_collect_data``,
reference src/mms_trial_utils.py:56-147).  Here the entire simulation —
``num_steps`` integrator steps *and* the per-step error-norm collection — is a
single ``lax.scan`` inside one jitted XLA program; the host receives only the
(num_steps+1, n_vars) error arrays at the end.  Error semantics (combined
max-integral norm with trapezoidal time integration) match
src/mms_trial_utils.py:15-53 exactly.
"""

from __future__ import annotations

import math
import os
from typing import Dict, List, NamedTuple, Optional, Type

import jax
import jax.numpy as jnp
import numpy as np

from na_dd_tpu.core.state import State
from na_dd_tpu.integrators.pc_trapezoidal import HCsCorrectorPositivityError
from na_dd_tpu.mms.engine import state_from_mms_when
from na_dd_tpu.ops import inner_products, stencils
from na_dd_tpu.ops.grid import Grid
from na_dd_tpu.ops.shifts import LOCAL_OPS, Ops

ALL_VARIABLES = ("cp", "T", "cl", "cd", "cs")
DEFAULT_INTEGRAL_VARS = ("T", "cl", "cd")


class ErrorTimeSeries(NamedTuple):
    """Stacked per-step error records (reference keeps a Python list of
    per-step NamedTuples; we keep device-shaped arrays)."""

    t: np.ndarray  # (K+1,)
    h_norm_sq_errors: Dict[str, np.ndarray]  # var -> (K+1,)
    grad_h_norm_p_sq_errors: Dict[str, np.ndarray]  # var -> (K+1,)


def _error_norms(
    g: Grid, ops: Ops, s: State, exact: State, variable_names, integral_vars,
    tail_grid: Optional[Grid] = None,
):
    """Squared error norms of ``s`` against a (however-obtained) exact state
    — the norm half of :func:`_collect_errors`, reused by the
    precomputed-exact fast path."""
    h_sq = {}
    grad_sq = {}
    for var in variable_names:
        err = getattr(s, var) - getattr(exact, var)
        if tail_grid is not None:
            gt = tail_grid
            e = err.astype(gt.w_H.dtype)
            h_sq[var] = ops.asum((e * e * gt.w_H).astype(err.dtype))
            if var in integral_vars:
                ex, ey = stencils.grad_H(ops, gt, e)
                grad_sq[var] = ops.asum(
                    (ex * ex * gt.w_pk).astype(err.dtype)
                ) + ops.asum((ey * ey * gt.w_hp).astype(err.dtype))
            else:
                grad_sq[var] = jnp.asarray(0.0, dtype=err.dtype)
            continue
        h_sq[var] = inner_products.inner_H(ops, g, err, err)
        if var in integral_vars:
            gx_n, gy_n = stencils.grad_H(ops, g, getattr(s, var))
            gx_e, gy_e = stencils.grad_H(ops, g, getattr(exact, var))
            ex, ey = gx_n - gx_e, gy_n - gy_e
            grad_sq[var] = inner_products.inner_p(ops, g, ex, ey, ex, ey)
        else:
            grad_sq[var] = jnp.asarray(0.0, dtype=err.dtype)
    return h_sq, grad_sq


def _collect_errors(
    g: Grid, ops: Ops, mms_case, s: State, t, variable_names, integral_vars,
    tail_grid: Optional[Grid] = None,
):
    """Per-step squared error norms against the exact MMS solution.

    tail_grid: optional lower-precision Grid (same geometry, every float
    plane downcast).  When given, the norm/gradient TAIL runs at that dtype:
    the error field ``s_var - exact_var`` is still formed in the ambient
    dtype (it is a cancellation of O(1) quantities and MUST be), then
    downcast, and the squared-norm products, gradient stencils and metric
    weights run at the tail dtype with the final reductions accumulated back
    in the ambient dtype.  Error analysis: the downcast perturbs each error
    element by a RELATIVE ~eps(tail), so the squared norms carry ~2·eps
    relative noise, incoherent across the grid (measured on the headline
    level: ~2e-9 relative on the final combined error vs the 1e-8 parity
    gate — studies/mixed_perf_probe.py archives the A/B).  On the TPU
    f64-emulation backend this halves the per-step error-collection traffic
    and removes its emulated-f64 elementwise chains (~42% of the mixed-mode
    step budget measured before this option existed).

    The gradient of the error is computed as grad(err) (one stencil pass on
    the small downcast field) instead of the reference's
    grad(num) - grad(exact) (two stencil passes then a cancelling subtract)
    — linearity makes them analytically identical, and the error-first order
    is the numerically safer one at tail precision.
    """
    exact = state_from_mms_when(mms_case=mms_case, t=t, grid=g)
    return _error_norms(
        g, ops, s, exact, variable_names, integral_vars, tail_grid=tail_grid
    )


def _tail_grid(g: Grid, dtype) -> Grid:
    """Downcast every floating plane of the Grid pytree (geometry unchanged)."""
    return jax.tree_util.tree_map(
        lambda a: a.astype(dtype)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        g,
    )


def _scan_step(integrator, g, ops, s, t, dt):
    """Uniform (state, small-diagnostics) step wrapper for scan bodies."""
    out = integrator.step_fn(g, ops, s, t, dt)
    if isinstance(out, State):  # integrators without diagnostics (e.g. FE)
        return out, {
            "hcs_ok": jnp.asarray(True),
            "krylov_iters": jnp.asarray(0),
            "krylov_resnorm_sq": jnp.asarray(0.0),
            "krylov_converged": jnp.asarray(True),
        }
    s1, diag = out
    small = {
        "hcs_ok": diag.hcs_denominator_ok,
        "krylov_iters": diag.krylov_iters,
        "krylov_resnorm_sq": diag.krylov_resnorm_sq,
        "krylov_converged": diag.krylov_converged,
    }
    return s1, small


def run_simulation_collect_data(
    *,
    grid: Grid,
    integrator,
    exact_sol_pack,
    initial_state: State,
    Tf: float,
    dt: float,
    t0: float = 0.0,
    variable_names: List[str],
    integral_vars: List[str],
    ops: Ops = LOCAL_OPS,
    traced_dt: bool = False,
    pad_steps: Optional[int] = None,
    traced_grid: Optional[bool] = None,
    collect_tail: Optional[str] = None,
    collect_precompute: Optional[bool] = None,
):
    """Run from t0 to Tf collecting per-step error norms.

    Returns (ErrorTimeSeries, dt_adjusted).  dt is adjusted so that
    num_steps * dt == Tf - t0 exactly (reference src/mms_trial_utils.py:76-77).

    traced_dt/pad_steps — the temporal-ladder compile sharing mode.  By
    default dt is baked into the program as a compile-time constant, so every
    ladder level is its own multi-minute XLA compile on the f64-emulation
    backend.  With ``traced_dt=True`` dt enters as a traced **(1,1) array**
    argument (NOT a 0-d scalar: 0-d f64 arithmetic threaded through
    scanned/while programs degrades to ~f32 on that backend — measured both
    here and by studies/axon_while_probe.py; (1,1)-shaped arithmetic stays
    exact) and the scan runs a fixed ``pad_steps >= num_steps`` length — the
    overrun steps integrate past Tf and their rows are discarded host-side —
    so ONE compiled program serves every level of a fixed-grid dt ladder.

    traced_grid — pass the Grid pytree as a traced jit ARGUMENT instead of
    closing over it.  Closed-over grids bake every metric plane into the
    StableHLO module as dense constants: ~16 N²-sized arrays, 136 MB of
    module text at N=1024 f32 and 539 MB at N=2048 (measured), which bloats
    the compilation cache, slows every compile, and overflows this
    environment's remote-compile request limit at N=2048 (HTTP 413).  With
    traced_grid the module stays KB-sized at any N; the arithmetic is
    identical but XLA can no longer constant-fold metric-only expressions,
    so the compiled program SHAPE changes — on the f64-emulation TPU backend
    that shifts the program-shape-dependent noise floor (see CLAUDE.md):
    measured A/B on the chip (pol N=256 f64), traced-grid lands 3.2e-8
    relative from the baked-grid value — far inside the reproduction
    tolerance but outside the strict 1e-8 parity gate, hence default OFF for
    the parity-certified f64 study programs (f64 compile time is dominated
    by the emulation expansion anyway: 111 s either way at N=256).  Default
    from NA_DD_TPU_TRACED_GRID ("1" enables); recommended for large-N f32
    production runs.
    """
    if traced_grid is None:
        traced_grid = os.environ.get("NA_DD_TPU_TRACED_GRID", "0") == "1"
    if collect_tail is None:
        collect_tail = os.environ.get("NA_DD_TPU_COLLECT_TAIL", "") or None
    if collect_tail is not None and collect_tail not in ("f32", "float32"):
        raise ValueError(
            f"collect_tail must be None or 'f32'; got {collect_tail!r}"
        )
    # only meaningful when the ambient dtype is wider than the tail
    if collect_tail and jnp.finfo(jnp.result_type(float)).bits <= 32:
        collect_tail = None
    if collect_precompute is None:
        collect_precompute = os.environ.get("NA_DD_TPU_TIME_TABLES", "") == "1"
    if collect_precompute and (traced_dt or traced_grid):
        # table construction needs concrete times/grid; the compile-sharing
        # ladder modes keep the in-scan evaluation
        collect_precompute = False
    num_steps = math.ceil((Tf - t0) / dt)
    dt_adj = (Tf - t0) / num_steps
    variable_names = tuple(variable_names)
    integral_vars = tuple(integral_vars)
    P = int(pad_steps) if pad_steps is not None else num_steps
    assert P >= num_steps, f"pad_steps={P} < num_steps={num_steps}"
    if collect_precompute:
        # the exact-state AND forcing tables live on device for the whole
        # run: 2 x 5 fields x (P+1) steps; cap well below HBM (v5e: 16 GB)
        itemsize = jnp.dtype(jnp.result_type(float)).itemsize
        est_bytes = 2 * (P + 1) * 5 * int(np.prod(grid.xx.shape)) * itemsize
        budget = int(
            float(os.environ.get("NA_DD_TPU_TIME_TABLES_BUDGET", "4e9"))
        )
        if est_bytes > budget:
            collect_precompute = False

    # Memoize the traced+compiled simulation on the integrator.  In the
    # default (baked) mode the key includes the *values* of t0/dt — they are
    # compile-time constants (which also lets XLA fold every dt-dependent
    # coefficient).  In traced_dt mode the dt value is excluded: one program
    # per (grid, pack, ops, pad_steps) serves the whole ladder.
    cache = getattr(integrator, "_sim_cache", None)
    if cache is None:
        cache = {}
        integrator._sim_cache = cache
    key = (
        id(grid),
        id(exact_sol_pack),
        id(ops),
        P,
        float(t0),
        None if traced_dt else float(dt_adj),
        variable_names,
        integral_vars,
        traced_grid,
        collect_tail,
        collect_precompute,
    )
    entry = cache.get(key)
    if entry is None:

        def collect(g, gt, s, t):
            return _collect_errors(
                g, ops, exact_sol_pack, s, t, variable_names, integral_vars,
                tail_grid=gt,
            )

        # --- time tables (collect_precompute): evaluate the exact MMS state
        # AND the state-independent forcing terms at ALL on-grid times ONCE,
        # eagerly, at program-build time; the steady path then only READS
        # device-resident tables.  Measured on the headline level
        # (studies/mixed_perf_probe.py): the per-step exact evals are ~24 ms
        # and the forcing evals ~32 ms of the 85 ms mixed run, the cost is
        # genuine f64-emulated compute (batching it in-program was neutral),
        # so the only way to win is to stop paying it per run — the manual
        # analogue of the constant folding XLA cannot do through the
        # accuracy barriers and the scan.  Tables enter the program as jit
        # ARGUMENTS (not closure constants: ~100 MB of embedded dense
        # constants would bloat every compile and the persistent cache — the
        # traced-grid lesson above). ---
        aux_args = ()
        integrator_run = integrator
        stacked_forcing = None
        if collect_precompute:
            import copy

            from na_dd_tpu.core.forcing import ForcingFromTimeGrid

            ts_all = t0 + dt_adj * jnp.arange(
                P + 1, dtype=jnp.result_type(float)
            )
            exact_stack = jax.jit(
                jax.vmap(
                    lambda tt: state_from_mms_when(
                        mms_case=exact_sol_pack, t=tt, grid=grid
                    )
                )
            )(ts_all)
            field = integrator.semi_discrete_field
            stacked_forcing = ForcingFromTimeGrid(
                field.forcing, t0=t0, dt=dt_adj, num=P
            )
            f_tables = stacked_forcing.build_tables(grid, ops)
            field_run = copy.copy(field)
            field_run.forcing = stacked_forcing
            integrator_run = copy.copy(integrator)
            integrator_run.semi_discrete_field = field_run
            aux_args = (exact_stack, f_tables)

        def simulate_impl_g(g, s0, dt_run, exact_stack=None):
            # built OUTSIDE the scan so the downcast of the metric planes is
            # loop-invariant (baked mode constant-folds it entirely)
            gt = _tail_grid(g, jnp.float32) if collect_tail else None

            def body(carry, x):
                s = carry
                if exact_stack is not None:
                    k, exact_k = x
                else:
                    k, exact_k = x, None
                t_k = t0 + k * dt_run
                s1, small = _scan_step(integrator_run, g, ops, s, t_k, dt_run)
                if exact_k is not None:
                    h_sq, grad_sq = _error_norms(
                        g, ops, s1, exact_k, variable_names, integral_vars,
                        tail_grid=gt,
                    )
                else:
                    h_sq, grad_sq = collect(g, gt, s1, t_k + dt_run)
                return s1, (h_sq, grad_sq, small)

            ks = jnp.arange(P, dtype=jnp.result_type(float))
            if exact_stack is not None:
                exact0 = jax.tree_util.tree_map(lambda a: a[0], exact_stack)
                exact_xs = jax.tree_util.tree_map(lambda a: a[1:], exact_stack)
                h0, g0 = _error_norms(
                    g, ops, s0, exact0, variable_names, integral_vars,
                    tail_grid=gt,
                )
                xs = (ks, exact_xs)
            else:
                h0, g0 = collect(g, gt, s0, t0)
                xs = ks
            _s_final, (h_sq, grad_sq, small) = jax.lax.scan(body, s0, xs)
            # Pack all outputs into THREE device buffers: through a tunneled
            # backend every fetched buffer costs a host<->device round-trip,
            # and the unpacked form (10 series + 10 scalars + diagnostics)
            # dominated steady wall-clock (~0.5 s floor, N-independent).
            ftype = h0[variable_names[0]].dtype
            h_mat = jnp.concatenate(
                [
                    jnp.stack([h0[v] for v in variable_names])[:, None],
                    jnp.stack([h_sq[v] for v in variable_names]),
                ],
                axis=1,
            )
            g_mat = jnp.concatenate(
                [
                    jnp.stack([g0[v] for v in variable_names])[:, None],
                    jnp.stack([grad_sq[v] for v in variable_names]),
                ],
                axis=1,
            )
            small_mat = jnp.stack(
                [
                    small["hcs_ok"].astype(ftype),
                    small["krylov_converged"].astype(ftype),
                    small["krylov_resnorm_sq"].astype(ftype),
                ]
            )
            return h_mat, g_mat, small_mat

        # The wrappers keep the historical function NAMES of the
        # non-traced-grid modes (the name feeds the XLA module name and hence
        # the persistent compilation-cache key); the traced-grid modes get
        # their own names so the cache distinguishes them.
        if traced_dt and traced_grid:

            def simulate_impl_tg(g, s0, dt_run):
                return simulate_impl_g(g, s0, dt_run)

            simulate = jax.jit(simulate_impl_tg)
        elif traced_dt:

            def simulate_impl(s0, dt_run):
                return simulate_impl_g(grid, s0, dt_run)

            simulate = jax.jit(simulate_impl)
        elif traced_grid:

            def simulate_tg(g, s0):
                return simulate_impl_g(g, s0, dt_adj)

            simulate = jax.jit(simulate_tg)
        elif collect_precompute:

            def simulate_tables(s0, exact_stack, f_tables):
                # bind() runs at trace time, threading the traced tables
                # into the stack-backed forcing the integrator copy holds
                stacked_forcing.bind(f_tables)
                return simulate_impl_g(
                    grid, s0, dt_adj, exact_stack=exact_stack
                )

            simulate = jax.jit(simulate_tables)
        else:

            def simulate(s0):
                return simulate_impl_g(grid, s0, dt_adj)

            simulate = jax.jit(simulate)

        entry = (simulate, aux_args)
        cache[key] = entry

    simulate, aux_args = entry
    g_args = (grid,) if traced_grid else ()
    if traced_dt:
        dt_arr = jnp.full((1, 1), dt_adj, dtype=jnp.result_type(float))
        out = simulate(*g_args, initial_state, dt_arr)
    else:
        out = simulate(*g_args, initial_state, *aux_args)
    h_mat, g_mat, small_mat = jax.device_get(out)
    # discard the padded overrun rows (they integrated past Tf)
    h_mat = h_mat[:, : num_steps + 1]
    g_mat = g_mat[:, : num_steps + 1]
    small_mat = small_mat[:, :num_steps]

    hcs_ok, converged, resnorm_sq = small_mat
    if not bool(np.all(hcs_ok > 0.5)):
        raise HCsCorrectorPositivityError(
            "Denominator 2 - dt Kd (Sd - Cd1) (1 + Cl1) below positiveness threshold."
        )
    n_unconverged = int(np.sum(converged < 0.5))
    if n_unconverged:
        import warnings

        warnings.warn(
            f"{n_unconverged}/{num_steps} steps had a Krylov solve that missed "
            f"its tolerance (worst resnorm_sq {float(np.max(resnorm_sq)):.3e}); "
            "increase krylov_unroll/krylov_maxiter (or mixed_refine in "
            "precision='mixed'; with linear_solver='direct' the residual is "
            "already at its attainable f64 floor — loosen krylov_tol).",
            stacklevel=2,
        )

    ts = t0 + dt_adj * np.arange(num_steps + 1)
    series = ErrorTimeSeries(
        t=ts,
        h_norm_sq_errors={
            v: h_mat[i] for i, v in enumerate(variable_names)
        },
        grad_h_norm_p_sq_errors={
            v: g_mat[i] for i, v in enumerate(variable_names)
        },
    )
    return series, dt_adj


def calculate_combined_error_norm(
    series: ErrorTimeSeries,
    dt: float,
    integral_vars: List[str],
    all_variables: Optional[List[str]] = None,
) -> float:
    """Combined max-integral error norm
    (reference src/mms_trial_utils.py:15-53):

        max_k sqrt( Σ_v ||e_v(t_k)||_H² + ∫₀^{t_k} Σ_{v∈integral} ||∇e_v||_p² dτ )

    with trapezoidal time integration of the gradient terms.
    """
    if all_variables is not None:
        assert all(v in all_variables for v in integral_vars), (
            "integral_vars must be a subset of all_variables."
        )
        h_vars = list(all_variables)
    else:
        h_vars = list(series.h_norm_sq_errors.keys())

    integrand = sum(
        np.asarray(series.grad_h_norm_p_sq_errors[v]) for v in integral_vars
    ) if integral_vars else np.zeros_like(series.t)
    spatial = sum(np.asarray(series.h_norm_sq_errors[v]) for v in h_vars)

    running = np.concatenate(
        [[0.0], np.cumsum(0.5 * dt * (integrand[:-1] + integrand[1:]))]
    )
    return float(np.sqrt(np.max(spatial + running)))


class NumericalErrorSummary:
    """Overall + per-variable combined error norms
    (reference src/mms_trial_utils.py:150-198)."""

    def __init__(
        self,
        dt_used: float,
        time_series_data: ErrorTimeSeries,
        variable_names: List[str],
        integral_vars: List[str],
    ):
        self.dt_used = dt_used
        self.variable_names = list(variable_names)
        self.integral_vars = list(integral_vars)

        self.overall_combined_error: float = calculate_combined_error_norm(
            time_series_data, dt_used, self.integral_vars
        )
        self.per_variable_sup_errors: Dict[str, float] = {}
        for var in self.variable_names:
            ivars = [var] if var in self.integral_vars else []
            self.per_variable_sup_errors[var] = calculate_combined_error_norm(
                time_series_data, dt_used, integral_vars=ivars, all_variables=[var]
            )

    def __repr__(self):
        per_var = {k: f"{v:.4e}" for k, v in self.per_variable_sup_errors.items()}
        return (
            f"NumericalErrorSummary(dt={self.dt_used:.2e}, "
            f"OverallCombinedError={self.overall_combined_error:.4e}, "
            f"PerVariableSupErrors={per_var})"
        )


class MMSTrial:
    """One-call assembly of grid + model + MMS case + forcing + field +
    integrator (reference ``MMSTrial``, src/mms_trial_utils.py:201-280)."""

    def __init__(
        self,
        grid: Grid,
        model,
        mms_case_cls: Type,
        field_cls: Type,
        forcing_terms_cls: Type,
        integrator_cls: Type,
        mms_case_params: Optional[Dict] = None,
        integrator_params: Optional[Dict] = None,
        forcing_terms_params: Optional[Dict] = None,
        field_params: Optional[Dict] = None,
        variable_names: Optional[List[str]] = None,
        integral_vars: Optional[List[str]] = None,
        ops: Ops = LOCAL_OPS,
    ):
        self.grid = grid
        self.model = model
        self.ops = ops
        self.variable_names = list(variable_names or ALL_VARIABLES)
        self.integral_vars = list(integral_vars or DEFAULT_INTEGRAL_VARS)

        self.mms_case = mms_case_cls(grid=grid, model=model, **(mms_case_params or {}))
        self.forcing_terms = forcing_terms_cls(
            mms_case=self.mms_case, model=model, **(forcing_terms_params or {})
        )
        self.field = field_cls(
            grid=grid, model=model, forcing=self.forcing_terms, **(field_params or {})
        )
        self.integrator = integrator_cls(
            semi_discrete_field=self.field, **(integrator_params or {})
        )
        self.initial_state = state_from_mms_when(mms_case=self.mms_case, t=0.0, grid=grid)

    def run_for_errors(
        self,
        Tf: float,
        dt: float,
        t0: float = 0.0,
        *,
        traced_dt: bool = False,
        pad_steps: Optional[int] = None,
        traced_grid: Optional[bool] = None,
        collect_tail: Optional[str] = None,
        collect_precompute: Optional[bool] = None,
    ) -> NumericalErrorSummary:
        series, dt_adj = run_simulation_collect_data(
            grid=self.grid,
            integrator=self.integrator,
            exact_sol_pack=self.mms_case,
            initial_state=self.initial_state,
            Tf=Tf,
            dt=dt,
            t0=t0,
            variable_names=self.variable_names,
            integral_vars=self.integral_vars,
            ops=self.ops,
            traced_dt=traced_dt,
            pad_steps=pad_steps,
            traced_grid=traced_grid,
            collect_tail=collect_tail,
            collect_precompute=collect_precompute,
        )
        return NumericalErrorSummary(
            dt_used=dt_adj,
            time_series_data=series,
            variable_names=self.variable_names,
            integral_vars=self.integral_vars,
        )
