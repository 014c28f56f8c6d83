"""Batched spatial ladders: pad-to-max + vmap, ONE XLA compile per ladder.

The reference runs its spatial convergence ladder (notebook cell 9: N = 2·2^k,
dt = h^1.5) as a serial Python loop — eight separate programs.  Per-level jit
does the same here, and on the f64-emulation TPU backend the eight cold
compiles dominate a cold ladder (~677 s measured with the thread-pool prepass,
see ROADMAP.md).  This module instead runs the WHOLE ladder as one vmapped XLA
program:

* every level's grid/state is **padded to the finest level's shape** with
  zero-filled dead nodes.  The grid design makes zero padding inert: the
  0-sentinel reciprocal metrics, masked inner-product weights and the
  interior mask are all zero at dead nodes, so dead nodes contribute exactly
  0 to every stencil, reduction and error norm (see
  :func:`pad_grid`'s invariants);
* per-level ``dt`` enters as a vmapped traced scalar and the time scan runs
  the ladder-max step count — coarse levels integrate past Tf and the
  overrun rows are discarded host-side (same padding scheme as the
  temporal-ladder ``traced_dt`` mode, harness/trial.py);
* the Krylov budget is unified to the ladder max (the masked early exit
  makes a larger budget bit-identical, just bigger to compile);
* the solver body defaults to the SCANNED BiCGStab
  (:func:`na_dd_tpu.ops.linsolve.bicgstab_scanned`): under ``vmap`` the
  fully-unrolled solver's XLA compile blows up super-linearly (measured on
  the axon TPU: the 8-level pol ladder with the unrolled budget-8 body did
  NOT finish compiling in 25 min, while the scanned body compiled + ran in
  360 s), and the scanned iteration is measured-exact on TPU.

Result (measured, axon TPU, 2026-08-17): the cold 8-level pol spatial
ladder = ONE XLA program, **359.8 s compile+run, 1.00 s steady**, every
level matching the reference value to <= 1.9e-6 relative (finest level
4.382843e-9 = the reference's 4.38284e-9), observed rate 1.993 — vs 677 s
for the round-2 thread-pool per-level prepass
(studies/results/pol_spatial_batched_1786959865.json).  Numerics: identical
algorithm per level; the only deviations from the per-level programs are
summation-order rounding in the global dot products (padded zeros change
the reduction tree) — tests/test_batched_ladder.py asserts per-level
agreement on CPU.
"""

from __future__ import annotations

import dataclasses
import math
import time
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from na_dd_tpu.harness.rates import calculate_observed_rates
from na_dd_tpu.harness.trial import (
    ALL_VARIABLES,
    DEFAULT_INTEGRAL_VARS,
    ErrorTimeSeries,
    NumericalErrorSummary,
    _collect_errors,
)
from na_dd_tpu.mms.engine import state_from_mms_when
from na_dd_tpu.ops.grid import Grid, make_uniform_grid
from na_dd_tpu.ops.shifts import LOCAL_OPS


def pad_grid(g: Grid, N_max: int, M_max: int) -> Grid:
    """Zero-pad every grid plane to (N_max+1, M_max+1); recompute the parity/
    coloring planes on the padded index space.

    Dead-node invariants that make zero padding inert:

    * ``interior_mask``, ``mask_x1/y1`` and all weight planes (``w_H``,
      ``w_pk``, ``w_hp``) are 0 at dead nodes → dead nodes contribute 0 to
      every reduction and every Newton-plane coefficient;
    * reciprocal metrics (``inv_hh`` …) are 0 at dead nodes → stencil
      differences across the real/dead seam vanish exactly (same mechanism
      as the real boundary rows);
    * coordinates pad with 0, so forcing/exact-solution evaluations at dead
      nodes hit the x=0/y=0 boundary trace — finite, and multiplied by zero
      weights/masks everywhere they could matter.

    ``red_mask``/``color5`` are recomputed from the padded (i, j) so the
    5-color probing property holds across the whole padded array.
    """
    shape = (N_max + 1, M_max + 1)

    def pad(a):
        return jnp.pad(
            jnp.asarray(a),
            ((0, shape[0] - a.shape[0]), (0, shape[1] - a.shape[1])),
        )

    ii, jj = np.meshgrid(np.arange(shape[0]), np.arange(shape[1]), indexing="ij")
    dtype = g.xx.dtype
    changes = {
        f.name: pad(getattr(g, f.name))
        for f in dataclasses.fields(g)
        if f.name not in ("N", "M", "red_mask", "color5")
    }
    changes["red_mask"] = jnp.asarray(((ii + jj) % 2 == 0), dtype=dtype)
    changes["color5"] = jnp.asarray((ii + 2 * jj) % 5, dtype=g.color5.dtype)
    return dataclasses.replace(g, N=N_max, M=M_max, **changes)


def pad_state(s, N_max: int, M_max: int):
    """Zero-pad every state field to the padded grid shape."""
    shape = (N_max + 1, M_max + 1)

    def pad(a):
        return jnp.pad(
            jnp.asarray(a),
            ((0, shape[0] - a.shape[0]), (0, shape[1] - a.shape[1])),
        )

    return jax.tree.map(pad, s)


def run_spatial_ladder_batched(
    study: str,
    *,
    levels: int = 8,
    base_N: int = 2,
    eta: float = 50.0,
    verbose: bool = True,
    measure_steady: bool = False,
    krylov_scanned: bool = True,
) -> dict:
    """Notebook cell 9's ladder as ONE vmapped XLA program.

    Same protocol as :func:`na_dd_tpu.harness.studies.run_spatial_study`
    (N = base_N·2^k, dt = h^1.5, PC-RegHCs at the study's η/constants), same
    error functional per level; returns the same result-dict schema plus
    ``compile_plus_run_s`` for the single fused execution.
    """
    from na_dd_tpu.core import FieldRegHCsTriple, MMSForcingRegHCsTriple
    from na_dd_tpu.harness.studies import STUDIES, _study_unroll, study_consts
    from na_dd_tpu.integrators import PCTrapezoidalRegHCsTriple
    from na_dd_tpu.models import Model02

    cfg = STUDIES[study]
    mc = study_consts(study)
    Tf = cfg["spatial_Tf"]

    Ns: List[int] = [base_N * 2**k for k in range(levels)]
    N_max = Ns[-1]
    dts: List[float] = []
    nsteps: List[int] = []
    budget = 0
    for N in Ns:
        dt = (1.0 / N) ** 1.5
        n = math.ceil(Tf / dt)
        dts.append(Tf / n)  # dt adjusted to divide Tf exactly (trial.py:110)
        nsteps.append(n)
        budget = max(budget, _study_unroll(cfg, N, dt, mc))
    P = max(nsteps)

    model = Model02(mc)
    # ONE case/forcing/field/integrator serves every level: all evaluation
    # methods are explicit functions of (grid, ops, state, t), and the padded
    # grids enter the vmapped program as data.
    grid_max = make_uniform_grid(N_max, N_max)
    case = cfg["case_cls"](grid=grid_max, model=model)
    forcing = MMSForcingRegHCsTriple(mms_case=case, model=model, regularization_factor=eta)
    field = FieldRegHCsTriple(
        grid=grid_max, model=model, forcing=forcing, regularization_factor=eta
    )
    integ = PCTrapezoidalRegHCsTriple(
        field,
        regularization_factor=eta,
        track_residuals=False,
        krylov_unroll=budget,
        # scanned body: vmap of the unrolled solver blows up XLA compile
        # (see module docstring); the scanned iteration is measured-exact
        krylov_scanned=krylov_scanned,
    )

    # per-level padded (grid, s0), stacked into leading-axis batches
    padded_grids = []
    padded_states = []
    for N in Ns:
        g = make_uniform_grid(N, N)
        s0 = state_from_mms_when(mms_case=case, t=0.0, grid=g)
        padded_grids.append(pad_grid(g, N_max, N_max))
        padded_states.append(pad_state(s0, N_max, N_max))
    grids = jax.tree.map(lambda *xs: jnp.stack(xs), *padded_grids)
    states = jax.tree.map(lambda *xs: jnp.stack(xs), *padded_states)
    # (L, 1, 1)-shaped per-level dt: 0-d f64 scalars threaded through scan
    # carries degrade to ~f32 on the TPU f64-emulation backend (see
    # trial.run_simulation_collect_data traced_dt).
    dt_batch = jnp.asarray(dts, dtype=jnp.result_type(float)).reshape(levels, 1, 1)

    def simulate_one(g, s0, dt):
        def body(s, k):
            t_k = k * dt
            s1, _diag = integ.step_fn(g, LOCAL_OPS, s, t_k, dt)
            h_sq, grad_sq = _collect_errors(
                g, LOCAL_OPS, case, s1, t_k + dt, ALL_VARIABLES, DEFAULT_INTEGRAL_VARS
            )
            return s1, (h_sq, grad_sq)

        h0, g0 = _collect_errors(
            g, LOCAL_OPS, case, s0, 0.0, ALL_VARIABLES, DEFAULT_INTEGRAL_VARS
        )
        ks = jnp.arange(P, dtype=jnp.result_type(float))
        _s_final, (h_sq, grad_sq) = jax.lax.scan(body, s0, ks)
        h_mat = jnp.concatenate(
            [
                jnp.stack([h0[v] for v in ALL_VARIABLES])[:, None],
                jnp.stack([h_sq[v] for v in ALL_VARIABLES]),
            ],
            axis=1,
        )
        g_mat = jnp.concatenate(
            [
                jnp.stack([g0[v] for v in ALL_VARIABLES])[:, None],
                jnp.stack([grad_sq[v] for v in ALL_VARIABLES]),
            ],
            axis=1,
        )
        return h_mat, g_mat

    run = jax.jit(jax.vmap(simulate_one))

    t_start = time.perf_counter()
    h_all, g_all = jax.device_get(run(grids, states, dt_batch))
    compile_plus_run = time.perf_counter() - t_start
    steady = None
    if measure_steady:
        t_start = time.perf_counter()
        jax.block_until_ready(run(grids, states, dt_batch))
        steady = time.perf_counter() - t_start
    if verbose:
        print(
            f"  [spatial-batched {study}] {levels} levels in ONE program: "
            f"compile+run {compile_plus_run:.1f}s"
            + (f", steady {steady:.2f}s" if steady is not None else ""),
            flush=True,
        )

    errors: List[float] = []
    for i, N in enumerate(Ns):
        k = nsteps[i]
        series = ErrorTimeSeries(
            t=dts[i] * np.arange(k + 1),
            h_norm_sq_errors={
                v: h_all[i, j, : k + 1] for j, v in enumerate(ALL_VARIABLES)
            },
            grad_h_norm_p_sq_errors={
                v: g_all[i, j, : k + 1] for j, v in enumerate(ALL_VARIABLES)
            },
        )
        summary = NumericalErrorSummary(
            dts[i], series, list(ALL_VARIABLES), list(DEFAULT_INTEGRAL_VARS)
        )
        errors.append(summary.overall_combined_error)
        if verbose:
            print(
                f"  [spatial-batched {study}] N={N:4d} dt={dts[i]:.3e} "
                f"err={errors[-1]:.6e}"
            )

    rates = calculate_observed_rates(errors) if len(errors) >= 3 else []
    return dict(
        study=study,
        kind="spatial_batched",
        Ns=Ns,
        Tf=Tf,
        eta=eta,
        errors=errors,
        wallclock_s=[compile_plus_run],
        steady_s=[steady] if steady is not None else None,
        compile_plus_run_s=compile_plus_run,
        krylov_unroll=budget,
        rates=[r for r, _ in rates],
        statuses=[s for _, s in rates],
    )
