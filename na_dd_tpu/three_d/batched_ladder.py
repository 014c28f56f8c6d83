"""Batched 3-D spatial ladders: pad-to-max + vmap, ONE XLA compile per ladder.

The 3-D twin of :mod:`na_dd_tpu.harness.batched_ladder` (measured on the TPU
in 2-D: the 8-level pol ladder in ONE program, 359.8 s cold vs 677 s of
per-level compiles).  Identical padding argument: the 0-sentinel reciprocal
metrics, masked weights (including the new gradient weights w_gx/w_gy/w_gz)
and the interior mask are all zero at zero-padded dead nodes, so dead nodes
contribute exactly 0 to every stencil, reduction and error norm; the parity/
coloring planes are recomputed on the padded index space so 2-color diagonal
and 7-color plane probing stay valid.

Per-level dt rides as a vmapped traced (1,1) array (0-d f64 scalars threaded
through scan carries degrade on the TPU f64-emulation backend — see
harness/trial.py traced_dt), the scan runs the ladder-max step count (coarse
levels integrate past Tf; their overrun rows are discarded host-side), and
the Krylov body defaults to the SCANNED BiCGStab (vmap of the fully-unrolled
solver blows up XLA compile super-linearly — CLAUDE.md).
"""

from __future__ import annotations

import dataclasses
import math
import time
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from na_dd_tpu.core.state import State
from na_dd_tpu.harness.rates import calculate_observed_rates
from na_dd_tpu.three_d.fields import FieldRegHCsTriple3
from na_dd_tpu.three_d.forcing import MMSForcingRegHCsTriple3
from na_dd_tpu.three_d.grid import Grid3, make_uniform_grid3
from na_dd_tpu.three_d.inner_products import inner_H3, inner_p3
from na_dd_tpu.three_d.integrator import PCTrapezoidalRegHCsTriple3
from na_dd_tpu.three_d.mms import state_from_mms_when3
from na_dd_tpu.three_d.shifts import LOCAL_OPS3
from na_dd_tpu.three_d.stencils import grad_H3


def pad_grid3(g: Grid3, N_max: int, M_max: int, P_max: int) -> Grid3:
    """Zero-pad every grid plane to (N_max+1, M_max+1, P_max+1); recompute
    the parity/coloring planes on the padded index space (2-D twin:
    harness/batched_ladder.pad_grid, with the same dead-node invariants)."""
    shape = (N_max + 1, M_max + 1, P_max + 1)

    def pad(a):
        return jnp.pad(
            jnp.asarray(a),
            (
                (0, shape[0] - a.shape[0]),
                (0, shape[1] - a.shape[1]),
                (0, shape[2] - a.shape[2]),
            ),
        )

    ii, jj, kk = np.meshgrid(
        np.arange(shape[0]), np.arange(shape[1]), np.arange(shape[2]), indexing="ij"
    )
    dtype = g.xx.dtype
    changes = {
        f.name: pad(getattr(g, f.name))
        for f in dataclasses.fields(g)
        if f.name not in ("N", "M", "P", "red_mask", "color7")
    }
    changes["red_mask"] = jnp.asarray(((ii + jj + kk) % 2 == 0), dtype=dtype)
    changes["color7"] = jnp.asarray((ii + 2 * jj + 3 * kk) % 7, dtype=g.color7.dtype)
    return dataclasses.replace(g, N=N_max, M=M_max, P=P_max, **changes)


def pad_state3(s, N_max: int, M_max: int, P_max: int):
    """Zero-pad every state field to the padded grid shape."""
    shape = (N_max + 1, M_max + 1, P_max + 1)

    def pad(a):
        return jnp.pad(
            jnp.asarray(a),
            (
                (0, shape[0] - a.shape[0]),
                (0, shape[1] - a.shape[1]),
                (0, shape[2] - a.shape[2]),
            ),
        )

    return jax.tree.map(pad, s)


def run_spatial_ladder3_batched(
    case_cls,
    *,
    model,
    levels: int = 4,
    base_N: int = 4,
    dt0: float = 1e-2,
    Tf: float = 0.02,
    eta: float = 50.0,
    krylov_unroll: int = 24,
    krylov_scanned: bool = True,
    num_newton_steps: int = 2,
    precision: str | None = None,
    integral_vars=("T", "cl", "cd"),
    verbose: bool = True,
    measure_steady: bool = False,
) -> dict:
    """The :mod:`studies.three_d_study` ladder (N = base_N·2^k, dt = dt0/2^k)
    as ONE vmapped XLA program; per-level errors are the same combined
    max-integral norm as :func:`na_dd_tpu.three_d.harness.run_trial3`."""
    Ns: List[int] = [base_N * 2**k for k in range(levels)]
    N_max = Ns[-1]
    dts: List[float] = []
    nsteps: List[int] = []
    for k in range(levels):
        dt = dt0 / 2**k
        n = max(1, math.ceil(Tf / dt))
        dts.append(Tf / n)
        nsteps.append(n)
    P_steps = max(nsteps)

    # ONE case/forcing/field/integrator serves every level (all methods are
    # explicit functions of (grid, ops, state, t); padded grids are data).
    grid_max = make_uniform_grid3(N_max, N_max, N_max)
    case = case_cls(grid_max, model)
    forcing = MMSForcingRegHCsTriple3(
        mms_case=case, model=model, regularization_factor=eta
    )
    field = FieldRegHCsTriple3(
        grid=grid_max, model=model, forcing=forcing, regularization_factor=eta
    )
    integ = PCTrapezoidalRegHCsTriple3(
        field,
        regularization_factor=eta,
        track_residuals=False,
        krylov_unroll=krylov_unroll,
        krylov_scanned=krylov_scanned,
        num_newton_steps=num_newton_steps,
        # None → env/default; "mixed" runs every Krylov iteration in native
        # f32 under f64 refinement — in 2-D this cut the batched ladder's
        # cold compile+run from 359.8s to 147.5s at full parity (README)
        precision=precision,
    )

    padded_grids, padded_states = [], []
    for N in Ns:
        g = make_uniform_grid3(N, N, N)
        s0 = state_from_mms_when3(mms_case=case, t=0.0, grid=g)
        padded_grids.append(pad_grid3(g, N_max, N_max, N_max))
        padded_states.append(pad_state3(s0, N_max, N_max, N_max))
    grids = jax.tree.map(lambda *xs: jnp.stack(xs), *padded_grids)
    states = jax.tree.map(lambda *xs: jnp.stack(xs), *padded_states)
    dt_batch = jnp.asarray(dts, dtype=jnp.result_type(float)).reshape(levels, 1, 1)

    def errs_at(g, s, t):
        ex = state_from_mms_when3(mms_case=case, t=t, grid=g)
        tot = 0.0
        grad_tot = 0.0
        for v in State._fields:
            e = getattr(s, v) - getattr(ex, v)
            tot = tot + inner_H3(LOCAL_OPS3, g, e, e)
            if v in integral_vars:
                gx, gy, gz = grad_H3(LOCAL_OPS3, g, e)
                grad_tot = grad_tot + inner_p3(LOCAL_OPS3, g, gx, gy, gz, gx, gy, gz)
        return tot, grad_tot

    def simulate_one(g, s0, dt):
        def body(s, k):
            # dt is (1,1)-shaped (broadcasts against the 3-D arrays; the
            # error reductions below collapse everything back to scalars)
            t_k = k * dt
            s1, diag = integ.step_fn(g, LOCAL_OPS3, s, t_k, dt)
            tot, grad = errs_at(g, s1, t_k + dt)
            return s1, (tot, grad, diag.krylov_converged, diag.hcs_denominator_ok)

        ks = jnp.arange(P_steps, dtype=jnp.result_type(float))
        tot0, grad0 = errs_at(g, s0, jnp.zeros_like(dt))
        _s_final, (tot, grad, conv, hcs) = jax.lax.scan(body, s0, ks)
        return (
            jnp.concatenate([tot0.reshape(1), tot]),
            jnp.concatenate([grad0.reshape(1), grad]),
            conv,
            hcs,
        )

    run = jax.jit(jax.vmap(simulate_one))

    t_start = time.perf_counter()
    tot_all, grad_all, conv_all, hcs_all = jax.device_get(
        run(grids, states, dt_batch)
    )
    compile_plus_run = time.perf_counter() - t_start
    steady = None
    if measure_steady:
        t_start = time.perf_counter()
        jax.block_until_ready(run(grids, states, dt_batch))
        steady = time.perf_counter() - t_start
    if verbose:
        print(
            f"  [3-D spatial-batched] {levels} levels in ONE program: "
            f"compile+run {compile_plus_run:.1f}s"
            + (f", steady {steady:.2f}s" if steady is not None else ""),
            flush=True,
        )

    errors: List[float] = []
    converged: List[bool] = []
    for i, N in enumerate(Ns):
        k = nsteps[i]
        # only the level's REAL steps gate its flags (overrun rows discarded)
        if not bool(np.all(hcs_all[i, :k])):
            from na_dd_tpu.integrators.pc_trapezoidal import (
                HCsCorrectorPositivityError,
            )

            raise HCsCorrectorPositivityError(
                f"level N={N}: denominator 2 - dt Kd (Sd - Cd1) (1 + Cl1) "
                "below positiveness threshold."
            )
        converged.append(bool(np.all(conv_all[i, :k])))
        tot = tot_all[i, : k + 1]
        grad = grad_all[i, : k + 1]
        running = np.concatenate(
            [[0.0], np.cumsum(0.5 * dts[i] * (grad[:-1] + grad[1:]))]
        )
        errors.append(float(np.sqrt(np.max(tot + running))))
        if verbose:
            print(
                f"  [3-D spatial-batched] N={N:4d} dt={dts[i]:.3e} "
                f"err={errors[-1]:.6e} conv={converged[-1]}"
            )

    rates = calculate_observed_rates(errors) if len(errors) >= 3 else []
    return dict(
        kind="three_d_spatial_batched",
        Ns=Ns,
        Tf=Tf,
        eta=eta,
        errors=errors,
        converged=converged,
        compile_plus_run_s=compile_plus_run,
        steady_s=steady,
        krylov_unroll=krylov_unroll,
        rates=[r for r, _ in rates],
        statuses=[s for _, s in rates],
    )
