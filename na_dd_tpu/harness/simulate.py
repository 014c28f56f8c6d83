"""Production simulation driver (beyond the reference's MMS-only harness).

The reference can only run manufactured-solution trials; a drug-delivery user
wants to integrate the physical model from real initial conditions.  This
module provides that:

* :func:`make_field` — assemble a reaction variant with zero (or custom)
  forcing;
* :func:`simulate` — integrate ``num_steps`` with the PC integrator inside
  one ``lax.scan`` program, optionally recording every ``snapshot_every``-th
  state (device-stacked trajectory, no host round-trips);
* checkpointing composes via :mod:`na_dd_tpu.harness.checkpoint`.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from na_dd_tpu.core.fields import FieldCsTriple, FieldHCsTriple, FieldRegHCsTriple
from na_dd_tpu.core.forcing import NoForcing
from na_dd_tpu.core.state import State
from na_dd_tpu.harness.trial import _scan_step
from na_dd_tpu.integrators.pc_trapezoidal import (
    PCTrapezoidalCsTriple,
    PCTrapezoidalHCsTriple,
    PCTrapezoidalRegHCsTriple,
)
from na_dd_tpu.models.coefficients import Model02
from na_dd_tpu.ops.grid import Grid
from na_dd_tpu.ops.shifts import LOCAL_OPS, Ops

_VARIANTS = {
    "cstriple": (FieldCsTriple, PCTrapezoidalCsTriple),
    "hcstriple": (FieldHCsTriple, PCTrapezoidalHCsTriple),
    "reghcstriple": (FieldRegHCsTriple, PCTrapezoidalRegHCsTriple),
}


def make_integrator(
    grid: Grid,
    model,
    *,
    variant: str = "reghcstriple",
    regularization_factor: float = 50.0,
    forcing=None,
    **integrator_params,
):
    """Field + PC integrator for a reaction variant with physical forcing
    (defaults to none — the homogeneous model)."""
    field_cls, integ_cls = _VARIANTS[variant]
    forcing = forcing if forcing is not None else NoForcing()
    field_kwargs = dict(grid=grid, model=model, forcing=forcing)
    # default to the unrolled solver: faster on TPU and immune to the
    # backend's while_loop scalar-precision hazard (see harness/studies.py)
    integ_kwargs = dict(krylov_unroll=24)
    integ_kwargs.update(integrator_params)
    if variant == "reghcstriple":
        field_kwargs["regularization_factor"] = regularization_factor
        integ_kwargs["regularization_factor"] = regularization_factor
    field = field_cls(**field_kwargs)
    return integ_cls(field, track_residuals=False, **integ_kwargs)


def simulate(
    integrator,
    grid: Grid,
    state0: State,
    *,
    t0: float = 0.0,
    dt: float,
    num_steps: int,
    snapshot_every: Optional[int] = None,
    ops: Ops = LOCAL_OPS,
):
    """Integrate num_steps; returns (final_state, times, snapshots | None).

    ``snapshots`` is a State of arrays with a leading time axis containing
    every ``snapshot_every``-th state (recorded on device inside the scan).
    """
    record = snapshot_every is not None
    if record:
        assert num_steps % snapshot_every == 0, (
            "num_steps must be divisible by snapshot_every"
        )
        n_outer = num_steps // snapshot_every
        n_inner = snapshot_every
    else:
        n_outer, n_inner = 1, num_steps

    # t0/dt are baked in as compile-time constants (traced scalars degrade
    # f64-emulated TPU arithmetic inside scans; see harness/trial.py).
    @jax.jit
    def run(s0):
        def inner(s, k):
            s1, _ = _scan_step(integrator, grid, ops, s, t0 + k * dt, dt)
            return s1, None

        def outer(carry, j):
            s = carry
            ks = j * n_inner + jnp.arange(n_inner, dtype=jnp.result_type(float))
            s, _ = jax.lax.scan(inner, s, ks)
            return s, (s if record else None)

        js = jnp.arange(n_outer, dtype=jnp.result_type(float))
        s_final, snaps = jax.lax.scan(outer, s0, js)
        return s_final, snaps

    s_final, snaps = run(state0)
    times = t0 + dt * (jnp.arange(1, n_outer + 1) * n_inner) if record else None
    return s_final, times, (snaps if record else None)


def simulate_adaptive(
    integrator,
    grid: Grid,
    state0: State,
    *,
    t0: float = 0.0,
    Tf: float,
    dt0: float,
    tol: float = 1e-6,
    safety: float = 0.9,
    growth_min: float = 0.2,
    growth_max: float = 5.0,
    dt_min: float = 1e-12,
    max_steps: int = 100_000,
    ops: Ops = LOCAL_OPS,
):
    """Adaptive-dt integration to ``Tf`` (beyond the reference, which has no
    step control).

    Error estimate: the forward-Euler embedded solution ``u0 + dt·F(u0, t)``
    shares its field evaluations with the PC step's own predictor data (XLA
    CSE), so the estimate is nearly free.  The PC corrector is 2nd order and
    FE 1st, so ``est = Σ_v ‖u_PC − u_FE‖_H / (1 + ‖u_PC‖_H)`` measures the
    FE local error ~C·dt²; the controller targets ``est ≈ tol`` with the
    standard square-root law ``dt ← dt·clip(safety·(tol/est)^½)`` and redoes
    a step whose estimate exceeds ``tol`` (classic accept/reject).

    Whole loop is ONE jitted ``lax.while_loop`` program; t and dt ride the
    carry as (1,1) arrays, not 0-d scalars, sidestepping the axon backend's
    while_loop scalar-precision hazard (see harness/studies.py docstring).

    Returns ``(final_state, info)`` with info = dict(steps, rejected, t, dt).
    """
    field = integrator.semi_discrete_field
    g = grid

    def norm(u):
        from na_dd_tpu.ops.inner_products import norm_H

        return norm_H(ops, g, u)

    @jax.jit
    def run(s0):
        def cond(carry):
            s, t, dt, k, rej, done = carry
            return jnp.logical_and(jnp.logical_not(done), k < max_steps)

        def body(carry):
            s, t, dt, k, rej, _done = carry
            # ALL t/dt arithmetic stays (1,1)-shaped: the axon backend's
            # while_loop precision hazard is specifically 0-d f64 arithmetic
            # feeding 0-d carries (studies/axon_while_probe.py measures the
            # 0-d add drifting while the identical (1,1)-shaped add is
            # exact), so collapsing to [0,0] scalars here would reintroduce
            # the drift the (1,1) carry exists to prevent.
            remaining = Tf - t
            dt_try = jnp.minimum(dt, remaining)

            s1, _diag = integrator.step_fn(g, ops, s, t, dt_try)
            fe = State(
                *(u + dt_try * f * g.interior_mask
                  for u, f in zip(s, field.all_fields(g, ops, s, t)))
            )
            est = sum(
                norm(u_pc - u_fe) / (1.0 + norm(u_pc))
                for u_pc, u_fe in zip(s1, fe)
            )
            accept = est <= tol
            factor = jnp.clip(
                safety * jnp.sqrt(tol / jnp.maximum(est, 1e-300)),
                growth_min,
                growth_max,
            )
            dt_next = jnp.maximum(dt_try * factor, dt_min)
            # floor hit => forced accept (can't shrink further)
            accept = jnp.logical_or(accept, jnp.all(dt_try <= dt_min))

            s_new = jax.tree_util.tree_map(
                lambda a, b: jnp.where(accept, a, b), s1, s
            )
            t_new = jnp.where(accept, t + dt_try, t)
            done = jnp.all(t_new >= Tf - 1e-15)
            return (
                s_new,
                t_new,
                dt_next,
                k + jnp.where(accept, 1, 0),
                rej + jnp.where(accept, 0, 1),
                done,
            )

        dtype = s0.T.dtype
        init = (
            s0,
            jnp.full((1, 1), t0, dtype=dtype),
            jnp.full((1, 1), dt0, dtype=dtype),
            jnp.asarray(0),
            jnp.asarray(0),
            jnp.asarray(Tf <= t0),
        )
        s, t, dt, k, rej, _done = jax.lax.while_loop(cond, body, init)
        return s, t[0, 0], dt[0, 0], k, rej

    s, t, dt, k, rej = run(state0)
    return s, dict(
        steps=int(k), rejected=int(rej), t=float(t), dt=float(dt)
    )


def released_drug_fraction(ops: Ops, g: Grid, state: State, initial: State):
    """Cumulative released-drug metric: 1 - (∫cs + ∫cd)/(∫cs0 + ∫cd0) with the
    discrete H-measure — a physically meaningful observable for drug-delivery
    runs (not present in the reference).

    CAUTION for calibration: the Kd reaction term only TRANSFERS mass between
    cs and cd (reference src/prob1base.py:2653-2672: ``Fcd += R``,
    ``Fcs -= R``), so this combined-mass observable is invariant to Kd up to
    the small Dd diffusive outflux — do NOT use it to fit Kd.  Use
    :func:`dissolved_drug_fraction` (directly Kd-sensitive) instead."""
    from na_dd_tpu.ops.inner_products import inner_H

    one = jnp.ones_like(state.cs)
    mass = lambda u: inner_H(ops, g, u, one)
    total0 = mass(initial.cs) + mass(initial.cd)
    total = mass(state.cs) + mass(state.cd)
    return 1.0 - total / total0


def dissolved_drug_fraction(ops: Ops, g: Grid, state: State):
    """Dissolved fraction ∫cd / (∫cd + ∫cs) with the discrete H-measure.

    The observable of choice for calibrating the dissolution-rate constant
    Kd: the reaction term moves mass from cs to cd at rate ∝ Kd, so this
    ratio carries O(1) Kd sensitivity (unlike the total released mass, which
    is Kd-invariant by the conservation structure of the reaction)."""
    from na_dd_tpu.ops.inner_products import inner_H

    one = jnp.ones_like(state.cs)
    mass = lambda u: inner_H(ops, g, u, one)
    cd, cs = mass(state.cd), mass(state.cs)
    return cd / (cd + cs)
