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


def released_drug_fraction(ops: Ops, g: Grid, state: State, initial: State):
    """Cumulative released-drug metric: 1 - (∫cs + ∫cd)/(∫cs0 + ∫cd0) with the
    discrete H-measure — a physically meaningful observable for drug-delivery
    runs (not present in the reference)."""
    from na_dd_tpu.ops.inner_products import inner_H

    one = jnp.ones_like(state.cs)
    mass = lambda u: inner_H(ops, g, u, one)
    total0 = mass(initial.cs) + mass(initial.cd)
    total = mass(state.cs) + mass(state.cd)
    return 1.0 - total / total0
