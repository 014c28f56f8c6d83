"""Explicit forward-Euler integrator (reference src/prob1base.py:2885-2903).

Used by the spatial-accuracy studies with CFL-scaled dt.  Boundary semantics
match the reference: u1 = u0 + dt*F(u0) on the *full* grid, so boundary values
evolve under the forcing's boundary trace (no re-projection onto the Dirichlet
boundary — this is observable in the FE order tests).
"""

from __future__ import annotations

import jax

from na_dd_tpu.core.state import State
from na_dd_tpu.ops.shifts import LOCAL_OPS


class ForwardEulerIntegrator:
    #: Single-device ops provider for the eager ``.step()`` API.  The step
    #: body itself is fully dimension-agnostic (it only evaluates the field),
    #: so the 3-D subclass overrides nothing but this attribute.
    _local_ops = LOCAL_OPS

    def __init__(self, semi_discrete_field, **_ignored):
        self.semi_discrete_field = semi_discrete_field
        # ops providers are static config (hashable singletons), not pytrees.
        self._jit_step = jax.jit(self.step_fn, static_argnums=1)

    def step_fn(self, g, ops, s: State, t0, dt) -> State:
        """Jittable step body; (t0, dt) may be traced scalars."""
        F = self.semi_discrete_field.all_fields(g, ops, s, t0)
        return State(
            cp=s.cp + dt * F.cp,
            T=s.T + dt * F.T,
            cl=s.cl + dt * F.cl,
            cd=s.cd + dt * F.cd,
            cs=s.cs + dt * F.cs,
        )

    def step(self, at_t0: State, *, t0, dt) -> State:
        """Eager convenience API mirroring the reference integrator."""
        g = self.semi_discrete_field.grid
        return self._jit_step(g, self._local_ops, at_t0, t0, dt)
