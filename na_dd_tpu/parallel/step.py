"""Sharded whole-step / whole-simulation builders.

The physics code (fields, integrators, Krylov solves, error norms) is written
against the shift/sum Ops protocol, so sharding it is purely a matter of
running it inside ``jax.shard_map`` with :class:`HaloOps` — stencil halos ride
ICI via ``ppermute`` and every reduction (Krylov dot products, error norms)
becomes a ``psum``.  No algorithmic change, no accuracy change.  The one
non-matrix-free solver, ``linear_solver='direct'`` (BCR), runs *replicated*:
it all-gathers the assembled planes, solves the full grid on every device,
and slices its shard back out (ops/direct_solve.stencil5_solve_direct_ops)
— exact, at the cost of duplicating the solve FLOPs per device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from na_dd_tpu.parallel.halo import HaloOps
from na_dd_tpu.parallel.sharding import grid_pspec

# late import to avoid a cycle: harness imports integrators only.


def _make_halo_ops(mesh, axis_x, axis_y):
    nx = mesh.shape[axis_x] if axis_x else 1
    ny = mesh.shape[axis_y] if axis_y else 1
    return HaloOps(
        axis_x=axis_x if nx > 1 else None,
        nx=nx,
        axis_y=axis_y if ny > 1 else None,
        ny=ny,
    )


def build_sharded_step(integrator, mesh, *, axis_x="x", axis_y=None):
    """Jitted (grid, state, t, dt) -> (state', diag_scalars) over the mesh."""
    from na_dd_tpu.harness.trial import _scan_step

    hops = _make_halo_ops(mesh, axis_x, axis_y)
    spec = grid_pspec(axis_x, axis_y)

    def raw(g, s, t, dt):
        return _scan_step(integrator, g, hops, s, t, dt)

    # check_vma=True: the static safety net that every P() output really is
    # mesh-invariant.  All scalar diagnostics are built from ops.asum/amax
    # (psum/pmax) reductions, so the check passes — and would catch any
    # future per-shard jnp.all/jnp.max sneaking into a replicated output.
    # Exception: the differentiable mode's lax.custom_linear_solve primitive
    # rejects mixed varying-manual-axes operands under the vma checker (a
    # JAX limitation — the error message itself prescribes check_vma=False
    # as the workaround); the distributed-adjoint parity test
    # (tests/test_parallel.py::test_sharded_step_gradient_matches_local)
    # gates that the unchecked program still matches the local gradient.
    sharded = jax.shard_map(
        raw,
        mesh=mesh,
        in_specs=(spec, spec, P(), P()),
        out_specs=(spec, P()),
        check_vma=not getattr(integrator, "differentiable", False),
    )
    return jax.jit(sharded)


def build_sharded_simulation(
    integrator,
    mesh,
    *,
    mms_case,
    num_steps: int,
    t0: float,
    dt: float,
    variable_names=("cp", "T", "cl", "cd", "cs"),
    integral_vars=("T", "cl", "cd"),
    axis_x="x",
    axis_y=None,
):
    """Jitted (grid, state0) -> (state_final, error arrays) over the mesh.

    The whole num_steps scan — integration and error collection — runs inside
    one shard_map region, so per-step host round-trips are zero and all
    cross-shard traffic is nearest-neighbor halos + scalar psums.
    """
    from na_dd_tpu.harness.trial import _collect_errors, _scan_step

    hops = _make_halo_ops(mesh, axis_x, axis_y)
    spec = grid_pspec(axis_x, axis_y)
    variable_names = tuple(variable_names)
    integral_vars = tuple(integral_vars)

    def sim(g, s0):
        h0, g0 = _collect_errors(g, hops, mms_case, s0, t0, variable_names, integral_vars)

        def body(s, k):
            t_k = t0 + k * dt
            s1, small = _scan_step(integrator, g, hops, s, t_k, dt)
            h_sq, grad_sq = _collect_errors(
                g, hops, mms_case, s1, t_k + dt, variable_names, integral_vars
            )
            return s1, (h_sq, grad_sq, small)

        ks = jnp.arange(num_steps, dtype=jnp.result_type(float))
        s_final, ys = jax.lax.scan(body, s0, ks)
        return s_final, (h0, g0, ys)

    sharded = jax.shard_map(
        sim,
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=(spec, P()),
        check_vma=True,  # see build_sharded_step
    )
    return jax.jit(sharded)
