"""Shift + reduction primitives: the only ops that see the domain boundary.

Every discrete operator in this framework (differences, midpoint averages,
quadrature point generation) is expressed through four *zero-filling* axis
shifts plus a global sum.  This is the seam that makes the physics code
location-transparent:

* :class:`LocalOps` — single-device implementation via slice + concatenate
  (XLA fuses these into the surrounding elementwise graph);
* :class:`na_dd_tpu.parallel.halo.HaloOps` — the same contract inside a
  ``jax.shard_map`` region, where the row/column that crosses a shard boundary
  travels over ICI with ``lax.ppermute`` and the global sum is a ``psum``.

Semantics (u is an (N+1, M+1) grid function; out-of-range entries are 0):

    shift_xm(u)[i, j] = u[i-1, j]     (row 0 of the result is 0)
    shift_xp(u)[i, j] = u[i+1, j]     (row N of the result is 0)
    shift_ym(u)[i, j] = u[i, j-1]     (col 0 of the result is 0)
    shift_yp(u)[i, j] = u[i, j+1]     (col M of the result is 0)
    asum(u)           = sum over the *global* array
    amax(u)           = max over the *global* array

These are exactly the neighbor accesses of the reference's stencil helpers
(`grid0_fn_ab`, reference src/prob1base.py:1553-1581), restated as primitives.
"""

from __future__ import annotations

import jax.numpy as jnp


class Ops:
    """Protocol for shift/reduction providers (duck-typed)."""

    def shift_xm(self, u):  # pragma: no cover - interface
        raise NotImplementedError

    def shift_xp(self, u):  # pragma: no cover - interface
        raise NotImplementedError

    def shift_ym(self, u):  # pragma: no cover - interface
        raise NotImplementedError

    def shift_yp(self, u):  # pragma: no cover - interface
        raise NotImplementedError

    def asum(self, u):  # pragma: no cover - interface
        raise NotImplementedError

    def amax(self, u):  # pragma: no cover - interface
        raise NotImplementedError

    # -- whole-array access (for solvers that need the full grid) ---------
    # Matrix-free solvers never need these: shifts + reductions cover them.
    # The assembled *direct* solve (ops/direct_solve.py) addresses whole
    # grid rows, so under sharding it gathers the global array, solves
    # replicated, and slices its shard back out.  Abstract like the shifts:
    # an Ops implementation that forgot these would otherwise inherit
    # identity behaviour and make the sharded direct solve factorize each
    # local shard against zero halos — a silently wrong solve.

    def gather_full(self, u):  # pragma: no cover - interface
        """Return the full global array (identity on a single device)."""
        raise NotImplementedError

    def local_slice(self, u_full):  # pragma: no cover - interface
        """This device's shard of a full global array (identity locally)."""
        raise NotImplementedError


def _zeros_row_like(u):
    return jnp.zeros_like(u[:1, :])


def _zeros_col_like(u):
    return jnp.zeros_like(u[:, :1])


class LocalOps(Ops):
    """Single-device shifts: slice + concatenate, fully fusible by XLA."""

    def shift_xm(self, u):
        return jnp.concatenate([_zeros_row_like(u), u[:-1, :]], axis=0)

    def shift_xp(self, u):
        return jnp.concatenate([u[1:, :], _zeros_row_like(u)], axis=0)

    def shift_ym(self, u):
        return jnp.concatenate([_zeros_col_like(u), u[:, :-1]], axis=1)

    def shift_yp(self, u):
        return jnp.concatenate([u[:, 1:], _zeros_col_like(u)], axis=1)

    def asum(self, u):
        return jnp.sum(u)

    def amax(self, u):
        return jnp.max(u)

    def gather_full(self, u):
        return u

    def local_slice(self, u_full):
        return u_full


LOCAL_OPS = LocalOps()
