"""Halo-exchange shift ops for spatial domain decomposition.

The reference has no distributed execution at all (SURVEY.md §2.5); the
TPU-native scale-out axis for this workload is the grid itself.  Inside a
``jax.shard_map`` region each device holds a contiguous block of grid rows
(and optionally columns).  The 5-point stencil needs one halo row/column from
each neighbor, which :class:`HaloOps` moves with ``lax.ppermute`` — a
nearest-neighbor ICI transfer — while global reductions become ``psum``.

Because zero-filling at the *global* edge is exactly the single-device shift
semantics (see :mod:`na_dd_tpu.ops.shifts`), the physics code is unchanged:
blocks at the mesh edge receive zeros from ppermute (no source in the
permutation), interior blocks receive their neighbor's boundary row.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from na_dd_tpu.ops.shifts import Ops


@dataclasses.dataclass(frozen=True)
class HaloOps(Ops):
    """Shift provider for a block of a (N+1, M+1) grid sharded over a mesh.

    Args:
        axis_x: mesh axis name sharding array rows (None = unsharded).
        nx: number of shards along axis_x (static; from ``mesh.shape``).
        axis_y / ny: same for columns.

    Frozen dataclass => hashable => usable as a jit static argument.
    """

    axis_x: str | None = None
    nx: int = 1
    axis_y: str | None = None
    ny: int = 1

    # -- x-axis (rows) --------------------------------------------------
    def shift_xm(self, u):
        head = jnp.zeros_like(u[:1, :])
        if self.axis_x is not None and self.nx > 1:
            # receive previous block's last row (mesh edge receives zeros)
            perm = [(i, i + 1) for i in range(self.nx - 1)]
            head = jax.lax.ppermute(u[-1:, :], self.axis_x, perm)
        return jnp.concatenate([head, u[:-1, :]], axis=0)

    def shift_xp(self, u):
        tail = jnp.zeros_like(u[:1, :])
        if self.axis_x is not None and self.nx > 1:
            perm = [(i, i - 1) for i in range(1, self.nx)]
            tail = jax.lax.ppermute(u[:1, :], self.axis_x, perm)
        return jnp.concatenate([u[1:, :], tail], axis=0)

    # -- y-axis (columns) ------------------------------------------------
    def shift_ym(self, u):
        head = jnp.zeros_like(u[:, :1])
        if self.axis_y is not None and self.ny > 1:
            perm = [(i, i + 1) for i in range(self.ny - 1)]
            head = jax.lax.ppermute(u[:, -1:], self.axis_y, perm)
        return jnp.concatenate([head, u[:, :-1]], axis=1)

    def shift_yp(self, u):
        tail = jnp.zeros_like(u[:, :1])
        if self.axis_y is not None and self.ny > 1:
            perm = [(i, i - 1) for i in range(1, self.ny)]
            tail = jax.lax.ppermute(u[:, :1], self.axis_y, perm)
        return jnp.concatenate([u[:, 1:], tail], axis=1)

    # -- reductions -------------------------------------------------------
    def _mesh_axes(self):
        return tuple(a for a in (self.axis_x, self.axis_y) if a is not None)

    def asum(self, u):
        s = jnp.sum(u)
        axes = self._mesh_axes()
        if axes:
            s = jax.lax.psum(s, axes)
        return s

    def amax(self, u):
        m = jnp.max(u)
        axes = self._mesh_axes()
        if axes:
            m = jax.lax.pmax(m, axes)
        return m

    # -- whole-array access (direct-solve support; see Ops docstring) ------
    def gather_full(self, u):
        """All-gather the global array: rows over axis_x, columns over
        axis_y.  O(N·M) ICI bytes per call — used only by the replicated
        direct solve, never on the matrix-free Krylov path."""
        if self.axis_x is not None and self.nx > 1:
            u = jax.lax.all_gather(u, self.axis_x, axis=0, tiled=True)
        if self.axis_y is not None and self.ny > 1:
            u = jax.lax.all_gather(u, self.axis_y, axis=1, tiled=True)
        return u

    def local_slice(self, u_full):
        rows = u_full.shape[0] // self.nx
        cols = u_full.shape[1] // self.ny
        u = u_full
        if self.axis_x is not None and self.nx > 1:
            i = jax.lax.axis_index(self.axis_x)
            u = jax.lax.dynamic_slice_in_dim(u, i * rows, rows, axis=0)
        if self.axis_y is not None and self.ny > 1:
            j = jax.lax.axis_index(self.axis_y)
            u = jax.lax.dynamic_slice_in_dim(u, j * cols, cols, axis=1)
        return u
