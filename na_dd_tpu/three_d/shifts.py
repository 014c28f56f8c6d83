"""Shift + reduction primitives for (N+1, M+1, P+1) grid functions.

The 3-D counterpart of :mod:`na_dd_tpu.ops.shifts` — six zero-filling axis
shifts plus global reductions.  Semantics (out-of-range entries are 0):

    shift_xm(u)[i,j,k] = u[i-1,j,k]       shift_xp(u)[i,j,k] = u[i+1,j,k]
    shift_ym(u)[i,j,k] = u[i,j-1,k]       shift_yp(u)[i,j,k] = u[i,j+1,k]
    shift_zm(u)[i,j,k] = u[i,j,k-1]       shift_zp(u)[i,j,k] = u[i,j,k+1]
    asum(u) / amax(u)  = global reductions

Sharding (``HaloOps3``): the x and y array axes shard over a 2-D device
mesh exactly like the 2-D framework's :class:`na_dd_tpu.parallel.halo.HaloOps`
(one halo plane rides ICI via ``lax.ppermute`` per shift; reductions are
``psum``/``pmax``).  The z axis deliberately stays ON-DEVICE: it is the
minor-most array axis — the TPU lane dimension — so z shifts are pure
register/VMEM traffic and z-sharding would put collectives on the axis
where the hardware is fastest locally.  For the target grids (z resolution
≤ a few hundred) the x/y plane supplies ample parallelism.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


class Ops3:
    """Protocol for 3-D shift/reduction providers (duck-typed)."""

    def shift_xm(self, u):  # pragma: no cover - interface
        raise NotImplementedError

    def shift_xp(self, u):  # pragma: no cover - interface
        raise NotImplementedError

    def shift_ym(self, u):  # pragma: no cover - interface
        raise NotImplementedError

    def shift_yp(self, u):  # pragma: no cover - interface
        raise NotImplementedError

    def shift_zm(self, u):  # pragma: no cover - interface
        raise NotImplementedError

    def shift_zp(self, u):  # pragma: no cover - interface
        raise NotImplementedError

    def asum(self, u):  # pragma: no cover - interface
        raise NotImplementedError

    def amax(self, u):  # pragma: no cover - interface
        raise NotImplementedError

    # The assembled *direct* solve (three_d/direct_solve.py) addresses whole
    # x-planes, so under sharding it gathers the global array, solves
    # replicated, and slices its shard back out — same contract as the 2-D
    # :meth:`na_dd_tpu.ops.shifts.Ops.gather_full`.  Abstract like the
    # shifts: an Ops3 implementation that forgot these would otherwise
    # inherit identity behaviour and make the sharded direct solve factorize
    # each local shard against zero halos — a silently wrong solve.

    def gather_full(self, u):  # pragma: no cover - interface
        """Return the full global array (identity on a single device)."""
        raise NotImplementedError

    def local_slice(self, u_full):  # pragma: no cover - interface
        """This device's shard of a full global array (identity locally)."""
        raise NotImplementedError


class LocalOps3(Ops3):
    """Single-device shifts: slice + concatenate, fully fusible by XLA."""

    def gather_full(self, u):
        return u

    def local_slice(self, u_full):
        return u_full

    def shift_xm(self, u):
        return jnp.concatenate([jnp.zeros_like(u[:1]), u[:-1]], axis=0)

    def shift_xp(self, u):
        return jnp.concatenate([u[1:], jnp.zeros_like(u[:1])], axis=0)

    def shift_ym(self, u):
        return jnp.concatenate([jnp.zeros_like(u[:, :1]), u[:, :-1]], axis=1)

    def shift_yp(self, u):
        return jnp.concatenate([u[:, 1:], jnp.zeros_like(u[:, :1])], axis=1)

    def shift_zm(self, u):
        return jnp.concatenate([jnp.zeros_like(u[:, :, :1]), u[:, :, :-1]], axis=2)

    def shift_zp(self, u):
        return jnp.concatenate([u[:, :, 1:], jnp.zeros_like(u[:, :, :1])], axis=2)

    def asum(self, u):
        return jnp.sum(u)

    def amax(self, u):
        return jnp.max(u)


LOCAL_OPS3 = LocalOps3()


@dataclasses.dataclass(frozen=True)
class HaloOps3(Ops3):
    """Shift provider for a block of a 3-D grid sharded over a 2-D mesh.

    Args:
        axis_x: mesh axis name sharding array axis 0 (None = unsharded).
        nx: number of shards along axis_x (static; from ``mesh.shape``).
        axis_y / ny: same for array axis 1.

    The z array axis (axis 2) is never sharded — see module docstring.
    Frozen dataclass => hashable => usable as a jit static argument.
    """

    axis_x: str | None = None
    nx: int = 1
    axis_y: str | None = None
    ny: int = 1

    # -- x-axis (array axis 0) -------------------------------------------
    def shift_xm(self, u):
        head = jnp.zeros_like(u[:1])
        if self.axis_x is not None and self.nx > 1:
            perm = [(i, i + 1) for i in range(self.nx - 1)]
            head = jax.lax.ppermute(u[-1:], self.axis_x, perm)
        return jnp.concatenate([head, u[:-1]], axis=0)

    def shift_xp(self, u):
        tail = jnp.zeros_like(u[:1])
        if self.axis_x is not None and self.nx > 1:
            perm = [(i, i - 1) for i in range(1, self.nx)]
            tail = jax.lax.ppermute(u[:1], self.axis_x, perm)
        return jnp.concatenate([u[1:], tail], axis=0)

    # -- y-axis (array axis 1) -------------------------------------------
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

    # -- z-axis (array axis 2, always local) ------------------------------
    def shift_zm(self, u):
        return jnp.concatenate([jnp.zeros_like(u[:, :, :1]), u[:, :, :-1]], axis=2)

    def shift_zp(self, u):
        return jnp.concatenate([u[:, :, 1:], jnp.zeros_like(u[:, :, :1])], axis=2)

    # -- reductions --------------------------------------------------------
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

    # -- whole-array access (direct-solve support; see Ops3 docstring) ------
    def gather_full(self, u):
        """All-gather the global array: x-planes over axis_x, y-planes over
        axis_y (z is never sharded).  O(N·M·P) ICI bytes per call — used only
        by the replicated direct solve, never on the matrix-free Krylov
        path."""
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
