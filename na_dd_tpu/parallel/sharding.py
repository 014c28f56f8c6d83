"""Mesh construction and data placement for domain-decomposed runs."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from na_dd_tpu.ops.grid import Grid


def make_mesh(shape: Sequence[int] = None, axis_names: Sequence[str] = ("x",), devices=None) -> Mesh:
    """Build a device mesh; defaults to a 1-D mesh over all devices."""
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),)
    dev_array = np.asarray(devices).reshape(tuple(shape))
    return Mesh(dev_array, tuple(axis_names))


def grid_pspec(axis_x: Optional[str] = "x", axis_y: Optional[str] = None) -> P:
    """PartitionSpec for every (N+1, M+1) array in the Grid/State pytrees."""
    return P(axis_x, axis_y)


def shard_grid_and_state(mesh: Mesh, grid: Grid, state, *, axis_x="x", axis_y=None):
    """Place a grid and state on the mesh with row (and optionally column)
    sharding.  Requires (N+1) % mesh.shape[axis_x] == 0 (and likewise in y)."""
    spec = grid_pspec(axis_x, axis_y)
    sharding = NamedSharding(mesh, spec)
    nx = mesh.shape[axis_x] if axis_x else 1
    ny = mesh.shape[axis_y] if axis_y else 1
    assert (grid.N + 1) % nx == 0, (
        f"rows (N+1)={grid.N + 1} must divide evenly over {nx} shards"
    )
    assert (grid.M + 1) % ny == 0, (
        f"cols (M+1)={grid.M + 1} must divide evenly over {ny} shards"
    )
    put = lambda a: jax.device_put(a, sharding)
    return jax.tree.map(put, grid), jax.tree.map(put, state)
