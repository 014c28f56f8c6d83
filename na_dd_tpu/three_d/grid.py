"""Tensor-product grid on [0,1]³ as an immutable JAX pytree.

The 3-D counterpart of :mod:`na_dd_tpu.ops.grid`, with the same two design
decisions that make the 2-D grid XLA/TPU-safe and shardable:

1. **No ``inf`` sentinels** — reciprocal metric arrays (``inv_hh`` etc.)
   that are exactly 0 where a division would hit the boundary, so every
   consumer multiplies (``inf * 0 = nan`` traps never arise under AD/XLA).
2. **Everything is a full (N+1, M+1, P+1) array** — quadrature uses the
   precomputed masked weight ``w_H`` so reductions are whole-array sums
   (``psum`` of local sums under sharding; no boundary slicing).

Carries everything the 3-D model-physics layer needs (metrics, masks, w_H,
staggered midpoints + dual-cell widths for the 27-point quadrature); the 2-D
grid's staggered gradient-norm weights (w_pk / w_hp) generalize the same way
when needed.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Grid3:
    # --- coordinates (broadcast to the full (N+1, M+1, P+1) shape) ---
    xx: jax.Array
    yy: jax.Array
    zz: jax.Array
    # --- staggered midpoints (0 at the last plane, like the 2-D grid) ---
    xx_phalf: jax.Array  # x_{i+1/2} at [i,:,:] for i < N; 0 at i = N
    yy_phalf: jax.Array  # y_{j+1/2}; 0 at j = M
    zz_phalf: jax.Array  # z_{k+1/2}; 0 at k = P
    # --- dual-cell widths (0-sentinel at the boundary planes) ---
    hh_phalf: jax.Array  # h_{i+1/2} = (h_i + h_{i+1})/2; 0 at i = 0, N
    kk_phalf: jax.Array  # k_{j+1/2}; 0 at j = 0, M
    ll_phalf: jax.Array  # l_{k+1/2}; 0 at k = 0, P
    # --- metric arrays (0-sentinel; see module docstring) ---
    inv_hh: jax.Array  # 1/h_i at [i,:,:]; 0 at i = 0
    inv_kk: jax.Array  # 1/k_j; 0 at j = 0
    inv_ll: jax.Array  # 1/l_k; 0 at k = 0
    inv_hh_phalf: jax.Array  # 1/h_{i+1/2}; 0 at i = 0, N
    inv_kk_phalf: jax.Array  # 1/k_{j+1/2}; 0 at j = 0, M
    inv_ll_phalf: jax.Array  # 1/l_{k+1/2}; 0 at k = 0, P
    # --- masks and inner-product weights ---
    interior_mask: jax.Array  # 1 on the open interior, 0 on the boundary
    mask_x1: jax.Array  # 0 on plane i = 0, 1 elsewhere
    mask_y1: jax.Array  # 0 on plane j = 0
    mask_z1: jax.Array  # 0 on plane k = 0
    w_H: jax.Array  # h_{i+1/2} k_{j+1/2} l_{k+1/2} on the interior, 0 elsewhere
    # staggered gradient-norm weights (3-D extension of the 2-D w_pk / w_hp,
    # ops/grid.py:52-53): one per gradient component, supported where that
    # component of the staggered gradient is defined
    w_gx: jax.Array  # h_i k_{j+1/2} l_{k+1/2}; i in 1..N, j in 1..M-1, k in 1..P-1
    w_gy: jax.Array  # h_{i+1/2} k_j l_{k+1/2}; i in 1..N-1, j in 1..M, k in 1..P-1
    w_gz: jax.Array  # h_{i+1/2} k_{j+1/2} l_k; i in 1..N-1, j in 1..M-1, k in 1..P
    red_mask: jax.Array  # 1 where (i+j+k) even — 7-point stencils flip parity
    color7: jax.Array  # (i + 2j + 3k) mod 7 — distance-1 stencil coloring
    # --- static metadata ---
    N: int = dataclasses.field(metadata=dict(static=True))
    M: int = dataclasses.field(metadata=dict(static=True))
    P: int = dataclasses.field(metadata=dict(static=True))

    @property
    def full_shape(self):
        return (self.N + 1, self.M + 1, self.P + 1)

    def make_full0(self):
        # zeros_like (not zeros(full_shape)) so it stays correct on sharded
        # blocks inside shard_map, where self.xx is the local shard.
        return jnp.zeros_like(self.xx)


def make_grid3(x: np.ndarray, y: np.ndarray, z: np.ndarray, dtype=None) -> Grid3:
    """Build a :class:`Grid3` from 1-D node coordinate vectors (non-uniform
    spacings supported; all metrics precomputed host-side in f64)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    assert x.ndim == y.ndim == z.ndim == 1
    N, M, P = len(x) - 1, len(y) - 1, len(z) - 1
    assert min(N, M, P) >= 2, "grid needs at least one interior point per axis"
    assert np.all(np.diff(x) > 0) and np.all(np.diff(y) > 0) and np.all(np.diff(z) > 0)

    shape = (N + 1, M + 1, P + 1)
    xx, yy, zz = np.meshgrid(x, y, z, indexing="ij")

    def spacings(c):
        n = len(c) - 1
        h = np.concatenate([[0.0], np.diff(c)])  # h[i] = c_i - c_{i-1}, i>=1
        h_phalf = np.zeros(n + 1)
        h_phalf[1:n] = 0.5 * (h[1:n] + h[2 : n + 1])
        return h, h_phalf

    h, h_phalf = spacings(x)
    k, k_phalf = spacings(y)
    l, l_phalf = spacings(z)

    def midpoints(c):
        # c_{i+1/2} for i < n; 0 at the last node (2-D grid convention,
        # ops/grid.py:99-104).
        out = np.zeros_like(c)
        out[:-1] = 0.5 * (c[:-1] + c[1:])
        return out

    x_phalf, y_phalf, z_phalf = midpoints(x), midpoints(y), midpoints(z)

    def safe_recip(a):
        out = np.zeros_like(a)
        nz = a != 0.0
        out[nz] = 1.0 / a[nz]
        return out

    def bx(v):
        return np.broadcast_to(v[:, None, None], shape).copy()

    def by(v):
        return np.broadcast_to(v[None, :, None], shape).copy()

    def bz(v):
        return np.broadcast_to(v[None, None, :], shape).copy()

    interior_mask = np.zeros(shape)
    interior_mask[1:-1, 1:-1, 1:-1] = 1.0
    mask_x1 = np.ones(shape)
    mask_x1[0] = 0.0
    mask_y1 = np.ones(shape)
    mask_y1[:, 0] = 0.0
    mask_z1 = np.ones(shape)
    mask_z1[:, :, 0] = 0.0

    w_H = bx(h_phalf) * by(k_phalf) * bz(l_phalf) * interior_mask

    # Staggered gradient weights: the 0-sentinels of h (at i=0) and h_phalf
    # (at 0 and N) already restrict each product to exactly its defining
    # index range — no extra masking needed (same trick as w_H).
    w_gx = bx(h) * by(k_phalf) * bz(l_phalf)
    w_gy = bx(h_phalf) * by(k) * bz(l_phalf)
    w_gz = bx(h_phalf) * by(k_phalf) * bz(l)

    ii, jj, kk = np.meshgrid(
        np.arange(N + 1), np.arange(M + 1), np.arange(P + 1), indexing="ij"
    )
    red_mask = ((ii + jj + kk) % 2 == 0).astype(np.float64)
    # 7-coloring where a node and its 6 axis neighbors all get distinct
    # colors: the neighbor at offset (a, b, c) has color (q + a + 2b + 3c)
    # mod 7 — the offsets {0, ±1, ±2, ±3} are pairwise distinct mod 7
    # (3-D twin of the 2-D (i + 2j) mod 5 coloring, ops/grid.py:149-151).
    color7 = ((ii + 2 * jj + 3 * kk) % 7).astype(np.int32)

    dev = lambda a: jnp.asarray(a, dtype=dtype or jnp.result_type(float))
    return Grid3(
        xx=dev(xx),
        yy=dev(yy),
        zz=dev(zz),
        xx_phalf=dev(bx(x_phalf)),
        yy_phalf=dev(by(y_phalf)),
        zz_phalf=dev(bz(z_phalf)),
        hh_phalf=dev(bx(h_phalf)),
        kk_phalf=dev(by(k_phalf)),
        ll_phalf=dev(bz(l_phalf)),
        inv_hh=dev(bx(safe_recip(h))),
        inv_kk=dev(by(safe_recip(k))),
        inv_ll=dev(bz(safe_recip(l))),
        inv_hh_phalf=dev(bx(safe_recip(h_phalf))),
        inv_kk_phalf=dev(by(safe_recip(k_phalf))),
        inv_ll_phalf=dev(bz(safe_recip(l_phalf))),
        interior_mask=dev(interior_mask),
        mask_x1=dev(mask_x1),
        mask_y1=dev(mask_y1),
        mask_z1=dev(mask_z1),
        w_H=dev(w_H),
        w_gx=dev(w_gx),
        w_gy=dev(w_gy),
        w_gz=dev(w_gz),
        red_mask=dev(red_mask),
        color7=jnp.asarray(color7),
        N=N,
        M=M,
        P=P,
    )


def make_uniform_grid3(N: int, M: int, P: int, dtype=None) -> Grid3:
    """Uniform grid on [0,1]³."""
    return make_grid3(
        np.linspace(0.0, 1.0, N + 1),
        np.linspace(0.0, 1.0, M + 1),
        np.linspace(0.0, 1.0, P + 1),
        dtype,
    )
