"""Tensor-product grid on [0,1]² as an immutable JAX pytree.

Re-design of the reference ``Grid`` (reference src/prob1base.py:220-490) with
two deliberate departures that make it XLA/TPU-safe and shardable:

1. **No ``inf`` sentinels.**  The reference stores h[0] = k[0] = h_{1/2 ends} =
   inf so that divisions at the boundary produce 0.  Under XLA (and under AD)
   ``inf * 0 = nan`` is a real trap, so we store *reciprocal* metric arrays
   (``inv_hh`` etc.) that are exactly 0 where the reference had inf.  Every
   consumer multiplies instead of divides; results are bit-identical on the
   rows/columns where the reference's values are defined.

2. **Everything is a full (N+1, M+1) array.**  Inner products and quadrature
   use precomputed *masked weight* arrays (``w_H``, ``w_pk``, ``w_hp``) so that
   reductions are whole-array sums — no boundary slicing — which vectorizes on
   the VPU and shards cleanly (a sharded sum is ``psum`` of local sums).

All arrays live in the pytree (shardable); only N, M are static metadata.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Grid:
    # --- coordinates ---
    xx: jax.Array  # node x-coordinate, broadcast to (N+1, M+1)
    yy: jax.Array  # node y-coordinate
    xx_phalf: jax.Array  # x_{i+1/2} at [i, j] for i < N; 0 at i = N
    yy_phalf: jax.Array  # y_{j+1/2} at [i, j] for j < M; 0 at j = M
    # --- metric arrays (0-sentinel where the reference stored inf) ---
    hh: jax.Array  # h_i = x_i - x_{i-1} at [i, j] for i >= 1; 0 at i = 0
    kk: jax.Array  # k_j at [i, j] for j >= 1; 0 at j = 0
    hh_phalf: jax.Array  # h_{i+1/2} = (h_i + h_{i+1})/2, rows 1..N-1; 0 at 0, N
    kk_phalf: jax.Array  # k_{j+1/2}, cols 1..M-1; 0 at 0, M
    inv_hh: jax.Array  # 1/h_i; 0 at row 0
    inv_kk: jax.Array  # 1/k_j; 0 at col 0
    inv_hh_phalf: jax.Array  # 1/h_{i+1/2}; 0 at rows 0 and N
    inv_kk_phalf: jax.Array  # 1/k_{j+1/2}; 0 at cols 0 and M
    # --- masks and inner-product weights ---
    interior_mask: jax.Array  # 1 on 1..N-1 × 1..M-1, 0 on the boundary
    mask_x1: jax.Array  # 0 on row 0, 1 elsewhere
    mask_y1: jax.Array  # 0 on col 0, 1 elsewhere
    w_H: jax.Array  # h_{i+1/2} k_{j+1/2} on the interior, 0 elsewhere
    w_pk: jax.Array  # h_i k_{j+1/2} on rows 1..N × cols 1..M-1, 0 elsewhere
    w_hp: jax.Array  # h_{i+1/2} k_j on rows 1..N-1 × cols 1..M, 0 elsewhere
    red_mask: jax.Array  # 1 where (i+j) even — global parity, shard-safe
    color5: jax.Array  # (i + 2j) mod 5 — distance-1 stencil coloring, shard-safe
    # --- static metadata ---
    N: int = dataclasses.field(metadata=dict(static=True))
    M: int = dataclasses.field(metadata=dict(static=True))

    @property
    def full_shape(self):
        return (self.N + 1, self.M + 1)

    @property
    def interior_shape(self):
        return (self.N - 1, self.M - 1)

    def make_full0(self):
        # zeros_like (not zeros(full_shape)) so it stays correct on sharded
        # blocks inside shard_map, where self.xx is the local shard.
        return jnp.zeros_like(self.xx)

    # Reference name: ``null_bd_mask`` (src/prob1base.py:362, 376-385).
    @property
    def null_bd_mask(self):
        return self.interior_mask

    def const_with_nullbd(self, value):
        return value * self.interior_mask


def make_grid(x: np.ndarray, y: np.ndarray, dtype=None) -> Grid:
    """Build a :class:`Grid` from 1-D node coordinate vectors.

    Mirrors the reference constructor (src/prob1base.py:221-362) including
    support for non-uniform spacings; all derived quantities are precomputed
    host-side with NumPy in f64 and shipped once to the device.
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    assert x.ndim == 1 and y.ndim == 1, "make_grid expects 1-D coordinate vectors"
    N = len(x) - 1
    M = len(y) - 1
    assert N >= 2 and M >= 2, "grid needs at least one interior point per axis"
    assert np.all(np.diff(x) > 0) and np.all(np.diff(y) > 0)

    xx, yy = np.meshgrid(x, y, indexing="ij")

    # Staggered midpoints; last row/col zeroed exactly like the reference
    # (src/prob1base.py:250-253).
    xx_phalf = np.zeros_like(xx)
    xx_phalf[:-1, :] = 0.5 * (xx[:-1, :] + xx[1:, :])
    yy_phalf = np.zeros_like(yy)
    yy_phalf[:, :-1] = 0.5 * (yy[:, :-1] + yy[:, 1:])

    # Spacings with 0 sentinel (reference uses inf; see module docstring).
    h = np.concatenate([[0.0], np.diff(x)])  # h[i] = x_i - x_{i-1}, i>=1
    k = np.concatenate([[0.0], np.diff(y)])
    # h_{i+1/2} = (h_i + h_{i+1})/2 for 1 <= i <= N-1; 0 at i = 0, N.
    h_phalf = np.zeros(N + 1)
    h_phalf[1:N] = 0.5 * (h[1:N] + h[2 : N + 1])
    k_phalf = np.zeros(M + 1)
    k_phalf[1:M] = 0.5 * (k[1:M] + k[2 : M + 1])

    def bx(v):  # broadcast a length-(N+1) x-vector over columns
        return np.broadcast_to(v[:, None], (N + 1, M + 1)).copy()

    def by(v):  # broadcast a length-(M+1) y-vector over rows
        return np.broadcast_to(v[None, :], (N + 1, M + 1)).copy()

    hh = bx(h)
    kk = by(k)
    hh_phalf = bx(h_phalf)
    kk_phalf = by(k_phalf)

    def safe_recip(a):
        out = np.zeros_like(a)
        nz = a != 0.0
        out[nz] = 1.0 / a[nz]
        return out

    interior_mask = np.zeros((N + 1, M + 1))
    interior_mask[1:-1, 1:-1] = 1.0
    mask_x1 = np.ones((N + 1, M + 1))
    mask_x1[0, :] = 0.0
    mask_y1 = np.ones((N + 1, M + 1))
    mask_y1[:, 0] = 0.0

    # Masked inner-product weights (see inner_products.py for the defining sums;
    # reference src/prob1base.py:387-433).
    w_H = hh_phalf * kk_phalf * interior_mask
    w_pk = np.zeros((N + 1, M + 1))
    w_pk[1:, 1:-1] = hh[1:, 1:-1] * kk_phalf[1:, 1:-1]
    w_hp = np.zeros((N + 1, M + 1))
    w_hp[1:-1, 1:] = hh_phalf[1:-1, 1:] * kk[1:-1, 1:]

    ii, jj = np.meshgrid(np.arange(N + 1), np.arange(M + 1), indexing="ij")
    red_mask = ((ii + jj) % 2 == 0).astype(np.float64)
    # 5-coloring where a node and its 4 axis neighbors all get distinct
    # colors: the neighbor at offset (a, b) has color (c + a + 2b) mod 5.
    color5 = ((ii + 2 * jj) % 5).astype(np.int32)

    # metrics are always COMPUTED in host float64 above; dtype only controls
    # the device representation (None = f64 under x64, f32 in production mode)
    dev = lambda a: jnp.asarray(a, dtype=dtype or jnp.result_type(float))
    return Grid(
        xx=dev(xx),
        yy=dev(yy),
        xx_phalf=dev(xx_phalf),
        yy_phalf=dev(yy_phalf),
        hh=dev(hh),
        kk=dev(kk),
        hh_phalf=dev(hh_phalf),
        kk_phalf=dev(kk_phalf),
        inv_hh=dev(safe_recip(hh)),
        inv_kk=dev(safe_recip(kk)),
        inv_hh_phalf=dev(safe_recip(hh_phalf)),
        inv_kk_phalf=dev(safe_recip(kk_phalf)),
        interior_mask=dev(interior_mask),
        mask_x1=dev(mask_x1),
        mask_y1=dev(mask_y1),
        w_H=dev(w_H),
        w_pk=dev(w_pk),
        w_hp=dev(w_hp),
        red_mask=dev(red_mask),
        color5=jnp.asarray(color5),
        N=N,
        M=M,
    )


def make_uniform_grid(N: int, M: int, dtype=None) -> Grid:
    """Uniform grid on [0,1]² (reference src/prob1base.py:487-490)."""
    return make_grid(np.linspace(0.0, 1.0, N + 1), np.linspace(0.0, 1.0, M + 1), dtype)
