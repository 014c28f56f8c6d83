"""Exact structured direct solve of assembled 7-point-stencil systems.

The 3-D front-end of :mod:`na_dd_tpu.ops.direct_solve`: the same **block
cyclic reduction over dense blocks** (the TPU-shaped counterpart of the
reference's SuperLU ``spsolve``, src/prob1base.py:2088-2130 — the reference
itself has no 3-D discretization; this extends the framework's
beyond-reference 3-D model), with one block per interior *x-plane* instead of
per grid row.  Writing the interior Stencil7 system block-tridiagonally over
x-planes,

    A_i x_{i-1} + B_i x_i + C_i x_{i+1} = b_i,    x_i in R^m,  m = (M-1)(P-1)

the diagonal blocks B_i carry the in-plane 5-point (y, z) couplings (c0 on
the diagonal, czm/czp one flattened slot away, cym/cyp one z-row = P-1 slots
away) and A_i/C_i are diagonal (the x-couplings cxm/cxp) — exactly the 2-D
structure with "row" -> "plane".  The generic dense-block BCR
(:func:`na_dd_tpu.ops.direct_solve.block_tridiag_solve_bcr`), the pow2
padding and the pivoted batched Gauss–Jordan f64 inverse are reused verbatim:
the solver never sees the dimension, only dense (n, m, m) blocks.

Cost/feasibility: O(N·m³) = O(N⁷) FLOPs and (n, m, m) dense blocks — at
N=16 the blocks are (15, 225, 225) (~6 MB f64), at N=32 (31, 961, 961)
(~230 MB f64 per block array, ~3 arrays + the BCR level stack).  Like the
2-D direct mode this is the stiffness-independent robustness backstop and
the exactness reference for solver validation, NOT the default; the Krylov
solvers remain far cheaper on the study protocols.  Select with
``linear_solver="direct"`` on any 3-D PC integrator (env
``NA_DD_TPU_SOLVER=direct``); composes with ``precision="mixed"`` (f32 BCR
passes under f64 iterative refinement).
"""

from __future__ import annotations

import jax.numpy as jnp

from na_dd_tpu.ops.direct_solve import _pad_pow2, block_tridiag_solve_bcr
from na_dd_tpu.three_d.diffusion import Stencil7


def _dense_blocks3(st: Stencil7, b, mask):
    """Interior block-tridiagonal system from full-grid Stencil7 planes.

    Returns (A, B, C, rhs) with A, C diagonal stored dense: shapes
    (n, m, m), (n, m, m), (n, m, m), (n, m) for an (n+2, My, Pz) full grid
    with m = (My-2)(Pz-2) flattened interior (y, z) nodes per x-plane
    (z fastest — the natural C-order flatten of the (x, y, z) arrays).
    Rows with mask == 0 become identity equations with zero rhs (their
    couplings are already zero in every Newton-plane assembly — the planes
    carry interior-mask factors — but we overwrite defensively so the solve
    is well-posed for ANY masked stencil)."""
    sl = (slice(1, -1), slice(1, -1), slice(1, -1))
    alive = mask[sl] > 0
    c0 = jnp.where(alive, st.c0[sl], 1.0)
    cxm = jnp.where(alive, st.cxm[sl], 0.0)
    cxp = jnp.where(alive, st.cxp[sl], 0.0)
    cym = jnp.where(alive, st.cym[sl], 0.0)
    cyp = jnp.where(alive, st.cyp[sl], 0.0)
    czm = jnp.where(alive, st.czm[sl], 0.0)
    czp = jnp.where(alive, st.czp[sl], 0.0)
    rhs = jnp.where(alive, b[sl], 0.0)

    n, my, pz = c0.shape
    m = my * pz
    flat = lambda a: a.reshape(n, m)  # noqa: E731

    # The z couplings sit one flattened slot away, so a plain offset-diagonal
    # assignment would WRAP the k=0 / k=pz-1 entries into the neighbouring
    # y-row.  Those entries couple to the boundary frame and are zero in
    # every Newton assembly; zero them explicitly so the wrap can never
    # corrupt a defensively-masked system either.
    k = jnp.arange(pz)
    czm = jnp.where(k[None, None, :] == 0, 0.0, czm)
    czp = jnp.where(k[None, None, :] == pz - 1, 0.0, czp)

    j = jnp.arange(m)
    B = jnp.zeros((n, m, m), dtype=c0.dtype)
    B = B.at[:, j, j].set(flat(c0))
    B = B.at[:, j[1:], j[:-1]].set(flat(czm)[:, 1:])
    B = B.at[:, j[:-1], j[1:]].set(flat(czp)[:, :-1])
    # cym[i, jj, kk] couples x[i, jj-1, kk]: flattened column j - pz.  The
    # first pz rows (jj = 0) couple to the boundary frame — the offset
    # slicing skips them, mirroring the 2-D jj=0 case.
    B = B.at[:, j[pz:], j[:-pz]].set(flat(cym)[:, pz:])
    B = B.at[:, j[:-pz], j[pz:]].set(flat(cyp)[:, :-pz])
    A = jnp.zeros((n, m, m), dtype=c0.dtype).at[:, j, j].set(flat(cxm))
    C = jnp.zeros((n, m, m), dtype=c0.dtype).at[:, j, j].set(flat(cxp))
    return A, B, C, flat(rhs)


def stencil7_solve_direct(st: Stencil7, b, mask):
    """Exact direct solve of ``st @ x = b`` on the masked interior.

    Full-grid arrays in and out; x is 0 wherever ``mask`` is 0 (and on the
    boundary frame).  The drop-in exact counterpart of the Krylov solvers —
    the 3-D twin of :func:`na_dd_tpu.ops.direct_solve.stencil5_solve_direct`.
    """
    A, B, C, rhs = _dense_blocks3(st, b, mask)
    A, B, C, rhs = _pad_pow2(A, B, C, rhs)
    n_int = st.c0.shape[0] - 2
    x_int = block_tridiag_solve_bcr(A, B, C, rhs)[:n_int]
    x = jnp.zeros_like(b)
    x_int = x_int.reshape(n_int, b.shape[1] - 2, b.shape[2] - 2)
    x = x.at[1:-1, 1:-1, 1:-1].set(x_int)
    return x * mask


def stencil7_solve_direct_ops(ops, st: Stencil7, b, mask):
    """Location-transparent direct solve: exact on LOCAL_OPS3 and inside a
    ``shard_map`` region alike.

    BCR addresses whole x-planes with raw indexing, so under sharding this
    *replicates* the solve — all-gather the seven stencil planes, the rhs and
    the mask (``Ops3.gather_full``: x-planes over the mesh's x axis, y-planes
    over y; z is never sharded), run the full-grid BCR locally, and slice
    this device's shard back out.  The gathered system is bitwise the
    single-device one, so sharded-direct == local-direct; same rationale as
    :func:`na_dd_tpu.ops.direct_solve.stencil5_solve_direct_ops`."""
    st_full = Stencil7(*(ops.gather_full(p) for p in st))
    b_full = ops.gather_full(b)
    mask_full = ops.gather_full(mask)
    x_full = stencil7_solve_direct(st_full, b_full, mask_full)
    return ops.local_slice(x_full)
