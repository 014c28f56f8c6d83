"""Exact structured direct solve of assembled 5-point-stencil systems.

The reference factorizes its 5-diagonal Newton Jacobians with SuperLU
(``scipy.sparse.linalg.spsolve``, reference src/prob1base.py:2088-2130) — an
exact direct solve whose accuracy is independent of conditioning.  The
framework's default TPU solver is Jacobi-BiCGStab (ops/linsolve.py), which is
far cheaper for the well-conditioned small-dt study protocols but whose
iteration budget must grow like sqrt(s) with the stiffness number
s = 4 dt D_max / h² (see harness/studies.choose_krylov_unroll).

This module is the TPU-native *direct* counterpart: **block cyclic reduction
(BCR) over dense row-blocks**.  Writing the interior system as a block
tridiagonal system over grid rows,

    A_i x_{i-1} + B_i x_i + C_i x_{i+1} = b_i,      i = 1..n,  x_i in R^m,

with B_i tridiagonal (the in-row y-couplings) and A_i, C_i diagonal (the
x-couplings), BCR eliminates the odd-indexed block rows level by level:

    B'_e = B_e - A_e B_{e-1}^{-1} C_{e-1} - C_e B_{e+1}^{-1} A_{e+1}
    A'_e = -A_e B_{e-1}^{-1} A_{e-1}
    C'_e = -C_e B_{e+1}^{-1} C_{e+1}
    b'_e = b_e - A_e B_{e-1}^{-1} b_{e-1} - C_e B_{e+1}^{-1} b_{e+1}

halving the block count each level.  Unlike scalar cyclic reduction (Buneman)
this needs no constant-coefficient assumption — it is exact for every Newton
operator in the framework, on non-uniform grids, for all three field solves.

TPU rationale: a sparse LU is sequential and irregular — the worst possible
shape for the MXU.  BCR is log2(n) *batched* stages of dense m×m inverses and
matmuls (``jnp.linalg.inv`` + ``einsum``): the FLOPs land on the systolic
array, the sequential depth is 8 for N=256 instead of N for a banded LU
sweep.  The cost is O(N·M³) FLOPs per solve — far more than a converged
BiCGStab on the smooth study protocols, so this is NOT the default; it is the
robustness backstop for stiff regimes (coarse-dt temporal ladders where the
Krylov budget tier reaches 96-160) and the exactness reference for solver
validation.  Select with ``linear_solver="direct"`` on the PC integrator (env
``NA_DD_TPU_SOLVER=direct``).

Mixed precision: an f32 BCR inside the iterative-refinement wrapper
(integrators/pc_trapezoidal.py, ``precision="mixed"``) contracts the f64
residual by ~f32-eps per pass — faster per pass than budget-160 f32 Krylov
and budget-independent.

Masked (dead) rows — the batched pad-to-max ladders (harness/batched_ladder)
and boundary rows — are replaced by identity equations, so the solver is
exact on any ``interior_mask`` pattern and vmaps over ladder levels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from na_dd_tpu.ops.linsolve import Stencil5


def inv_gauss_jordan(M):
    """Batched m×m inverse by Gauss–Jordan elimination with partial pivoting.

    Built from elementwise/gather ops only — no ``LuDecomposition`` HLO.  The
    TPU backend implements LU only for f32/c64, so ``jnp.linalg.inv`` on f64
    fails to compile there ("Only F32 and C64 types are implemented in
    LuDecomposition"); this routine keeps the f64 direct path runnable under
    the TPU's emulated f64.  m sequential ``fori_loop`` steps, each a batched
    rank-1 update — O(m³) like LU, fully batched over the leading axis."""
    batch, m, _ = M.shape
    dt = M.dtype
    eye = jnp.broadcast_to(jnp.eye(m, dtype=dt), M.shape)
    A = jnp.concatenate([M, eye], axis=2)  # (batch, m, 2m) augmented
    bidx = jnp.arange(batch)
    ridx = jnp.arange(m)

    def body(j, A):
        # partial pivot: strongest remaining entry in column j (rows >= j)
        col = A[:, :, j]
        mag = jnp.where(ridx[None, :] >= j, jnp.abs(col), jnp.asarray(-1.0, dt))
        p = jnp.argmax(mag, axis=1)
        row_p = A[bidx, p]
        row_j = A[:, j]
        A = A.at[bidx, p].set(row_j)
        A = A.at[:, j].set(row_p / row_p[:, j][:, None])
        piv = A[:, j]
        factors = A[:, :, j]
        update = factors[:, :, None] * piv[:, None, :]
        keep = (ridx != j)[None, :, None]
        return A - jnp.where(keep, update, jnp.asarray(0.0, dt))

    A = lax.fori_loop(0, m, body, A)
    return A[:, :, m:]


def _inv(M):
    """Batched inverse: LAPACK/XLA LU where available, Gauss–Jordan where the
    backend lacks an f64 LU expansion (every non-CPU backend; the axon TPU
    plugin's backend name is not "tpu", so test for cpu)."""
    if M.dtype == jnp.float64 and jax.default_backend() != "cpu":
        return inv_gauss_jordan(M)
    return jnp.linalg.inv(M)


def _dense_blocks(st: Stencil5, b, mask):
    """Interior block-tridiagonal system from full-grid stencil planes.

    Returns (A, B, C, rhs) with A, C diagonal stored dense: shapes
    (n, m, m), (n, m, m), (n, m, m), (n, m) for an (n+2, m+2) full grid.
    Rows with mask == 0 become identity equations with zero rhs (their
    couplings are already zero in every Newton-plane assembly — the planes
    carry interior-mask factors — but we overwrite defensively so the solve
    is well-posed for ANY masked stencil)."""
    sl = (slice(1, -1), slice(1, -1))
    m2 = mask[sl]
    alive = m2 > 0
    c0 = jnp.where(alive, st.c0[sl], 1.0)
    cym = jnp.where(alive, st.cym[sl], 0.0)
    cyp = jnp.where(alive, st.cyp[sl], 0.0)
    axm = jnp.where(alive, st.cxm[sl], 0.0)
    cxp = jnp.where(alive, st.cxp[sl], 0.0)
    rhs = jnp.where(alive, b[sl], 0.0)

    n, m = c0.shape
    j = jnp.arange(m)
    B = jnp.zeros((n, m, m), dtype=c0.dtype)
    B = B.at[:, j, j].set(c0)
    # cym[i, jj] couples x[i, jj-1]: row jj, col jj-1 (jj >= 1; the jj=0 entry
    # couples to the boundary column and is zero by construction)
    B = B.at[:, j[1:], j[:-1]].set(cym[:, 1:])
    B = B.at[:, j[:-1], j[1:]].set(cyp[:, :-1])
    A = jnp.zeros((n, m, m), dtype=c0.dtype).at[:, j, j].set(axm)
    C = jnp.zeros((n, m, m), dtype=c0.dtype).at[:, j, j].set(cxp)
    return A, B, C, rhs


def _pad_pow2(A, B, C, b):
    """Pad the block count to 2^k - 1 with decoupled identity equations."""
    n, m, _ = B.shape
    k = 1
    while 2**k - 1 < n:
        k += 1
    n_p = 2**k - 1
    if n_p == n:
        return A, B, C, b
    pad = n_p - n
    eye = jnp.broadcast_to(jnp.eye(m, dtype=B.dtype), (pad, m, m))
    zero = jnp.zeros((pad, m, m), dtype=B.dtype)
    A = jnp.concatenate([A, zero], axis=0)
    B = jnp.concatenate([B, eye], axis=0)
    C = jnp.concatenate([C, zero], axis=0)
    b = jnp.concatenate([b, jnp.zeros((pad, m), dtype=b.dtype)], axis=0)
    return A, B, C, b


# HIGHEST: TPU einsum defaults to bf16 MXU passes, which would degrade the
# f32 BCR from ~f32 accuracy (kappa * 6e-8 per refinement pass) to ~bf16
# accuracy (kappa * 4e-3) and stall the mixed-precision refinement loop short
# of the f64 tolerance.  Full-f32 passes cost 3 MXU passes per matmul — noise
# next to the O(N m^3) solve itself.
_PREC = lax.Precision.HIGHEST


def _mm(X, Y):
    return jnp.einsum("bij,bjk->bik", X, Y, precision=_PREC)


def _mv(X, y):
    return jnp.einsum("bij,bj->bi", X, y, precision=_PREC)


def block_tridiag_solve_bcr(A, B, C, b):
    """Solve the block tridiagonal system by block cyclic reduction.

    A, B, C: (n, m, m) sub/main/super diagonal blocks (A[0] and C[-1] are
    ignored — there is nothing to their left/right); b: (n, m).  Requires
    n = 2^k - 1 (use :func:`_pad_pow2`).  Fully batched per level; log2(n+1)
    sequential stages, each a handful of batched inverses/matmuls.
    """
    n = B.shape[0]
    assert (n + 1) & n == 0, f"block count must be 2^k - 1, got {n}"

    # -------- forward elimination: drop odd (0-based even) block rows ------
    stack = []
    while n > 1:
        A_o, B_o, C_o, b_o = A[0::2], B[0::2], C[0::2], b[0::2]
        A_e, B_e, C_e, b_e = A[1::2], B[1::2], C[1::2], b[1::2]
        inv_o = _inv(B_o)
        stack.append((inv_o, A_o, C_o, b_o))
        G = _mm(A_e, inv_o[:-1])  # couples even row e to odd row e-1
        H = _mm(C_e, inv_o[1:])  # couples even row e to odd row e+1
        B = B_e - _mm(G, C_o[:-1]) - _mm(H, A_o[1:])
        A = -_mm(G, A_o[:-1])
        C = -_mm(H, C_o[1:])
        b = b_e - _mv(G, b_o[:-1]) - _mv(H, b_o[1:])
        n = (n - 1) // 2

    x = _mv(_inv(B[:1]), b[:1])

    # -------- back substitution ------------------------------------------
    for inv_o, A_o, C_o, b_o in reversed(stack):
        m = x.shape[1]
        zero = jnp.zeros((1, m), dtype=x.dtype)
        x_prev = jnp.concatenate([zero, x], axis=0)  # even row left of odd j
        x_next = jnp.concatenate([x, zero], axis=0)  # even row right of odd j
        x_o = _mv(inv_o, b_o - _mv(A_o, x_prev) - _mv(C_o, x_next))
        n_full = x_o.shape[0] + x.shape[0]
        full = jnp.zeros((n_full, m), dtype=x.dtype)
        full = full.at[0::2].set(x_o).at[1::2].set(x)
        x = full
    return x


def stencil5_solve_direct(st: Stencil5, b, mask):
    """Exact direct solve of ``st @ x = b`` on the masked interior.

    Full-grid arrays in and out; x is 0 wherever ``mask`` is 0 (and on the
    boundary frame).  The drop-in exact counterpart of the Krylov solvers in
    ops/linsolve.py — same contract as the reference's
    ``newton_step_inner_Fx_eq_C``'s ``spsolve`` (src/prob1base.py:2109-2130),
    reshaped for the MXU (see module docstring)."""
    A, B, C, rhs = _dense_blocks(st, b, mask)
    A, B, C, rhs = _pad_pow2(A, B, C, rhs)
    n_int = st.c0.shape[0] - 2
    x_int = block_tridiag_solve_bcr(A, B, C, rhs)[:n_int]
    x = jnp.zeros_like(b)
    x = x.at[1:-1, 1:-1].set(x_int)
    return x * mask


def stencil5_solve_direct_ops(ops, st: Stencil5, b, mask):
    """Location-transparent direct solve: exact on LOCAL_OPS and inside a
    ``shard_map`` region alike.

    BCR addresses whole grid rows with raw indexing, so it cannot run on a
    shard the way the matrix-free Krylov solvers do.  Under sharding this
    wrapper *replicates* the solve: all-gather the five stencil planes, the
    rhs, and the mask to every device (``Ops.gather_full``), run the full-grid
    BCR locally, and slice this device's shard back out.  Each device spends
    the full O(N·M³) solve FLOPs — acceptable for the robustness backstop the
    direct mode is (module docstring), and exact: the gathered system is
    bitwise the single-device system, so sharded-direct == local-direct.
    On LOCAL_OPS gather/slice are identity and this is
    :func:`stencil5_solve_direct` verbatim."""
    st_full = Stencil5(*(ops.gather_full(p) for p in st))
    b_full = ops.gather_full(b)
    mask_full = ops.gather_full(mask)
    x_full = stencil5_solve_direct(st_full, b_full, mask_full)
    return ops.local_slice(x_full)
