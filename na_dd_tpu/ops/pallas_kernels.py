"""Pallas TPU kernels for the hot stencil operations.

The per-iteration work of the Krylov solvers is the assembled 5-point stencil
apply (:class:`na_dd_tpu.ops.linsolve.Stencil5`).  XLA already fuses the jnp
formulation well; this kernel exists for the f32 production path, where
keeping the five coefficient planes and the operand resident in VMEM across
the whole fused region removes the remaining HBM round-trips, and as the
pattern to extend toward a fully fused in-VMEM solver.

Notes:
* Single-block kernel: all six operand planes live in VMEM at once.  For the
  grid sizes of this model (N <= 1024 in f32) that is within the ~16 MB VMEM
  budget; an assertion guards the limit.
* Mosaic does not support f64 — on real TPU use this with the f32 production
  mode (NA_DD_TPU_X64=0).  Under ``interpret=True`` (tests) any dtype works.
* The shifted neighbor reads are realized as static slice + concatenate of a
  zero edge line (exactly the :mod:`na_dd_tpu.ops.shifts` semantics), which
  Mosaic lowers to cheap in-register shifts — value-level ``.at[].add``
  scatter updates are NOT used (scatter-add has no Mosaic TC lowering).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU builds too; guard anyway
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

_VMEM_LIMIT_BYTES = 14 * 1024 * 1024


def _stencil5_kernel(u_ref, c0_ref, cxm_ref, cxp_ref, cym_ref, cyp_ref, out_ref):
    u = u_ref[:]
    u_xm, u_xp, u_ym, u_yp = _shifted(u)
    out_ref[:] = (
        c0_ref[:] * u
        + cxm_ref[:] * u_xm
        + cxp_ref[:] * u_xp
        + cym_ref[:] * u_ym
        + cyp_ref[:] * u_yp
    )


def _shifted(u):
    """The four zero-inflow-shifted copies of u (shift-op semantics)."""
    zrow = jnp.zeros_like(u[:1, :])
    zcol = jnp.zeros_like(u[:, :1])
    u_xm = jnp.concatenate([zrow, u[:-1, :]], axis=0)
    u_xp = jnp.concatenate([u[1:, :], zrow], axis=0)
    u_ym = jnp.concatenate([zcol, u[:, :-1]], axis=1)
    u_yp = jnp.concatenate([u[:, 1:], zcol], axis=1)
    return u_xm, u_xp, u_ym, u_yp


def _make_bicgstab_kernel(iters: int, tol: float):
    def kernel(b_ref, c0_ref, cxm_ref, cxp_ref, cym_ref, cyp_ref,
               invd_ref, mask_ref, x_ref, iters_ref):
        c0, cxm, cxp, cym, cyp = (
            c0_ref[:], cxm_ref[:], cxp_ref[:], cym_ref[:], cyp_ref[:]
        )

        def matvec(w):
            u_xm, u_xp, u_ym, u_yp = _shifted(w)
            return c0 * w + cxm * u_xm + cxp * u_xp + cym * u_ym + cyp * u_yp

        # x0 = 0  =>  r0 = b; same masked-early-exit update (and iters_used
        # ordering) as bicgstab_unrolled
        x, iters_used, _r, _tol_sq = _bicgstab_inline(
            matvec, lambda r: r * invd_ref[:], b_ref[:], tol, iters
        )
        x_ref[:] = x * mask_ref[:]
        iters_ref[0] = iters_used

    return kernel


def _bicgstab_inline(matvec, minv, b, tol: float, iters: int,
                     *, loop: bool = False):
    """The masked-early-exit BiCGStab update as a value-level helper shared
    by the single-solve and fused triple-solve kernels (identical algebra to
    :func:`na_dd_tpu.ops.linsolve.bicgstab_unrolled` with x0 = 0).

    ``loop=True`` runs the iteration as an in-kernel ``lax.fori_loop`` over
    the SAME body (identical per-iteration algebra, so identical values):
    Mosaic's stack allocator only partially reuses temporaries across a
    Python-unrolled iteration chain, which blew the scoped-VMEM limit for
    3-D volume operands on real hardware (measured 2026-08-18: 63.96 MB
    stack vs the 14 MB limit at N=32, iters=48 — HTTP 500 from the compile
    helper); a fori_loop bounds the stack to one iteration's temporaries
    regardless of the unroll budget.  The 2-D kernels keep the unrolled
    form (hardware-validated bit-identical to ``bicgstab_unrolled``; plane
    temporaries are small enough that reuse never mattered)."""
    dt_ = b.dtype
    dot = lambda u, v: jnp.sum(u * v)
    eps_div = jnp.asarray(1e-300, dtype=dt_)
    # dtype-matched constants: weak 1.0/0.0 literals become f64 scalars
    # under x64, which Mosaic cannot lower (the mixed+pallas path traces
    # these kernels with x64 enabled)
    f_one = jnp.asarray(1.0, dt_)
    f_zero = jnp.asarray(0.0, dt_)

    def safe_div(num, den):
        den_ok = jnp.abs(den) > eps_div
        return jnp.where(den_ok, num / jnp.where(den_ok, den, f_one), f_zero), den_ok

    r = b
    rhat = r
    tol_sq = jnp.asarray(tol * tol, dt_) * dot(b, b)
    x = jnp.zeros_like(b)
    z = jnp.zeros_like(b)
    one = jnp.asarray(1.0, dt_)
    p, v = z, z
    rho = alpha = omega = one
    done = dot(r, r) <= tol_sq
    # int32 EXPLICITLY on both where-branches: under x64 mode (the mixed-
    # precision path) weak python ints materialize as int64, and Mosaic's
    # int64 lowering recurses without bound (measured RecursionError
    # lowering mixed+pallas on TPU)
    iters_used = jnp.asarray(0, jnp.int32)
    i32_zero = jnp.asarray(0, jnp.int32)
    i32_one = jnp.asarray(1, jnp.int32)

    def body(carry):
        x, r, p, v, rho, alpha, omega, done, iters_used = carry
        keep = lambda old, new: jnp.where(done, old, new)  # noqa: E731
        rho1 = dot(rhat, r)
        ratio, ok1 = safe_div(rho1, rho)
        aw, ok2 = safe_div(alpha, omega)
        beta = ratio * aw
        p_new = r + beta * (p - omega * v)
        phat = minv(p_new)
        v_new = matvec(phat)
        alpha_new, ok3 = safe_div(rho1, dot(rhat, v_new))
        s = r - alpha_new * v_new
        x_half = x + alpha_new * phat
        s_conv = dot(s, s) <= tol_sq

        shat = minv(s)
        t = matvec(shat)
        omega_new, ok4 = safe_div(dot(t, s), dot(t, t))
        x_full = x_half + omega_new * shat
        r_new = jnp.where(s_conv, s, s - omega_new * t)
        x_new = jnp.where(s_conv, x_half, x_full)

        breakdown = jnp.logical_not(ok1 & ok2 & ok3 & ok4)
        x = keep(x, x_new)
        r = keep(r, r_new)
        p = keep(p, p_new)
        v = keep(v, v_new)
        rho = keep(rho, rho1)
        alpha = keep(alpha, alpha_new)
        omega = keep(omega, omega_new)
        iters_used = iters_used + jnp.where(done, i32_zero, i32_one)
        done = done | s_conv | breakdown | (dot(r, r) <= tol_sq)
        return (x, r, p, v, rho, alpha, omega, done, iters_used)

    carry = (x, r, p, v, rho, alpha, omega, done, iters_used)
    if loop:
        # i32 bounds: Python-int bounds would make the loop counter i64
        # under x64 (Mosaic has no 64-bit; tests/test_pallas_kernels.py
        # asserts the traces stay 64-bit-clean)
        carry = jax.lax.fori_loop(
            jnp.asarray(0, jnp.int32),
            jnp.asarray(iters, jnp.int32),
            lambda _i, c: body(c),
            carry,
        )
    else:
        for _ in range(iters):
            carry = body(carry)
    x, r, iters_used = carry[0], carry[1], carry[8]

    return x, iters_used, r, tol_sq


def _make_triple_solve_kernel(iters: int, tol: float):
    """Kernel body for the fused triangular Newton sweep: the T, cl, cd
    solves AND the cross-coupling rhs updates between them run in one
    VMEM-resident program — 25 coefficient planes (3 Newton operators + 2
    coupling operators), the diagonal cl→cd coupling, three inverse
    diagonals and the mask co-resident on-chip, with no HBM round-trips
    between the solves (the reference's three sequential CSR solves,
    src/prob1base.py:2998-3115, as one kernel)."""

    def kernel(
        # Newton planes (c0, cxm, cxp, cym, cyp) x 3 variables
        jt0, jtxm, jtxp, jtym, jtyp,
        jl0, jlxm, jlxp, jlym, jlyp,
        jd0, jdxm, jdxp, jdym, jdyp,
        # coupling planes: dFcl/dT, dFcd/dT, plus diagonal dFcd/dcl
        ct0, ctxm, ctxp, ctym, ctyp,
        cd0, cdxm, cdxp, cdym, cdyp,
        dcdcl_ref,
        # rhs pieces, preconditioners, mask, dt scalar
        rhsT_ref, basecl_ref, basecd_ref,
        invdT_ref, invdcl_ref, invdcd_ref, mask_ref, dt_ref,
        # outputs
        dT_ref, dcl_ref, dcd_ref, iters_ref, res_ref, tolsq_ref,
    ):
        mask = mask_ref[:]
        dt_s = dt_ref[0]

        def stencil_apply(c0, cxm, cxp, cym, cyp, w):
            w_xm, w_xp, w_ym, w_yp = _shifted(w)
            return c0 * w + cxm * w_xm + cxp * w_xp + cym * w_ym + cyp * w_yp

        # --- T solve ---
        mv_T = lambda w: stencil_apply(jt0[:], jtxm[:], jtxp[:], jtym[:], jtyp[:], w)
        dT, it_T, r_T, tsq_T = _bicgstab_inline(
            mv_T, lambda r: r * invdT_ref[:], rhsT_ref[:] * mask, tol, iters
        )
        dT = dT * mask

        # --- cl rhs coupling + solve ---
        coup_cl = stencil_apply(ct0[:], ctxm[:], ctxp[:], ctym[:], ctyp[:], dT)
        rhs_cl = (basecl_ref[:] + dt_s * coup_cl) * mask
        mv_cl = lambda w: stencil_apply(jl0[:], jlxm[:], jlxp[:], jlym[:], jlyp[:], w)
        dcl, it_cl, r_cl, tsq_cl = _bicgstab_inline(
            mv_cl, lambda r: r * invdcl_ref[:], rhs_cl, tol, iters
        )
        dcl = dcl * mask

        # --- cd rhs coupling + solve ---
        coup_cd = (
            stencil_apply(cd0[:], cdxm[:], cdxp[:], cdym[:], cdyp[:], dT)
            + dcdcl_ref[:] * dcl
        )
        rhs_cd = (basecd_ref[:] + dt_s * coup_cd) * mask
        mv_cd = lambda w: stencil_apply(jd0[:], jdxm[:], jdxp[:], jdym[:], jdyp[:], w)
        dcd, it_cd, r_cd, tsq_cd = _bicgstab_inline(
            mv_cd, lambda r: r * invdcd_ref[:], rhs_cd, tol, iters
        )

        dT_ref[:] = dT
        dcl_ref[:] = dcl
        dcd_ref[:] = dcd * mask
        iters_ref[0] = it_T
        iters_ref[1] = it_cl
        iters_ref[2] = it_cd
        # recurrence-residual diagnostics (bicgstab_unrolled semantics)
        res_ref[0] = jnp.sum(r_T * r_T)
        res_ref[1] = jnp.sum(r_cl * r_cl)
        res_ref[2] = jnp.sum(r_cd * r_cd)
        tolsq_ref[0] = tsq_T
        tolsq_ref[1] = tsq_cl
        tolsq_ref[2] = tsq_cd

    return kernel


def triple_solve_fits(shape, dtype) -> bool:
    """VMEM predicate for :func:`triple_solve_pallas`: ~40 live planes/
    vectors (25 coefficient planes + rhs/precond/mask/solver state)."""
    return _footprint_fits(shape, dtype, 40)


def triple_solve_pallas(
    J_T, J_cl, J_cd, C_clT, C_cdT, d_cdcl,
    rhs_T, base_cl, base_cd,
    invd_T, invd_cl, invd_cd, mask, dt,
    *, tol: float, iters: int, interpret: bool = False,
):
    """The whole triangular Newton sweep's linear algebra as ONE kernel.

    Solves J_T·δT = rhs_T, then J_cl·δcl = base_cl + dt·C_clT·δT, then
    J_cd·δcd = base_cd + dt·(C_cdT·δT + d_cdcl ⊙ δcl), entirely in VMEM —
    each solve the same masked-early-exit BiCGStab as
    :func:`bicgstab_solve_pallas`.  Returns (δT, δcl, δcd, info) with
    per-solve iteration counts, recurrence-residual norms and convergence
    flags (``bicgstab_unrolled`` semantics), all read back through
    SMEM scalar outputs.
    """
    assert triple_solve_fits(rhs_T.shape, rhs_T.dtype), (
        "triple_solve_pallas exceeds the VMEM budget for this operand — "
        "callers must check triple_solve_fits() and fall back to the "
        "per-solve path"
    )
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        )
        spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        scalar_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    else:
        spec = pl.BlockSpec(memory_space=pl.ANY)
        scalar_spec = pl.BlockSpec(memory_space=pl.ANY)

    dt_arr = jnp.asarray(dt, rhs_T.dtype).reshape(1)
    planes = (
        list(J_T) + list(J_cl) + list(J_cd) + list(C_clT) + list(C_cdT)
        + [d_cdcl, rhs_T, base_cl, base_cd, invd_T, invd_cl, invd_cd, mask]
    )
    dT, dcl, dcd, iters_used, res_sq, tol_sq = pl.pallas_call(
        _make_triple_solve_kernel(int(iters), float(tol)),
        out_shape=[
            jax.ShapeDtypeStruct(rhs_T.shape, rhs_T.dtype),
            jax.ShapeDtypeStruct(rhs_T.shape, rhs_T.dtype),
            jax.ShapeDtypeStruct(rhs_T.shape, rhs_T.dtype),
            jax.ShapeDtypeStruct((3,), jnp.int32),
            jax.ShapeDtypeStruct((3,), rhs_T.dtype),
            jax.ShapeDtypeStruct((3,), rhs_T.dtype),
        ],
        in_specs=[spec] * len(planes) + [scalar_spec],
        out_specs=[spec, spec, spec, scalar_spec, scalar_spec, scalar_spec],
        interpret=interpret,
        **kwargs,
    )(*planes, dt_arr)
    info = {
        "iters": iters_used,
        "resnorm_sq": res_sq,
        "converged": res_sq <= tol_sq,
    }
    return dT, dcl, dcd, info


def _footprint_fits(shape, dtype, live_planes: int) -> bool:
    import numpy as np

    size = int(np.prod(shape))
    return size * np.dtype(dtype).itemsize * live_planes <= _VMEM_LIMIT_BYTES


def apply_fits(shape, dtype) -> bool:
    """Whether :func:`stencil5_apply_pallas` (7 live planes) fits VMEM."""
    return _footprint_fits(shape, dtype, 7)


def fused_solve_fits(shape, dtype) -> bool:
    """Whether :func:`bicgstab_solve_pallas`'s single-block VMEM footprint
    (~16 live planes/vectors) fits the budget for this operand; callers fall
    back to the apply-only kernel / jnp path when it does not."""
    return _footprint_fits(shape, dtype, 16)


def bicgstab_solve_pallas(
    stencil, b, inv_diag, mask, *, tol: float, iters: int, interpret: bool = False
):
    """Whole Jacobi-BiCGStab solve (x0 = 0, ``iters`` masked-early-exit
    iterations — the exact :func:`na_dd_tpu.ops.linsolve.bicgstab_unrolled`
    update) as ONE VMEM-resident Pallas kernel: every iterate stays on-chip
    for the entire solve, removing the per-iteration HBM boundary of the
    apply-only kernel.

    Returns ``(x, info)``; ``info["iters"]`` is the in-kernel effective
    iteration count (an SMEM scalar output, same semantics as
    ``bicgstab_unrolled``'s ``iters_used``) and the residual diagnostics are
    computed OUTSIDE the kernel from one extra stencil apply.
    """
    assert fused_solve_fits(b.shape, b.dtype), (
        "bicgstab_solve_pallas is a single-block kernel and this operand "
        "exceeds the VMEM budget — callers must check fused_solve_fits() "
        "and fall back to the apply-only kernel / jnp path"
    )
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        )
        spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        scalar_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    else:
        spec = pl.BlockSpec(memory_space=pl.ANY)
        scalar_spec = pl.BlockSpec(memory_space=pl.ANY)

    x, iters_used = pl.pallas_call(
        _make_bicgstab_kernel(int(iters), float(tol)),
        out_shape=[
            jax.ShapeDtypeStruct(b.shape, b.dtype),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ],
        in_specs=[spec] * 8,
        out_specs=[spec, scalar_spec],
        interpret=interpret,
        **kwargs,
    )(b, stencil.c0, stencil.cxm, stencil.cxp, stencil.cym, stencil.cyp,
      inv_diag, mask)

    r = b - stencil5_apply_pallas(stencil, x, interpret=interpret)
    rsq = jnp.sum(r * r)
    tol_sq = tol * tol * jnp.sum(b * b)
    return x, {
        "iters": iters_used[0],
        "resnorm_sq": rsq,
        "converged": rsq <= tol_sq,
    }


def _pick_row_tile(shape, dtype, live_planes: int = 7) -> int:
    """Largest power-of-two row-tile whose working set (``live_planes``
    row-blocks at padded lane width, DOUBLE-buffered) fits the VMEM budget;
    minimum 8 (the f32 sublane tile).

    The ×2 is Mosaic's grid pipelining: while program i computes, program
    i+1's blocks are prefetched, so every grid-mapped block needs two VMEM
    slots.  Without it the N=1024 f32 tiled apply budgeted 8.3 MB but XLA's
    scoped-vmem accounting demanded 15.9 MB against the 14 MB limit and the
    whole program failed to compile (caught by studies/scale_probe.py on
    hardware under traced-grid operands)."""
    import numpy as np

    rows, cols = shape
    cols_padded = -(-cols // 128) * 128
    itemsize = np.dtype(dtype).itemsize
    tile = 512
    while (
        tile > 8
        and 2 * tile * cols_padded * itemsize * live_planes > _VMEM_LIMIT_BYTES
    ):
        tile //= 2
    return tile


def _make_stencil5_tiled_kernel(R: int, T: int):
    """Row-tiled stencil kernel body.  Each program owns rows
    [i·T, (i+1)·T); the x-shift halos arrive as two HALO_ROWS-row blocks (the
    block of 8 rows ending at the tile's first row, and the one starting at
    the row past its last), fetched by block-index maps — no manual DMA, and
    u itself is read exactly once.  Mosaic requires the sublane block dim to
    be a multiple of 8 (single-row halo blocks fail to lower on real TPU —
    caught by studies/scale_probe.py at N=1024), so each halo block carries 8
    rows and the kernel statically slices the one row it needs.

    The ragged last block (R is N+1, never a tile multiple) is handled by
    zero-masking u's out-of-range rows on load: Mosaic's block padding is
    undefined data, and 0·garbage would still poison the last valid row
    through the in-block x-shift if the garbage were inf/NaN."""

    def kernel(u_ref, up_ref, dn_ref, c0_ref, cxm_ref, cxp_ref, cym_ref,
               cyp_ref, out_ref):
        i = pl.program_id(0)
        row0 = i * T
        u = u_ref[:]
        # dtype-matched zero (a weak 0.0 literal becomes an f64 scalar
        # constant under x64, which Mosaic cannot lower)
        zero = jnp.zeros((), u.dtype)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, u.shape, 0) + row0
        u = jnp.where(row_ids < R, u, zero)
        # halo rows (zero-inflow outside the grid, exactly the shift-op
        # semantics of the single-block kernel): last row of the 8-row block
        # above, first row of the 8-row block below
        up = jnp.where(i > 0, up_ref[:][-1:, :], zero)
        dn = jnp.where(row0 + T <= R - 1, dn_ref[:][:1, :], zero)
        u_xm = jnp.concatenate([up, u[:-1, :]], axis=0)
        u_xp = jnp.concatenate([u[1:, :], dn], axis=0)
        zcol = jnp.zeros_like(u[:, :1])
        u_ym = jnp.concatenate([zcol, u[:, :-1]], axis=1)
        u_yp = jnp.concatenate([u[:, 1:], zcol], axis=1)
        out_ref[:] = (
            c0_ref[:] * u
            + cxm_ref[:] * u_xm
            + cxp_ref[:] * u_xp
            + cym_ref[:] * u_ym
            + cyp_ref[:] * u_yp
        )

    return kernel


def stencil5_apply_tiled(stencil, u, *, row_tile: int | None = None,
                         interpret: bool = False):
    """Row-tiled :func:`stencil5_apply_pallas` for operands beyond the
    single-block VMEM budget (N ≥ ~1024 f32).

    Grid over row-blocks of ``row_tile`` rows; per program the five
    coefficient tiles + the operand tile live in VMEM while the two x-halo
    rows arrive inside (8, W) blocks from the neighbouring row-blocks (8 =
    the Mosaic sublane tile — single-row blocks fail to lower on real TPU;
    the kernel slices out the one row it needs).  Bit-identical to the
    single-block kernel / ``stencil.apply(LOCAL_OPS,·)`` (same FMA order),
    any problem size."""
    R, W = u.shape
    T = row_tile or _pick_row_tile(u.shape, u.dtype)
    assert T >= 8 and T % 8 == 0, (
        f"row_tile must be a positive multiple of 8 (Mosaic sublane tiling), "
        f"got {T}"
    )
    grid = (-(-R // T),)

    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        )
        space = pltpu.VMEM
    else:
        space = pl.ANY if not interpret else None

    def row_spec(block_rows, index_map):
        if space is None:
            return pl.BlockSpec((block_rows, W), index_map)
        return pl.BlockSpec((block_rows, W), index_map, memory_space=space)

    # Halo blocks are 8 rows (the f32 sublane tile): Mosaic rejects block
    # shapes whose sublane dim is neither a multiple of 8 nor the full array
    # dim.  T is a power of two >= 8, so T // HB block indices line up: the
    # block ENDING at row i·T is i·(T//HB) - 1, the one STARTING at (i+1)·T
    # is (i+1)·(T//HB); clamped at the edges (kernel masks the halo to zero
    # there, so the clamped block's contents never matter).
    HB = 8
    nb = T // HB
    tile_spec = row_spec(T, lambda i: (i, 0))
    up_spec = row_spec(HB, lambda i: (jnp.maximum(i * nb - 1, 0), 0))
    dn_spec = row_spec(HB, lambda i: (jnp.minimum((i + 1) * nb, (R - 1) // HB), 0))

    return pl.pallas_call(
        _make_stencil5_tiled_kernel(R, T),
        grid=grid,
        out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
        in_specs=[tile_spec, up_spec, dn_spec] + [tile_spec] * 5,
        out_specs=tile_spec,
        interpret=interpret,
        **kwargs,
    )(u, u, u, stencil.c0, stencil.cxm, stencil.cxp, stencil.cym, stencil.cyp)


def stencil5_apply_pallas(stencil, u, *, interpret: bool = False):
    """out[ij] = c0·u[ij] + cxm·u[i-1,j] + cxp·u[i+1,j] + cym·u[i,j-1]
    + cyp·u[i,j+1] as one fused VMEM-resident kernel.

    Drop-in equal to ``stencil.apply(LOCAL_OPS, u)`` (single-device layout).
    """
    assert apply_fits(u.shape, u.dtype), (
        "stencil5_apply_pallas is a single-block kernel and this operand "
        "exceeds the VMEM budget — callers must check apply_fits() and "
        "fall back to the jnp path"
    )
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        )
        in_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    else:
        in_spec = pl.BlockSpec(memory_space=pl.ANY)
        out_spec = pl.BlockSpec(memory_space=pl.ANY)

    return pl.pallas_call(
        _stencil5_kernel,
        out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
        in_specs=[in_spec] * 6,
        out_specs=out_spec,
        interpret=interpret,
        **kwargs,
    )(u, stencil.c0, stencil.cxm, stencil.cxp, stencil.cym, stencil.cyp)


# ----------------------------------------------------------------------
# 3-D: single-block Stencil7 apply (beyond-reference extension)
# ----------------------------------------------------------------------

def _shifted3(u):
    """The six zero-inflow-shifted copies of a 3-D operand (the
    :mod:`na_dd_tpu.three_d.shifts` semantics).  Axis 0 is the untiled
    leading dim; axes 1/2 are the (sublane, lane) pair — same
    slice+concatenate realization Mosaic lowers to register shifts in the
    2-D kernels."""
    zx = jnp.zeros_like(u[:1, :, :])
    zy = jnp.zeros_like(u[:, :1, :])
    zz = jnp.zeros_like(u[:, :, :1])
    u_xm = jnp.concatenate([zx, u[:-1, :, :]], axis=0)
    u_xp = jnp.concatenate([u[1:, :, :], zx], axis=0)
    u_ym = jnp.concatenate([zy, u[:, :-1, :]], axis=1)
    u_yp = jnp.concatenate([u[:, 1:, :], zy], axis=1)
    u_zm = jnp.concatenate([zz, u[:, :, :-1]], axis=2)
    u_zp = jnp.concatenate([u[:, :, 1:], zz], axis=2)
    return u_xm, u_xp, u_ym, u_yp, u_zm, u_zp


def _stencil7_kernel(
    u_ref, c0_ref, cxm_ref, cxp_ref, cym_ref, cyp_ref, czm_ref, czp_ref, out_ref
):
    u = u_ref[:]
    u_xm, u_xp, u_ym, u_yp, u_zm, u_zp = _shifted3(u)
    out_ref[:] = (
        c0_ref[:] * u
        + cxm_ref[:] * u_xm
        + cxp_ref[:] * u_xp
        + cym_ref[:] * u_ym
        + cyp_ref[:] * u_yp
        + czm_ref[:] * u_zm
        + czp_ref[:] * u_zp
    )


def _footprint_fits3(shape, dtype, live_volumes: int) -> bool:
    """VMEM fit check for 3-D single-block kernels with Mosaic TILE PADDING:
    the last two dims are laid out in (sublane, lane) = (8, 128) tiles, so a
    (A, B, C) f32 volume occupies A·ceil8(B)·ceil128(C) elements — ~2x the
    naive element count for the odd (N+1)³ cubes here.  (The 2-D row-tiled
    kernel was bitten by exactly this naive-accounting gap: budgeted 8.3 MB,
    XLA demanded 15.9 MB — _pick_row_tile docstring.)"""
    import numpy as np

    a, b, c = shape
    b_pad = -(-b // 8) * 8
    c_pad = -(-c // 128) * 128
    itemsize = np.dtype(dtype).itemsize
    return a * b_pad * c_pad * itemsize * live_volumes <= _VMEM_LIMIT_BYTES


def apply3_fits(shape, dtype) -> bool:
    """Whether :func:`stencil7_apply_pallas` (9 live volumes, tile-padded)
    fits VMEM — about N ≤ 55 for f32 (N+1)³ cubes."""
    return _footprint_fits3(shape, dtype, 9)


def stencil7_apply_pallas(stencil, u, *, interpret: bool = False):
    """out = Stencil7.apply(LOCAL_OPS3, u) as one fused VMEM-resident kernel
    (3-D twin of :func:`stencil5_apply_pallas`).

    STATUS: interpret-mode exact vs the jnp path (tests/test_three_d_model.py,
    tests/test_pallas_kernels.py) and routed by the 3-D integrators'
    ``_pallas_ops`` hook (stencil_backend='pallas'); real-Mosaic lowering
    validation + timing queued on hardware (studies/tpu_queue_r3d.sh) — the
    2-D row-tiled kernel taught us interpret mode cannot see lowering
    constraints.
    """
    assert apply3_fits(u.shape, u.dtype), (
        "stencil7_apply_pallas is a single-block kernel and this operand "
        "exceeds the VMEM budget — callers must check apply3_fits() and "
        "fall back to the jnp path"
    )
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        )
        in_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    else:
        in_spec = pl.BlockSpec(memory_space=pl.ANY)
        out_spec = pl.BlockSpec(memory_space=pl.ANY)

    return pl.pallas_call(
        _stencil7_kernel,
        out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
        in_specs=[in_spec] * 8,
        out_specs=out_spec,
        interpret=interpret,
        **kwargs,
    )(
        u,
        stencil.c0,
        stencil.cxm,
        stencil.cxp,
        stencil.cym,
        stencil.cyp,
        stencil.czm,
        stencil.czp,
    )


def _make_bicgstab3_kernel(iters: int, tol: float):
    def kernel(b_ref, c0_ref, cxm_ref, cxp_ref, cym_ref, cyp_ref,
               czm_ref, czp_ref, invd_ref, mask_ref, x_ref, iters_ref):
        c0, cxm, cxp, cym, cyp, czm, czp = (
            c0_ref[:], cxm_ref[:], cxp_ref[:], cym_ref[:], cyp_ref[:],
            czm_ref[:], czp_ref[:],
        )

        def matvec(w):
            u_xm, u_xp, u_ym, u_yp, u_zm, u_zp = _shifted3(w)
            return (
                c0 * w + cxm * u_xm + cxp * u_xp + cym * u_ym + cyp * u_yp
                + czm * u_zm + czp * u_zp
            )

        # loop=True: fori_loop bounds the Mosaic stack to ONE iteration's
        # volume temporaries (the unrolled chain measured 63.96 MB stack at
        # N=32, iters=48 on hardware — see _bicgstab_inline)
        x, iters_used, _r, _tol_sq = _bicgstab_inline(
            matvec, lambda r: r * invd_ref[:], b_ref[:], tol, iters, loop=True
        )
        x_ref[:] = x * mask_ref[:]
        iters_ref[0] = iters_used

    return kernel


def fused_solve3_fits(shape, dtype) -> bool:
    """Whether :func:`bicgstab_solve3_pallas`'s single-block footprint fits
    Mosaic's scoped VMEM.  HARDWARE-CALIBRATED, not counted
    (studies/stencil7_fused_probe.py, 2026-08-18): N=30 f32 cubes compile
    and run exact (and 20% faster than the jnp unrolled solve); N=32 OOMs
    the scoped-VMEM stack even with the fori_loop body (84.14 MB stack vs
    the backend's 40.59 MB limit — Mosaic keeps far more than the ~20
    counted live volumes on its stack).  The factor 28 puts the boundary
    between the 31³ and 33³ tile-padded footprints: admits ≤ 524,288
    B/volume (N ≤ 31 f32 cubes), rejects 33³'s 675,840 (its sublane pad
    jumps to 40)."""
    return _footprint_fits3(shape, dtype, 28)


def bicgstab_solve3_pallas(
    stencil, b, inv_diag, mask, *, tol: float, iters: int, interpret: bool = False
):
    """Whole Jacobi-BiCGStab solve on a Stencil7 system as ONE VMEM-resident
    kernel — the 3-D twin of :func:`bicgstab_solve_pallas`, sharing the
    identical :func:`_bicgstab_inline` update (the solver algebra is
    shape-agnostic; only the in-kernel matvec differs) run as an in-kernel
    ``fori_loop`` (``loop=True``): the unrolled form's per-iteration volume
    temporaries are only partially reused by Mosaic's stack allocator and
    blew the scoped-VMEM limit on real hardware (63.96 MB stack at N=32,
    iters=48, measured 2026-08-18).

    STATUS: interpret-mode vs ``bicgstab_unrolled`` to 1 ulp with identical
    iteration counts (tests/test_three_d_model.py; the fori_loop compiles
    the body once, so FMA contraction can differ from the unrolled chain by
    1 ulp), routed by the 3-D integrators' ``_pallas_ops`` hook
    (stencil_backend='pallas'), and hardware-validated 2026-08-18
    (studies/stencil7_fused_probe.py: N=16/24/28/30 f32 cubes exact vs the
    jnp unrolled solve with identical iteration counts, ~20% faster at
    N=28/30; N=32 OOMs Mosaic's scoped VMEM — see fused_solve3_fits).
    """
    assert fused_solve3_fits(b.shape, b.dtype), (
        "bicgstab_solve3_pallas is a single-block kernel and this operand "
        "exceeds the VMEM budget — callers must check fused_solve3_fits() "
        "and fall back to the apply kernel / jnp path"
    )
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        )
        spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        scalar_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    else:
        spec = pl.BlockSpec(memory_space=pl.ANY)
        scalar_spec = pl.BlockSpec(memory_space=pl.ANY)

    x, iters_used = pl.pallas_call(
        _make_bicgstab3_kernel(int(iters), float(tol)),
        out_shape=[
            jax.ShapeDtypeStruct(b.shape, b.dtype),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ],
        in_specs=[spec] * 10,
        out_specs=[spec, scalar_spec],
        interpret=interpret,
        **kwargs,
    )(
        b, stencil.c0, stencil.cxm, stencil.cxp, stencil.cym, stencil.cyp,
        stencil.czm, stencil.czp, inv_diag, mask,
    )

    r = b - stencil7_apply_pallas(stencil, x, interpret=interpret)
    rsq = jnp.sum(r * r)
    tol_sq = tol * tol * jnp.sum(b * b)
    return x, {
        "iters": iters_used[0],
        "resnorm_sq": rsq,
        "converged": rsq <= tol_sq,
    }


def _pick_slab_tile3(shape, dtype, live_volumes: int = 9) -> int | None:
    """Largest power-of-two x-slab thickness whose working set fits VMEM
    (DOUBLE-buffered, tile-padded lane/sublane dims — the 2-D lessons
    applied): ``live_volumes`` slab-blocks of ``tile`` x-rows plus the two
    single-row halo slabs, all at (ceil8(B), ceil128(C)) padded footprint.
    None when even tile=1 does not fit (callers fall back to jnp)."""
    import numpy as np

    _a, b, c = shape
    b_pad = -(-b // 8) * 8
    c_pad = -(-c // 128) * 128
    slab = b_pad * c_pad * np.dtype(dtype).itemsize
    tile = 64
    while tile > 1 and 2 * (live_volumes * tile + 2) * slab > _VMEM_LIMIT_BYTES:
        tile //= 2
    if 2 * (live_volumes * tile + 2) * slab > _VMEM_LIMIT_BYTES:
        return None
    return tile


def apply3_tiled_fits(shape, dtype) -> bool:
    """Whether :func:`stencil7_apply_tiled` has a feasible slab tile — about
    N ≤ ~370 for f32 cubes (tile=1 needs 11 double-buffered padded slabs)."""
    return _pick_slab_tile3(shape, dtype) is not None


def _make_stencil7_tiled_kernel(A: int, T: int):
    """x-slab-tiled Stencil7 kernel body.  Each program owns x-slabs
    [i·T, (i+1)·T); the x-shift halos arrive as two SINGLE-slab (1, B, C)
    blocks fetched by index maps.  Unlike the 2-D row-tiled kernel, the
    tiled axis here is a LEADING dim (the last two dims (B, C) stay whole as
    the (sublane, lane) layout), so Mosaic's 8-sublane block rule does not
    bite and one-slab halo blocks are legal.  y/z shifts are purely
    in-block.  Ragged last slab: u's out-of-range x-rows are zero-masked on
    load (Mosaic block padding is undefined data — same guard as the 2-D
    kernel)."""

    def kernel(u_ref, up_ref, dn_ref, c0_ref, cxm_ref, cxp_ref, cym_ref,
               cyp_ref, czm_ref, czp_ref, out_ref):
        i = pl.program_id(0)
        x0 = i * T
        u = u_ref[:]
        # dtype-matched zero (a weak 0.0 literal becomes f64 under x64)
        zero = jnp.zeros((), u.dtype)
        x_ids = jax.lax.broadcasted_iota(jnp.int32, u.shape, 0) + x0
        u = jnp.where(x_ids < A, u, zero)
        # halo slabs (zero inflow outside the grid = shift-op semantics)
        up = jnp.where(i > 0, up_ref[:], zero)
        dn = jnp.where(x0 + T <= A - 1, dn_ref[:], zero)
        u_xm = jnp.concatenate([up, u[:-1]], axis=0)
        u_xp = jnp.concatenate([u[1:], dn], axis=0)
        zy = jnp.zeros_like(u[:, :1, :])
        u_ym = jnp.concatenate([zy, u[:, :-1, :]], axis=1)
        u_yp = jnp.concatenate([u[:, 1:, :], zy], axis=1)
        zz = jnp.zeros_like(u[:, :, :1])
        u_zm = jnp.concatenate([zz, u[:, :, :-1]], axis=2)
        u_zp = jnp.concatenate([u[:, :, 1:], zz], axis=2)
        out_ref[:] = (
            c0_ref[:] * u
            + cxm_ref[:] * u_xm
            + cxp_ref[:] * u_xp
            + cym_ref[:] * u_ym
            + cyp_ref[:] * u_yp
            + czm_ref[:] * u_zm
            + czp_ref[:] * u_zp
        )

    return kernel


def stencil7_apply_tiled(stencil, u, *, slab_tile: int | None = None,
                         interpret: bool = False):
    """x-slab-tiled :func:`stencil7_apply_pallas` for cubes beyond the
    single-block VMEM budget (N > ~55 f32; feasible to ~N=370).

    Grid over x-slabs of ``slab_tile`` rows; per program the seven
    coefficient slabs + the operand slab live in VMEM while the two x-halo
    slabs arrive as (1, B, C) blocks from the neighbouring programs'
    territory.  Bit-identical to the single-block kernel /
    ``Stencil7.apply(LOCAL_OPS3, ·)`` (same FMA order), any problem size
    with a feasible tile (callers check :func:`apply3_tiled_fits`).

    STATUS: interpret-exact (tests/test_pallas_kernels.py); real-Mosaic
    lowering validation queued on hardware (studies/tpu_queue_r3d.sh) — the
    2-D row-tiled kernel taught us interpret mode cannot see lowering
    constraints.
    """
    A, B, C = u.shape
    T = slab_tile or _pick_slab_tile3(u.shape, u.dtype)
    assert T is not None and T >= 1, (
        "no feasible slab tile for this operand — callers must check "
        "apply3_tiled_fits() and fall back to the jnp path"
    )
    grid = (-(-A // T),)

    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        )
        space = pltpu.VMEM
    else:
        space = pl.ANY if not interpret else None

    def slab_spec(slabs, index_map):
        if space is None:
            return pl.BlockSpec((slabs, B, C), index_map)
        return pl.BlockSpec((slabs, B, C), index_map, memory_space=space)

    # halo block indices are in units of (1, B, C) blocks = absolute x rows;
    # clamped at the edges (the kernel masks the halo to zero there, so the
    # clamped block's contents never matter)
    tile_spec = slab_spec(T, lambda i: (i, 0, 0))
    up_spec = slab_spec(1, lambda i: (jnp.maximum(i * T - 1, 0), 0, 0))
    dn_spec = slab_spec(1, lambda i: (jnp.minimum((i + 1) * T, A - 1), 0, 0))

    return pl.pallas_call(
        _make_stencil7_tiled_kernel(A, T),
        grid=grid,
        out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
        in_specs=[tile_spec, up_spec, dn_spec] + [tile_spec] * 7,
        out_specs=tile_spec,
        interpret=interpret,
        **kwargs,
    )(
        u, u, u, stencil.c0, stencil.cxm, stencil.cxp, stencil.cym,
        stencil.cyp, stencil.czm, stencil.czp,
    )
