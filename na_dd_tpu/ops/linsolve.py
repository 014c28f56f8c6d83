"""Matrix-free structured linear solvers for the implicit Newton steps.

The reference assembles exact 5-diagonal sparse Jacobians from hand-derived
stencil-derivative tables and factorizes them with SuperLU
(``FiveDiagonalsMatrixFactory`` + ``spsolve``, reference src/prob1base.py:
601-710, 2088-2130).  On TPU a sparse direct factorization is the wrong shape:
it is sequential, irregular, and leaves the vector units idle.

Instead we keep the Jacobian *implicit*:

* the matrix-vector product is ``w -> interior_mask * (2w - dt * F_lin(w))``
  where ``F_lin = jax.linearize(residual)`` — the exact Jacobian of the
  discrete residual, no hand-derived stencil tables needed;
* the 5-point-stencil structure lets us extract the exact matrix diagonal with
  two probing products on a red/black checkerboard (distance-1 stencils never
  couple equal-parity nodes), giving a free Jacobi preconditioner;
* the system is solved with preconditioned BiCGStab (handles the
  non-symmetric advection block) to near machine precision.

The systems are extremely well conditioned: J = 2I - dt·∂F with
dt·‖∂F‖ = O(dt·D/h²) ≲ O(1) for every study in BASELINE.md, so BiCGStab
converges in a handful of iterations — each iteration being two fused stencil
sweeps, ideal for the VPU.  All reductions go through ``dot`` so the same
solver runs inside ``shard_map`` (where dots psum over the mesh).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from na_dd_tpu.ops.grid import Grid
from na_dd_tpu.ops.shifts import Ops


def checkerboard_masks(g: Grid):
    """Red/black parity masks for diagonal probing.

    Read from the grid's precomputed global-parity array so the masks stay
    correct on sharded blocks (where local index != global index).
    """
    return g.red_mask, 1.0 - g.red_mask


def probe_diag(matvec, red, black):
    """Exact diagonal of a 5-point-stencil operator via 2-color probing.

    For an operator whose row (i,j) only couples nodes at Manhattan distance
    <= 1, nodes of equal (i+j)-parity never interact, so
    ``diag = Σ_c (A 1_c) ⊙ 1_c`` over the two parities.
    """
    return matvec(red) * red + matvec(black) * black


def bicgstab(
    matvec,
    b,
    x0,
    *,
    dot,
    minv=None,
    tol: float = 1e-13,
    atol: float = 0.0,
    maxiter: int = 200,
):
    """Preconditioned BiCGStab on grid-function arrays.

    Args:
        matvec: linear operator A (must preserve the zero-boundary subspace).
        b: right-hand side.
        x0: initial guess.
        dot: inner product (``lambda u, v: ops.asum(u * v)``) — psum-aware
            under sharding.
        minv: optional left preconditioner application (e.g. Jacobi
            ``lambda r: r * inv_diag``).
        tol/atol: stop when ||r||₂ <= max(tol*||b||₂, atol).
        maxiter: hard iteration cap (while_loop bound).

    Returns:
        (x, info) where info is a dict with ``iters`` and ``resnorm_sq``.
    """
    if minv is None:
        minv = lambda r: r

    eps_div = jnp.asarray(1e-300, dtype=b.dtype)

    def safe_div(num, den):
        den_ok = jnp.abs(den) > eps_div
        return jnp.where(den_ok, num / jnp.where(den_ok, den, 1.0), 0.0), den_ok

    r0 = b - matvec(x0)
    bnorm_sq = dot(b, b)
    tol_sq = jnp.maximum(tol * tol * bnorm_sq, atol * atol)

    def cond(carry):
        (x, r, rhat, p, v, rho, alpha, omega, k, done) = carry
        return jnp.logical_and(k < maxiter, jnp.logical_not(done))

    def body(carry):
        (x, r, rhat, p, v, rho, alpha, omega, k, done) = carry
        rho1 = dot(rhat, r)
        ratio, ok1 = safe_div(rho1, rho)
        aw, ok2 = safe_div(alpha, omega)
        beta = ratio * aw
        p = r + beta * (p - omega * v)
        phat = minv(p)
        v = matvec(phat)
        alpha, ok3 = safe_div(rho1, dot(rhat, v))
        s = r - alpha * v
        x_half = x + alpha * phat
        s_sq = dot(s, s)
        s_conv = s_sq <= tol_sq

        shat = minv(s)
        t = matvec(shat)
        omega, ok4 = safe_div(dot(t, s), dot(t, t))
        x_full = x_half + omega * shat
        r_new = s - omega * t

        x = jnp.where(s_conv, x_half, x_full)
        r = jnp.where(s_conv, s, r_new)
        breakdown = jnp.logical_not(ok1 & ok2 & ok3 & ok4)
        converged = dot(r, r) <= tol_sq
        done = s_conv | converged | breakdown
        return (x, r, rhat, p, v, rho1, alpha, omega, k + 1, done)

    z = jnp.zeros_like(b)
    one = jnp.asarray(1.0, dtype=b.dtype)
    init = (x0, r0, r0, z, z, one, one, one, jnp.asarray(0), dot(r0, r0) <= tol_sq)
    (x, r, *_rest, k, _done) = jax.lax.while_loop(cond, body, init)
    rsq = dot(r, r)
    return x, {"iters": k, "resnorm_sq": rsq, "converged": rsq <= tol_sq}


class Stencil5(NamedTuple):
    """Assembled 5-point stencil: out[ij] = c0·w[ij] + cxm·w[i-1,j]
    + cxp·w[i+1,j] + cym·w[i,j-1] + cyp·w[i,j+1].

    The TPU-native analogue of the reference's ``FiveDiagonalsMatrixFactory``
    CSR assembly (src/prob1base.py:601-710): five dense coefficient planes
    instead of a sparse matrix, applied with shifts (fused VPU work,
    ppermute-able under sharding)."""

    c0: jax.Array
    cxm: jax.Array
    cxp: jax.Array
    cym: jax.Array
    cyp: jax.Array

    def apply(self, ops: Ops, w):
        return (
            self.c0 * w
            + self.cxm * ops.shift_xm(w)
            + self.cxp * ops.shift_xp(w)
            + self.cym * ops.shift_ym(w)
            + self.cyp * ops.shift_yp(w)
        )

    def transpose(self, ops: Ops) -> "Stencil5":
        """Planes of the transposed operator Aᵀ (still a 5-point stencil).

        Row ij of Aᵀ collects the coefficients with which node ij appears in
        its neighbors' rows: (Aᵀv)[ij] = c0[ij]v[ij] + cxp[i-1,j]v[i-1,j]
        + cxm[i+1,j]v[i+1,j] + cyp[i,j-1]v[i,j-1] + cym[i,j+1]v[i,j+1] — the
        off-diagonal planes swap roles and shift by one.  Used by the IFT
        adjoints of the plane-based solvers (mixed refinement, BCR direct):
        the cotangent system Aᵀy = ḡ is just another plane solve."""
        return Stencil5(
            c0=self.c0,
            cxm=ops.shift_xm(self.cxp),
            cxp=ops.shift_xp(self.cxm),
            cym=ops.shift_ym(self.cyp),
            cyp=ops.shift_yp(self.cym),
        )


def diffusion_planes(g: Grid, ops: Ops, ax, ay) -> Stencil5:
    """Exact stencil planes of w ↦ D*_x(ax ⊙ D_{-x} w) + D*_y(ay ⊙ D_{-y} w).

    Closed-form counterpart of probing the linearized diffusion operator —
    the analytic analogue of the reference's ``del*_ab_F*_ij`` stencil tables
    (reference src/prob1base.py:2674-2839), valid on non-uniform grids (the
    0-sentinel reciprocal metrics make boundary rows/cols vanish exactly as
    the operators do):

        cxp[i,j] = ax[i+1,j] / (h_{i+1/2} h_{i+1})
        cxm[i,j] = ax[i,j]   / (h_{i+1/2} h_i)
        c0       = -(cxp + cxm) - (cyp + cym)
    """
    cxp = g.inv_hh_phalf * ops.shift_xp(ax * g.inv_hh)
    cxm = g.inv_hh_phalf * ax * g.inv_hh
    cyp = g.inv_kk_phalf * ops.shift_yp(ay * g.inv_kk)
    cym = g.inv_kk_phalf * ay * g.inv_kk
    return Stencil5(c0=-(cxp + cxm + cyp + cym), cxm=cxm, cxp=cxp, cym=cym, cyp=cyp)


def advection_planes(g: Grid, ops: Ops, bx, by) -> Stencil5:
    """Exact stencil planes of w ↦ -D*_x(M_x(bx ⊙ w)) - D*_y(M_y(by ⊙ w))
    (the velocity part of Fcl linearized in cl; reference
    src/prob1base.py:2740-2762).

        cxp[i,j] = -bx[i+1,j] / (2 h_{i+1/2})        (i+1 interior row)
        cxm[i,j] = +bx[i-1,j] / (2 h_{i+1/2})
        c0[i,j]  = -(bx[i,j]/(2 h_{i+1/2}))·(1_{row i+1 ≥ 1} - 1_{row i ≥ 1}) - …

    The mask factors only matter on boundary rows/cols (killed downstream by
    the interior mask) but are kept so the planes agree with probing
    everywhere, bit-for-bit in structure.
    """
    half_x = 0.5 * g.inv_hh_phalf
    half_y = 0.5 * g.inv_kk_phalf
    cxp = -half_x * ops.shift_xp(bx * g.mask_x1)
    cxm = half_x * ops.shift_xm(bx) * g.mask_x1
    c0x = -half_x * bx * (ops.shift_xp(g.mask_x1) - g.mask_x1)
    cyp = -half_y * ops.shift_yp(by * g.mask_y1)
    cym = half_y * ops.shift_ym(by) * g.mask_y1
    c0y = -half_y * by * (ops.shift_yp(g.mask_y1) - g.mask_y1)
    return Stencil5(c0=c0x + c0y, cxm=cxm, cxp=cxp, cym=cym, cyp=cyp)


def midpoint_coupling_planes(g: Grid, ops: Ops, ax, ay) -> Stencil5:
    """Exact stencil planes of w ↦ D*_x(ax ⊙ M_x w) + D*_y(ay ⊙ M_y w).

    The coefficient sits OUTSIDE the midpoint average (contrast
    :func:`advection_planes`, where it sits inside) — the structure of a
    diffusion coefficient's state-derivative: d/dT[D*_x(Dd(M T)·D₋x u)]·w =
    D*_x(∂_T Dd · D₋x u ⊙ M_x w).  From the operator definitions
    (ops/stencils.py:26-47):

        cxp[i] = ax[i+1]·mask_x1[i+1] / (2 h_{i+1/2})
        cxm[i] = -ax[i]·mask_x1[i]    / (2 h_{i+1/2})
        c0     = (cxp + cxm) + (cyp + cym)
    """
    half_x = 0.5 * g.inv_hh_phalf
    half_y = 0.5 * g.inv_kk_phalf
    axm = ax * g.mask_x1
    aym = ay * g.mask_y1
    cxp = half_x * ops.shift_xp(axm)
    cxm = -half_x * axm
    cyp = half_y * ops.shift_yp(aym)
    cym = -half_y * aym
    return Stencil5(c0=(cxp + cxm) + (cyp + cym), cxm=cxm, cxp=cxp, cym=cym, cyp=cyp)


def newton_planes(g: Grid, ops: Ops, L: Stencil5, dt) -> Stencil5:
    """Planes of the interior Newton operator w ↦ m·(2(w·m) − dt·m·L(w·m))
    with m = interior_mask — exactly what :func:`probe_stencil` extracts from
    the integrator's masked matvec."""
    m = g.interior_mask
    return Stencil5(
        c0=m * (2.0 - dt * L.c0),
        cxm=-dt * m * L.cxm * ops.shift_xm(m),
        cxp=-dt * m * L.cxp * ops.shift_xp(m),
        cym=-dt * m * L.cym * ops.shift_ym(m),
        cyp=-dt * m * L.cyp * ops.shift_yp(m),
    )


def stencil_add_diag(st: Stencil5, d) -> Stencil5:
    """st + diag(d)."""
    return st._replace(c0=st.c0 + d)


# neighbor color offsets for the (i + 2j) mod 5 coloring
_OFFSET_DELTA = {"c0": 0, "cxm": -1, "cxp": 1, "cym": -2, "cyp": 2}


def probe_stencil(matvec, g: Grid) -> Stencil5:
    """Extract all five stencil coefficient planes of a distance-1 operator
    with 5 probing products on the (i + 2j) mod 5 coloring.

    A node and its four axis neighbors have pairwise-distinct colors, so
    (A 1_c)[ij] isolates exactly one coefficient per probe:
    the coefficient of neighbor (i+a, j+b) lives in the probe of color
    (color5[ij] + a + 2b) mod 5.

    This replaces re-running the jax.linearize graph inside every Krylov
    iteration by a 5-multiply stencil — the assemble-then-iterate strategy —
    which also shrinks the unrolled-solver graph by an order of magnitude.
    Exact for all Newton operators here (their Jacobians are 5-point by
    construction of the discretization).
    """
    probes = [matvec((g.color5 == k).astype(g.xx.dtype)) for k in range(5)]

    def pick(delta):
        # select-sum instead of gather (gathers are slow on the TPU VPU)
        idx = (g.color5 + delta) % 5
        out = jnp.zeros_like(probes[0])
        for k in range(5):
            out = out + jnp.where(idx == k, probes[k], 0.0)
        return out

    return Stencil5(**{name: pick(d) for name, d in _OFFSET_DELTA.items()})


def probe_stencil_vmapped(matvec, g: Grid) -> Stencil5:
    """:func:`probe_stencil` with the 5 probes applied under one ``vmap``.

    The linearized-operator graph is instantiated ONCE (batched over the five
    color probes) instead of being inlined five times — smaller jaxpr (faster
    compiles) and batched VPU work at runtime.  Same per-element arithmetic;
    agreement with :func:`probe_stencil` is to fusion-level rounding (~1 ulp).
    """
    colors = jnp.stack([(g.color5 == k).astype(g.xx.dtype) for k in range(5)])
    probes = jax.vmap(matvec)(colors)

    def pick(delta):
        idx = (g.color5 + delta) % 5
        out = jnp.zeros_like(probes[0])
        for k in range(5):
            out = out + jnp.where(idx == k, probes[k], 0.0)
        return out

    return Stencil5(**{name: pick(d) for name, d in _OFFSET_DELTA.items()})


def bicgstab_unrolled(
    matvec,
    b,
    x0,
    *,
    dot,
    minv=None,
    tol: float = 1e-13,
    atol: float = 0.0,
    iters: int = 16,
):
    """Fully-unrolled preconditioned BiCGStab with early-exit masking.

    TPU rationale: ``lax.while_loop`` iterations serialize with a scalar-
    condition sync each trip, which dominates wall-clock for these small
    grids (~ms per iteration of launch latency vs ~µs of math).  Unrolling a
    fixed ``iters`` straight-line iterations lets XLA fuse the entire solve
    into a handful of kernels; once the masked `done` flag trips, the
    remaining iterations are algebraic no-ops (identical result to the
    while_loop version for any iters >= the while_loop's trip count).

    Use when the iteration count is known to be modest (the Newton systems
    here are 2I - dt·J with dt·||J|| << 1 in every study protocol); fall back
    to :func:`bicgstab` for ill-conditioned regimes.
    """
    if minv is None:
        minv = lambda r: r

    eps_div = jnp.asarray(1e-300, dtype=b.dtype)

    def safe_div(num, den):
        den_ok = jnp.abs(den) > eps_div
        return jnp.where(den_ok, num / jnp.where(den_ok, den, 1.0), 0.0), den_ok

    r = b - matvec(x0)
    rhat = r
    bnorm_sq = dot(b, b)
    tol_sq = jnp.maximum(tol * tol * bnorm_sq, atol * atol)
    x = x0
    z = jnp.zeros_like(b)
    one = jnp.asarray(1.0, dtype=b.dtype)
    p, v = z, z
    rho = alpha = omega = one
    done = dot(r, r) <= tol_sq
    iters_used = jnp.asarray(0)

    def keep(old, new):
        return jnp.where(done, old, new)

    for _ in range(iters):
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
        iters_used = iters_used + jnp.where(done, 0, 1)
        done = done | s_conv | breakdown | (dot(r, r) <= tol_sq)

    rsq = dot(r, r)
    return x, {"iters": iters_used, "resnorm_sq": rsq, "converged": rsq <= tol_sq}


def bicgstab_scanned(
    matvec,
    b,
    x0,
    *,
    dot,
    minv=None,
    tol: float = 1e-13,
    atol: float = 0.0,
    iters: int = 16,
):
    """The :func:`bicgstab_unrolled` iteration under ``lax.scan``.

    Identical masked-early-exit update, but the body is traced/compiled ONCE
    instead of ``iters`` times — the compile-time lever for very stiff solves
    that need budgets of 96+ (a 60-iteration unrolled solve takes >2 min of
    XLA compile on CPU; the scanned form compiles in seconds).  Takes the
    same effective iteration count as the unrolled solver and agrees to ~1
    ulp (XLA fuses the two program shapes slightly differently).

    TPU f64-emulation safety: the Krylov scalars (rho, alpha, omega) are
    carried as (1, 1) arrays, NOT 0-d scalars — 0-d f64 loop carries are
    computed at ~f32 precision on the axon backend (measured; see
    studies/axon_while_probe.py) while array carries stay exact.  All other
    carried values are full-grid arrays, booleans, or integers.
    """
    if minv is None:
        minv = lambda r: r

    eps_div = jnp.asarray(1e-300, dtype=b.dtype)

    def safe_div(num, den):
        den_ok = jnp.abs(den) > eps_div
        return jnp.where(den_ok, num / jnp.where(den_ok, den, 1.0), 0.0), den_ok

    r0 = b - matvec(x0)
    rhat = r0
    bnorm_sq = dot(b, b)
    tol_sq = jnp.maximum(tol * tol * bnorm_sq, atol * atol)
    z = jnp.zeros_like(b)
    # (1,1)-shaped, not 0-d: 0-d f64 loop carries degrade to ~f32 on the
    # TPU f64-emulation backend (see docstring).
    one = jnp.ones((1, 1), dtype=b.dtype)

    def body(carry, _):
        (x, r, p, v, rho, alpha, omega, iters_used, done) = carry

        def keep(old, new):
            return jnp.where(done, old, new)

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

        breakdown = jnp.logical_not(
            jnp.all(ok1) & jnp.all(ok2) & jnp.all(ok3) & jnp.all(ok4)
        )
        x = keep(x, x_new)
        r = keep(r, r_new)
        p = keep(p, p_new)
        v = keep(v, v_new)
        rho = keep(rho, rho1)
        alpha = keep(alpha, alpha_new)
        omega = keep(omega, omega_new)
        iters_used = iters_used + jnp.where(done, 0, 1)
        done = done | s_conv | breakdown | (dot(r, r) <= tol_sq)
        return (x, r, p, v, rho, alpha, omega, iters_used, done), None

    init = (
        x0, r0, z, z, one, one, one, jnp.asarray(0), dot(r0, r0) <= tol_sq,
    )
    (x, r, *_rest, iters_used, _done), _ = jax.lax.scan(body, init, None, length=iters)
    rsq = dot(r, r)
    return x, {"iters": iters_used, "resnorm_sq": rsq, "converged": rsq <= tol_sq}


def interior_linearized_matvec(residual_fn, u0, g: Grid, dt):
    """Build the Newton matvec ``w -> interior_mask*(2w - dt*J_F[u0] w)``.

    ``residual_fn(u)`` must be the semi-discrete field evaluated as a function
    of the single unknown ``u`` (other state components frozen).  Returns
    (F(u0), matvec).  This is the exact operator the reference assembles as a
    5-diagonal CSR matrix (reference src/prob1base.py:3011-3023), restricted
    to the interior subspace.
    """
    f0, f_lin = jax.linearize(residual_fn, u0)

    def matvec(w):
        wm = w * g.interior_mask
        return (2.0 * wm - dt * f_lin(wm)) * g.interior_mask

    return f0, matvec


def newton_inner_solve(
    residual_fn,
    u0,
    rhs,
    g: Grid,
    ops: Ops,
    dt,
    *,
    red,
    black,
    tol: float = 1e-13,
    maxiter: int = 200,
):
    """Solve ``interior[(2I - dt·J_F[u0])] Δ = rhs`` for the Newton update.

    Returns (F(u0), Δ, info); Δ is zero on the boundary.  Counterpart of the
    reference's ``basic_inner_newton_step`` / ``newton_step_inner_Fx_eq_C``
    (src/prob1base.py:2088-2130) with the LU solve replaced by matrix-free
    Jacobi-BiCGStab.
    """
    f0, matvec = interior_linearized_matvec(residual_fn, u0, g, dt)
    diag = probe_diag(matvec, red * g.interior_mask, black * g.interior_mask)
    # Off-interior rows of the operator are identically zero; give them unit
    # diagonal so the Jacobi sweep is a no-op there.
    inv_diag = jnp.where(g.interior_mask > 0, 1.0 / jnp.where(diag == 0, 1.0, diag), 0.0)
    minv = lambda r: r * inv_diag
    dot = lambda u, v: ops.asum(u * v)
    b = rhs * g.interior_mask
    delta, info = bicgstab(
        matvec, b, jnp.zeros_like(b), dot=dot, minv=minv, tol=tol, maxiter=maxiter
    )
    return f0, delta * g.interior_mask, info
