"""Assembled 7-point stencils and an implicit heat solve on 3-D grids.

Demonstrates that the whole 2-D solve stack generalizes mechanically:

* :class:`Stencil7` is :class:`na_dd_tpu.ops.linsolve.Stencil5` plus the two
  z planes (seven dense coefficient arrays applied with shifts — fused VPU
  work, ``ppermute``-able under sharding).
* :func:`diffusion_planes3` is the closed-form plane assembly of the mimetic
  variable-coefficient diffusion operator (the 3-D analogue of
  ``ops/linsolve.diffusion_planes``).
* :func:`crank_nicolson_heat_step` drives the SAME matrix-free BiCGStab as
  the 2-D integrators (``ops/linsolve.bicgstab_unrolled`` is shape-agnostic:
  it sees only elementwise algebra, a matvec callback, and a ``dot`` that
  psums under sharding).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from na_dd_tpu.ops import linsolve
from na_dd_tpu.three_d.grid import Grid3
from na_dd_tpu.three_d.shifts import LOCAL_OPS3, Ops3
from na_dd_tpu.three_d.stencils import (
    Dx_reg3,
    Dx_star3,
    Dy_reg3,
    Dy_star3,
    Dz_reg3,
    Dz_star3,
)


class Stencil7(NamedTuple):
    """Assembled 7-point stencil: out[ijk] = c0·w[ijk] + cxm·w[i-1,j,k]
    + cxp·w[i+1,j,k] + cym·w[i,j-1,k] + cyp·w[i,j+1,k] + czm·w[i,j,k-1]
    + czp·w[i,j,k+1]."""

    c0: jax.Array
    cxm: jax.Array
    cxp: jax.Array
    cym: jax.Array
    cyp: jax.Array
    czm: jax.Array
    czp: jax.Array

    def apply(self, ops: Ops3, w):
        return (
            self.c0 * w
            + self.cxm * ops.shift_xm(w)
            + self.cxp * ops.shift_xp(w)
            + self.cym * ops.shift_ym(w)
            + self.cyp * ops.shift_yp(w)
            + self.czm * ops.shift_zm(w)
            + self.czp * ops.shift_zp(w)
        )


def diffusion_apply3(ops: Ops3, g: Grid3, ax, ay, az, u):
    """w ↦ D*_x(ax ⊙ D₋x w) + D*_y(ay ⊙ D₋y w) + D*_z(az ⊙ D₋z w).

    ``ax[i,j,k]`` multiplies the flux at the lower x-face of node i (the
    location where ``D₋x w`` lives) — i.e. the coefficient evaluated at
    midpoints, same convention as the 2-D operator."""
    return (
        Dx_star3(ops, g, ax * Dx_reg3(ops, g, u))
        + Dy_star3(ops, g, ay * Dy_reg3(ops, g, u))
        + Dz_star3(ops, g, az * Dz_reg3(ops, g, u))
    )


def diffusion_planes3(g: Grid3, ops: Ops3, ax, ay, az) -> Stencil7:
    """Exact closed-form stencil planes of :func:`diffusion_apply3`
    (cross-validated against ``jax.linearize`` in tests/test_three_d.py):

        cxp[i,j,k] = ax[i+1,j,k] / (h_{i+1/2} h_{i+1})
        cxm[i,j,k] = ax[i,j,k]   / (h_{i+1/2} h_i)
        c0         = -(cxp + cxm + cyp + cym + czp + czm)
    """
    cxp = g.inv_hh_phalf * ops.shift_xp(ax * g.inv_hh)
    cxm = g.inv_hh_phalf * ax * g.inv_hh
    cyp = g.inv_kk_phalf * ops.shift_yp(ay * g.inv_kk)
    cym = g.inv_kk_phalf * ay * g.inv_kk
    czp = g.inv_ll_phalf * ops.shift_zp(az * g.inv_ll)
    czm = g.inv_ll_phalf * az * g.inv_ll
    return Stencil7(
        c0=-(cxp + cxm + cyp + cym + czp + czm),
        cxm=cxm,
        cxp=cxp,
        cym=cym,
        cyp=cyp,
        czm=czm,
        czp=czp,
    )


def advection_planes3(g: Grid3, ops: Ops3, bx, by, bz) -> Stencil7:
    """Exact planes of w ↦ −D*_x(M_x(bx⊙w)) − D*_y(M_y(by⊙w)) − D*_z(M_z(bz⊙w))
    — the 3-D extension of :func:`na_dd_tpu.ops.linsolve.advection_planes`
    (per-axis structure identical; reference src/prob1base.py:2740-2762)."""
    half_x = 0.5 * g.inv_hh_phalf
    half_y = 0.5 * g.inv_kk_phalf
    half_z = 0.5 * g.inv_ll_phalf
    cxp = -half_x * ops.shift_xp(bx * g.mask_x1)
    cxm = half_x * ops.shift_xm(bx) * g.mask_x1
    c0x = -half_x * bx * (ops.shift_xp(g.mask_x1) - g.mask_x1)
    cyp = -half_y * ops.shift_yp(by * g.mask_y1)
    cym = half_y * ops.shift_ym(by) * g.mask_y1
    c0y = -half_y * by * (ops.shift_yp(g.mask_y1) - g.mask_y1)
    czp = -half_z * ops.shift_zp(bz * g.mask_z1)
    czm = half_z * ops.shift_zm(bz) * g.mask_z1
    c0z = -half_z * bz * (ops.shift_zp(g.mask_z1) - g.mask_z1)
    return Stencil7(
        c0=c0x + c0y + c0z, cxm=cxm, cxp=cxp, cym=cym, cyp=cyp, czm=czm, czp=czp
    )


def midpoint_coupling_planes3(g: Grid3, ops: Ops3, ax, ay, az) -> Stencil7:
    """Exact planes of w ↦ D*_x(ax ⊙ M_x w) + D*_y(ay ⊙ M_y w) + D*_z(az ⊙ M_z w)
    — the coefficient OUTSIDE the midpoint average (a diffusion coefficient's
    state-derivative; 3-D extension of
    :func:`na_dd_tpu.ops.linsolve.midpoint_coupling_planes`)."""
    half_x = 0.5 * g.inv_hh_phalf
    half_y = 0.5 * g.inv_kk_phalf
    half_z = 0.5 * g.inv_ll_phalf
    axm = ax * g.mask_x1
    aym = ay * g.mask_y1
    azm = az * g.mask_z1
    cxp = half_x * ops.shift_xp(axm)
    cxm = -half_x * axm
    cyp = half_y * ops.shift_yp(aym)
    cym = -half_y * aym
    czp = half_z * ops.shift_zp(azm)
    czm = -half_z * azm
    return Stencil7(
        c0=(cxp + cxm) + (cyp + cym) + (czp + czm),
        cxm=cxm,
        cxp=cxp,
        cym=cym,
        cyp=cyp,
        czm=czm,
        czp=czp,
    )


def newton_planes3(g: Grid3, ops: Ops3, L: Stencil7, dt) -> Stencil7:
    """Planes of the interior Newton operator w ↦ m·(2(w·m) − dt·m·L(w·m)),
    m = interior_mask (3-D twin of :func:`na_dd_tpu.ops.linsolve.newton_planes`)."""
    m = g.interior_mask
    return Stencil7(
        c0=m * (2.0 - dt * L.c0),
        cxm=-dt * m * L.cxm * ops.shift_xm(m),
        cxp=-dt * m * L.cxp * ops.shift_xp(m),
        cym=-dt * m * L.cym * ops.shift_ym(m),
        cyp=-dt * m * L.cyp * ops.shift_yp(m),
        czm=-dt * m * L.czm * ops.shift_zm(m),
        czp=-dt * m * L.czp * ops.shift_zp(m),
    )


def stencil_add_diag3(st: Stencil7, d) -> Stencil7:
    """st + diag(d)."""
    return st._replace(c0=st.c0 + d)


# neighbor color offsets for the (i + 2j + 3k) mod 7 coloring
_OFFSET_DELTA7 = {
    "c0": 0,
    "cxm": -1,
    "cxp": 1,
    "cym": -2,
    "cyp": 2,
    "czm": -3,
    "czp": 3,
}


def probe_stencil3(matvec, g: Grid3, *, vmapped: bool = False) -> Stencil7:
    """Extract all seven stencil planes of a distance-1 3-D operator with 7
    probing products on the (i + 2j + 3k) mod 7 coloring — the 3-D twin of
    :func:`na_dd_tpu.ops.linsolve.probe_stencil`.

    A node and its six axis neighbors carry pairwise-distinct colors (the
    offsets {0, ±1, ±2, ±3} are distinct mod 7), so (A 1_c)[ijk] isolates
    exactly one coefficient per probe: the coefficient of neighbor
    (i+a, j+b, k+c) lives in the probe of color (color7 + a + 2b + 3c) mod 7.
    Fully generic — works for ANY distance-1 operator, which is what lets
    the 3-D integrators cross-validate the analytic planes
    (tests/test_three_d_model.py).  ``vmapped`` instantiates the linearized
    graph once, batched over the 7 probes (smaller jaxpr).
    """
    if vmapped:
        colors = jnp.stack([(g.color7 == q).astype(g.xx.dtype) for q in range(7)])
        probes = jax.vmap(matvec)(colors)
    else:
        probes = [matvec((g.color7 == q).astype(g.xx.dtype)) for q in range(7)]

    def pick(delta):
        # select-sum instead of gather (gathers are slow on the TPU VPU)
        idx = (g.color7 + delta) % 7
        out = jnp.zeros_like(probes[0])
        for q in range(7):
            out = out + jnp.where(idx == q, probes[q], 0.0)
        return out

    return Stencil7(**{name: pick(d) for name, d in _OFFSET_DELTA7.items()})


def crank_nicolson_heat_step(
    g: Grid3,
    ops: Ops3,
    st: Stencil7,
    u,
    f_n,
    f_np1,
    dt,
    *,
    tol: float = 1e-12,
    iters: int = 32,
):
    """One Crank–Nicolson step of u_t = L u + f with homogeneous Dirichlet
    boundary (L = the assembled diffusion stencil):

        (I - dt/2 L) u^{n+1} = (I + dt/2 L) u^n + dt (f^n + f^{n+1}) / 2

    solved matrix-free on the masked interior with Jacobi-preconditioned
    BiCGStab (``ops/linsolve.bicgstab_unrolled`` — the identical solver the
    2-D Newton sweeps use).  Returns (u_next, solver_info)."""
    mask = g.interior_mask
    half_dt = 0.5 * dt

    def matvec(w):
        return mask * (w - half_dt * st.apply(ops, w))

    rhs = mask * (u + half_dt * st.apply(ops, u) + dt * 0.5 * (f_n + f_np1))
    diag = 1.0 - half_dt * st.c0
    inv_diag = jnp.where(mask > 0, 1.0 / jnp.where(diag == 0, 1.0, diag), 0.0)
    dot = lambda a, b: ops.asum(a * b)  # noqa: E731
    u_next, info = linsolve.bicgstab_unrolled(
        matvec,
        rhs,
        jnp.zeros_like(rhs),
        dot=dot,
        minv=lambda r: r * inv_diag,
        tol=tol,
        iters=iters,
    )
    return u_next * mask, info


def heat_mms_error(
    N: int,
    *,
    D: float = 0.1,
    Tf: float = 0.1,
    dt: float | None = None,
    iters: int = 32,
    ops: Ops3 = LOCAL_OPS3,
    g: Grid3 | None = None,
):
    """Manufactured-solution convergence driver for the 3-D heat solve.

    Exact solution u = sin(πx) sin(πy) sin(πz) e^{-t} (vanishes on ∂[0,1]³),
    constant diffusivity D, forcing f = u_t - D Δu = (3π²D - 1) u from the
    CONTINUOUS operator — so the measured error is the discretization error:
    O(h²) + O(dt²).  The whole time loop is one ``lax.scan`` program.
    Returns the final-time weighted-L² error ‖u_h - u‖_H (sqrt of the
    w_H-weighted sum), matching the 2-D harness's norm convention."""
    from na_dd_tpu.three_d.grid import make_uniform_grid3

    if g is None:
        g = make_uniform_grid3(N, N, N)
    if dt is None:
        dt = Tf / 20.0
    num_steps = int(round(Tf / dt))

    pi = jnp.pi
    shape_fn = (
        jnp.sin(pi * g.xx) * jnp.sin(pi * g.yy) * jnp.sin(pi * g.zz)
    )

    def exact(t):
        return shape_fn * jnp.exp(-t)

    def forcing(t):
        return (3.0 * pi**2 * D - 1.0) * exact(t) * g.interior_mask

    aD = jnp.full(g.full_shape, D, dtype=g.xx.dtype)
    st = diffusion_planes3(g, ops, aD, aD, aD)

    u0 = exact(0.0) * g.interior_mask

    def body(u, n):
        t_n = n * dt
        u1, info = crank_nicolson_heat_step(
            g, ops, st, u, forcing(t_n), forcing(t_n + dt), dt, iters=iters
        )
        return u1, info["iters"]

    ns = jnp.arange(num_steps, dtype=jnp.result_type(float))
    u_final, _iters = jax.lax.scan(body, u0, ns)

    err = u_final - exact(num_steps * dt) * g.interior_mask
    return jnp.sqrt(ops.asum(g.w_H * err * err))
