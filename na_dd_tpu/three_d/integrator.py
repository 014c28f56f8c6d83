"""3-D time integrators: the PC-trapezoidal family and forward Euler on
(N+1, M+1, P+1) grids.

Beyond-reference capability (the reference integrators,
src/prob1base.py:2885-3703, are strictly 2-D).  The ENTIRE predictor–
corrector machinery is inherited from
:class:`na_dd_tpu.integrators.pc_trapezoidal.PCTrapezoidalBase` — the PC
loop, the Heun cp/cs predictors, the closed-form / sign-exact / pointwise-
Newton cs correctors, the Gauss–Seidel Newton sweep over the triangular
(T, cl, cd) block, the Krylov drivers (while_loop / unrolled / scanned
BiCGStab) and the mixed-precision iterative-refinement wrapper were all
written shape-agnostically (pointwise algebra + ``ops`` reductions +
stencil ``.apply``).  The 3-D subclasses override exactly five hooks:

* :meth:`_newton_planes` — builds the interior Newton operator from a
  :class:`~na_dd_tpu.three_d.diffusion.Stencil7` (7 planes instead of 5);
* :meth:`_probe_stencil` — the generic color-probing plane extractor
  (7-color (i+2j+3k) mod 7 in 3-D instead of 5-color (i+2j) mod 5);
* :meth:`_pallas_ops` — the Stencil7 Mosaic kernel entry points for
  ``stencil_backend="pallas"``;
* :meth:`_direct_solve_ops` — the exact BCR direct solver for
  ``linear_solver="direct"`` (dense x-plane blocks instead of row blocks;
  :mod:`na_dd_tpu.three_d.direct_solve`);
* :attr:`_local_ops` — the eager ``.step()`` single-device ops provider.

Every 2-D solver feature is available in 3-D (no construction-time
restrictions remain):

``stencil_backend="pallas"`` routes through the Stencil7 kernels
(:func:`na_dd_tpu.ops.pallas_kernels.bicgstab_solve3_pallas` /
``stencil7_apply_pallas`` / ``stencil7_apply_tiled``) via the
:meth:`_pallas_ops` hook; cubes beyond the feasible tiled budget fall back
to the jnp apply.

``precision="mixed"``, ``krylov_scanned``, ``stencil_source`` ("analytic" or
"probe"), ``coupling_source`` ("jvp" or "analytic"), ``assemble_stencil=
False`` (matrix-free, 2-color-diagonal-probed), multi-sweep scan and the
shard-global diagnostics all work in 3-D through the shared machinery.
"""

from __future__ import annotations

from na_dd_tpu.integrators.forward_euler import ForwardEulerIntegrator
from na_dd_tpu.integrators.pc_trapezoidal import (
    PCTrapezoidalCsTriple,
    PCTrapezoidalHCsTriple,
    PCTrapezoidalRegHCsTriple,
)
from na_dd_tpu.three_d.diffusion import newton_planes3, probe_stencil3
from na_dd_tpu.three_d.shifts import LOCAL_OPS3


class ForwardEulerIntegrator3(ForwardEulerIntegrator):
    """Forward Euler on 3-D fields — the step body is inherited verbatim
    (it only evaluates ``field.all_fields``); only the eager-API ops provider
    changes."""

    _local_ops = LOCAL_OPS3


class _Newton3Mixin:
    """Swaps the dimension-specific hooks (Newton-plane builder, color
    prober, Pallas kernels, direct solver, eager ops) for their Stencil7
    counterparts."""

    _local_ops = LOCAL_OPS3

    def _newton_planes(self, g, ops, L, dt):
        return newton_planes3(g, ops, L, dt)

    def _probe_stencil(self, matvec, g):
        # 7-color probing — the generic path that cross-validates the
        # analytic Stencil7 planes (stencil_source="probe")
        return probe_stencil3(matvec, g, vmapped=self.probe_vmapped)

    def _pallas_ops(self):
        """stencil_backend='pallas' in 3-D: the Stencil7 kernels — fused
        whole-BiCGStab-solve to ~N<=31 f32 cubes (hardware-calibrated:
        N=30 compiles and beats jnp by 20%, N=32 OOMs Mosaic's scoped-VMEM
        stack — fused_solve3_fits), single-block apply to ~N<=55, then the
        x-slab-tiled apply to ~N<=370; beyond the feasible slab tile the
        matvec falls back to the jnp apply.  The 2-D fused-triple kernel
        never engages in 3-D (its gate tests the 2-D LOCAL_OPS
        identity)."""
        from na_dd_tpu.ops import pallas_kernels as pk

        def apply_tiled(st, w, *, interpret=False):
            if not pk.apply3_tiled_fits(w.shape, w.dtype):
                return st.apply(LOCAL_OPS3, w)
            return pk.stencil7_apply_tiled(st, w, interpret=interpret)

        return (
            pk.apply3_fits,
            pk.stencil7_apply_pallas,
            apply_tiled,
            pk.fused_solve3_fits,
            pk.bicgstab_solve3_pallas,
        )

    def _direct_solve_ops(self):
        """linear_solver='direct' in 3-D: BCR over dense x-plane blocks
        (na_dd_tpu.three_d.direct_solve) — the stiffness-independent exact
        backstop, same contract as the 2-D row-block BCR."""
        from na_dd_tpu.three_d.direct_solve import stencil7_solve_direct_ops

        return stencil7_solve_direct_ops


class PCTrapezoidalCsTriple3(_Newton3Mixin, PCTrapezoidalCsTriple):
    """PC-trapezoidal with the linear cs corrector, in 3-D."""


class PCTrapezoidalHCsTriple3(_Newton3Mixin, PCTrapezoidalHCsTriple):
    """PC-trapezoidal with the sharp-Heaviside cs corrector, in 3-D."""


class PCTrapezoidalRegHCsTriple3(_Newton3Mixin, PCTrapezoidalRegHCsTriple):
    """PC-trapezoidal with the regularized-Heaviside cs corrector (the
    paper's headline integrator), in 3-D."""
