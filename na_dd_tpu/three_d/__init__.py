"""3-D extension of the framework (beyond-reference capability).

The reference framework is strictly 2-D (every operator in
src/prob1base.py:1499-1581 is a row/column shift on (N+1, M+1) arrays, and
every field/integrator builds on them).  This package extends the framework
to (N+1, M+1, P+1) tensor-product grids with the SAME structure at every
layer — including the FULL five-field model physics: semi-discrete fields
with analytic Stencil7 Jacobian/coupling planes (:mod:`fields`), MMS
machinery in (t,x,y,z) (:mod:`mms`, :mod:`forcing`, :mod:`quadrature`), and
the complete PC-trapezoidal integrator family (:mod:`integrator`) — the
latter by INHERITING the 2-D predictor–corrector/Newton/Krylov/mixed-
precision machinery unchanged (it was written shape-agnostically) and
overriding only the Newton-plane builder and the local-ops provider.

Discretization layer:

* :mod:`shifts`   — six zero-filling axis shifts + global reductions
  (``Ops3`` protocol): ``LocalOps3`` single-device, ``HaloOps3`` inside
  ``jax.shard_map`` over a 2-D device mesh (x/y sharded via ``ppermute``
  halos; the z axis stays on-device — it is the minor-most array axis,
  i.e. the TPU lane dimension, where shifts are register traffic).
* :mod:`grid`     — ``Grid3`` with the 0-sentinel reciprocal-metric design
  of :mod:`na_dd_tpu.ops.grid` (no inf sentinels, masked whole-array
  quadrature weights, global-parity mask for diagonal probing).
* :mod:`stencils` — the mimetic staggered operators per axis.
* :mod:`diffusion` — 7-point assembled stencils (``Stencil7``), exact
  closed-form diffusion planes, and a Crank–Nicolson heat step driven by
  the SAME matrix-free BiCGStab solvers as the 2-D framework
  (ops/linsolve.py is shape-agnostic: solvers see only elementwise
  algebra, a ``matvec`` callback, and a ``dot``).
"""

from na_dd_tpu.three_d.diffusion import (
    Stencil7,
    advection_planes3,
    crank_nicolson_heat_step,
    diffusion_planes3,
    heat_mms_error,
    midpoint_coupling_planes3,
    newton_planes3,
    probe_stencil3,
    stencil_add_diag3,
)
from na_dd_tpu.three_d.fields import (
    Field3Base,
    FieldCsTriple3,
    FieldHCsTriple3,
    FieldRegHCsTriple3,
)
from na_dd_tpu.three_d.forcing import (
    Forcing3Base,
    MMSForcingCsTriple3,
    MMSForcingHCsTriple3,
    MMSForcingRegHCsTriple3,
    NoForcing3,
)
from na_dd_tpu.three_d.batched_ladder import run_spatial_ladder3_batched
from na_dd_tpu.three_d.harness import (
    build_runner3,
    make_integrator3,
    make_setup3,
    mms_error3,
    run_trial3,
)
from na_dd_tpu.three_d.integrator import (
    ForwardEulerIntegrator3,
    PCTrapezoidalCsTriple3,
    PCTrapezoidalHCsTriple3,
    PCTrapezoidalRegHCsTriple3,
)
from na_dd_tpu.three_d.mms import (
    MMSCaseCsZeroCrossing3,
    MMSCaseExpSin3,
    MMSCasePol3,
    MMSCaseSymbolic3,
    pack_symbolic_txyz_with_derivatives,
    state_from_mms_when3,
    z_sym,
)
from na_dd_tpu.three_d.inner_products import inner_H3, inner_p3, norm_H3, norm_p3
from na_dd_tpu.three_d.quadrature import avg_int3
from na_dd_tpu.three_d.grid import Grid3, make_grid3, make_uniform_grid3
from na_dd_tpu.three_d.shifts import LOCAL_OPS3, HaloOps3, LocalOps3, Ops3
from na_dd_tpu.three_d.stencils import (
    Dx_reg3,
    Dx_star3,
    Dy_reg3,
    Dy_star3,
    Dz_reg3,
    Dz_star3,
    Mx3,
    My3,
    Mz3,
    grad_H3,
)

__all__ = [
    "Grid3",
    "HaloOps3",
    "LOCAL_OPS3",
    "LocalOps3",
    "Ops3",
    "Stencil7",
    "crank_nicolson_heat_step",
    "diffusion_planes3",
    "heat_mms_error",
    "make_grid3",
    "make_uniform_grid3",
    "Mx3",
    "My3",
    "Mz3",
    "Dx_reg3",
    "Dy_reg3",
    "Dz_reg3",
    "Dx_star3",
    "Dy_star3",
    "Dz_star3",
    "grad_H3",
    # model physics (3-D extension)
    "advection_planes3",
    "midpoint_coupling_planes3",
    "newton_planes3",
    "probe_stencil3",
    "stencil_add_diag3",
    "Field3Base",
    "FieldCsTriple3",
    "FieldHCsTriple3",
    "FieldRegHCsTriple3",
    "Forcing3Base",
    "NoForcing3",
    "MMSForcingCsTriple3",
    "MMSForcingHCsTriple3",
    "MMSForcingRegHCsTriple3",
    "ForwardEulerIntegrator3",
    "PCTrapezoidalCsTriple3",
    "PCTrapezoidalHCsTriple3",
    "PCTrapezoidalRegHCsTriple3",
    "MMSCaseSymbolic3",
    "MMSCaseCsZeroCrossing3",
    "MMSCasePol3",
    "MMSCaseExpSin3",
    "pack_symbolic_txyz_with_derivatives",
    "state_from_mms_when3",
    "z_sym",
    "avg_int3",
    "inner_H3",
    "inner_p3",
    "norm_H3",
    "norm_p3",
    "build_runner3",
    "make_integrator3",
    "make_setup3",
    "mms_error3",
    "run_trial3",
    "run_spatial_ladder3_batched",
]
