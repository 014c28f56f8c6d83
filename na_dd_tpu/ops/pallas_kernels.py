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
    zrow = jnp.zeros_like(u[:1, :])
    zcol = jnp.zeros_like(u[:, :1])
    # u shifted so that element [i,j] holds the required neighbor; the zero
    # edge line reproduces the global-boundary zero-inflow shift semantics
    u_xm = jnp.concatenate([zrow, u[:-1, :]], axis=0)  # u[i-1,j]
    u_xp = jnp.concatenate([u[1:, :], zrow], axis=0)  # u[i+1,j]
    u_ym = jnp.concatenate([zcol, u[:, :-1]], axis=1)  # u[i,j-1]
    u_yp = jnp.concatenate([u[:, 1:], zcol], axis=1)  # u[i,j+1]
    out_ref[:] = (
        c0_ref[:] * u
        + cxm_ref[:] * u_xm
        + cxp_ref[:] * u_xp
        + cym_ref[:] * u_ym
        + cyp_ref[:] * u_yp
    )


def stencil5_apply_pallas(stencil, u, *, interpret: bool = False):
    """out[ij] = c0·u[ij] + cxm·u[i-1,j] + cxp·u[i+1,j] + cym·u[i,j-1]
    + cyp·u[i,j+1] as one fused VMEM-resident kernel.

    Drop-in equal to ``stencil.apply(LOCAL_OPS, u)`` (single-device layout).
    """
    nbytes = u.size * u.dtype.itemsize * 7  # 6 inputs + 1 output
    assert nbytes <= _VMEM_LIMIT_BYTES, (
        f"stencil5_apply_pallas is a single-block kernel; {nbytes} bytes "
        f"exceed the VMEM budget — tile the grid or use the jnp path"
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
