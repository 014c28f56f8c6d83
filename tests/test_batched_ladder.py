"""Batched (pad-to-max + vmap) spatial ladder vs the per-level programs.

The batched ladder runs every level padded to the finest shape inside one
vmapped program; zero-padded dead nodes must be numerically inert, so each
level's combined error must match its own per-level program to summation-
order rounding.
"""

import numpy as np
import pytest

from na_dd_tpu.harness.batched_ladder import pad_grid, pad_state, run_spatial_ladder_batched
from na_dd_tpu.harness.studies import run_spatial_study
from na_dd_tpu.mms.cases import MMSCasePol
from na_dd_tpu.mms.engine import state_from_mms_when
from na_dd_tpu.models import Model02, default_model_consts
from na_dd_tpu.ops import LOCAL_OPS, make_uniform_grid


def test_padded_grid_is_inert():
    """Stencil/reduction results on a zero-padded grid equal the unpadded
    ones: dead nodes contribute exactly 0."""
    import jax.numpy as jnp

    from na_dd_tpu.ops import inner_products, stencils

    g = make_uniform_grid(6, 6)
    gp = pad_grid(g, 11, 11)
    model = Model02(default_model_consts)
    mms = MMSCasePol(g, model=model)
    s = state_from_mms_when(mms_case=mms, t=0.3, grid=g)
    sp = pad_state(s, 11, 11)

    # inner products: padded == unpadded exactly up to reduction order
    a = float(inner_products.inner_H(LOCAL_OPS, g, s.T, s.T))
    b = float(inner_products.inner_H(LOCAL_OPS, gp, sp.T, sp.T))
    assert b == pytest.approx(a, rel=1e-14)

    # gradients: real-node values unchanged, dead nodes exactly 0
    gx, gy = stencils.grad_H(LOCAL_OPS, g, s.T)
    gxp, gyp = stencils.grad_H(LOCAL_OPS, gp, sp.T)
    np.testing.assert_array_equal(np.asarray(gxp)[:7, :7], np.asarray(gx))
    assert np.all(np.asarray(gxp)[7:, :] == 0.0)
    assert np.all(np.asarray(gyp)[:, 7:] == 0.0)

    # a full PC step on the padded grid leaves dead nodes at exactly 0 and
    # reproduces the unpadded step at the real nodes
    from na_dd_tpu.core import FieldRegHCsTriple, MMSForcingRegHCsTriple
    from na_dd_tpu.integrators import PCTrapezoidalRegHCsTriple

    forcing = MMSForcingRegHCsTriple(mms_case=mms, model=model, regularization_factor=50.0)
    field = FieldRegHCsTriple(grid=g, model=model, forcing=forcing, regularization_factor=50.0)
    integ = PCTrapezoidalRegHCsTriple(field, regularization_factor=50.0, krylov_unroll=8)
    s1, _ = integ.step_fn(g, LOCAL_OPS, s, 0.3, 1e-3)
    s1p, _ = integ.step_fn(gp, LOCAL_OPS, sp, 0.3, 1e-3)
    for v in ("cp", "T", "cl", "cd", "cs"):
        real = np.asarray(getattr(s1, v))
        padded = np.asarray(getattr(s1p, v))
        assert np.all(padded[7:, :] == 0.0) and np.all(padded[:, 7:] == 0.0), v
        # Krylov dots see extra zeros (different reduction tree) → rounding-
        # level deviation only
        np.testing.assert_allclose(padded[:7, :7], real, rtol=0, atol=1e-13)


def test_batched_ladder_matches_per_level_programs():
    levels = 4  # N = 2..16 keeps the CPU test fast
    per_level = run_spatial_study("pol", levels=levels, verbose=False)
    batched = run_spatial_ladder_batched("pol", levels=levels, verbose=False)

    assert batched["Ns"] == per_level["Ns"]
    for N, e_b, e_p in zip(batched["Ns"], batched["errors"], per_level["errors"]):
        assert e_b == pytest.approx(e_p, rel=1e-10), (
            f"N={N}: batched {e_b} vs per-level {e_p}"
        )
