"""Exact block-cyclic-reduction direct solve (ops/direct_solve.py).

The TPU-native counterpart of the reference's SuperLU ``spsolve``
(reference src/prob1base.py:2088-2130): checked against dense NumPy linear
algebra on explicit masked 5-diagonal operators, and end-to-end as a drop-in
for the Krylov Newton solves (``linear_solver="direct"``), including inside
the mixed-precision refinement wrapper.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from na_dd_tpu.ops import LOCAL_OPS, linsolve, make_uniform_grid
from na_dd_tpu.ops.direct_solve import (
    block_tridiag_solve_bcr,
    inv_gauss_jordan,
    stencil5_solve_direct,
)

OPS = LOCAL_OPS
SEED = 97531


def _random_stencil5(g, rng, *, diag_shift=4.0):
    shape = g.full_shape
    return linsolve.Stencil5(
        c0=jnp.asarray(rng.rand(*shape) + diag_shift),
        cxm=jnp.asarray(rng.rand(*shape) * 0.5),
        cxp=jnp.asarray(rng.rand(*shape) * 0.5),
        cym=jnp.asarray(rng.rand(*shape) * 0.5),
        cyp=jnp.asarray(rng.rand(*shape) * 0.5),
    )


def _dense_from_masked_stencil(st, g, mask):
    """Dense matrix of u ↦ mask · (st @ (mask · u)), with identity rows on
    the dead nodes (the direct solver's well-posedness convention)."""
    n = (g.N + 1) * (g.M + 1)
    mask_flat = np.asarray(mask).ravel()
    cols = []
    for idx in range(n):
        e = np.zeros(n)
        e[idx] = 1.0
        u = jnp.asarray(e.reshape(g.full_shape))
        cols.append(np.asarray(mask * st.apply(OPS, u * mask)).ravel())
    dense = np.stack(cols, axis=1)
    dense[np.diag_indices(n)] += 1.0 - mask_flat
    return dense


@pytest.mark.parametrize("nm", [(6, 5), (9, 9), (16, 11)])
def test_bcr_matches_dense_on_interior_mask(nm):
    """stencil5_solve_direct == dense solve on the plain interior mask for
    non-power-of-two block counts (exercises the 2^k-1 padding)."""
    N, M = nm
    g = make_uniform_grid(N, M)
    rng = np.random.RandomState(SEED)
    st = _random_stencil5(g, rng)
    mask = g.interior_mask
    b = jnp.asarray(rng.rand(*g.full_shape)) * mask

    dense = _dense_from_masked_stencil(st, g, mask)
    x_dense = np.linalg.solve(dense, np.asarray(b).ravel()).reshape(g.full_shape)
    x = stencil5_solve_direct(st, b, mask)
    assert np.allclose(np.asarray(x), x_dense, rtol=1e-12, atol=1e-12)
    # residual at machine precision — this is an EXACT solver
    r = np.asarray(mask * (b - st.apply(OPS, x)))
    assert np.linalg.norm(r) <= 1e-11 * np.linalg.norm(np.asarray(b))


def test_bcr_matches_dense_with_dead_interior_rows():
    """Batched-ladder-style masks (dead interior nodes) stay exact: dead rows
    become identity equations, alive rows never couple into them when the
    planes carry the mask factors (as every Newton-plane assembly does)."""
    g = make_uniform_grid(10, 7)
    rng = np.random.RandomState(SEED + 1)
    st = _random_stencil5(g, rng)
    # kill the last 3 interior rows and last 2 interior columns (pad-to-max
    # ladder shape), and mask the PLANES like the assemblies do
    mask = np.asarray(g.interior_mask).copy()
    mask[-4:, :] = 0.0
    mask[:, -3:] = 0.0
    mask = jnp.asarray(mask)
    st = linsolve.Stencil5(*(p * mask for p in st))
    b = jnp.asarray(rng.rand(*g.full_shape)) * mask

    dense = _dense_from_masked_stencil(st, g, mask)
    x_dense = np.linalg.solve(dense, np.asarray(b).ravel()).reshape(g.full_shape)
    x = stencil5_solve_direct(st, b, mask)
    assert np.allclose(np.asarray(x), x_dense, rtol=1e-12, atol=1e-12)
    assert np.all(np.asarray(x)[np.asarray(mask) == 0] == 0.0)


def test_inv_gauss_jordan_matches_lapack():
    """The LU-free batched inverse (the TPU-f64 path — the TPU backend has no
    f64 LuDecomposition HLO) matches LAPACK, including on matrices that
    REQUIRE pivoting (zero leading diagonal entry)."""
    rng = np.random.RandomState(SEED + 3)
    M = rng.rand(6, 9, 9) + 3.0 * np.eye(9)
    M[0, 0, 0] = 0.0  # force a row swap in the first elimination step
    out = np.asarray(inv_gauss_jordan(jnp.asarray(M)))
    assert np.allclose(out, np.linalg.inv(M), rtol=1e-11, atol=1e-11)


def test_bcr_low_level_single_block():
    """n=1 degenerates to one dense solve (no reduction levels)."""
    rng = np.random.RandomState(SEED + 2)
    m = 5
    B = jnp.asarray(rng.rand(1, m, m) + 4.0 * np.eye(m))
    A = jnp.zeros((1, m, m))
    C = jnp.zeros((1, m, m))
    b = jnp.asarray(rng.rand(1, m))
    x = block_tridiag_solve_bcr(A, B, C, b)
    assert np.allclose(np.asarray(x[0]), np.linalg.solve(np.asarray(B[0]), np.asarray(b[0])))


def test_direct_newton_matches_krylov_end_to_end():
    """linear_solver='direct' reproduces the Krylov study error ~exactly
    (both drive the same Newton iteration; the linear solves differ only at
    rounding/tolerance level)."""
    from na_dd_tpu.harness.studies import _make_trial, study_consts
    from na_dd_tpu.mms import cases as mms_cases

    trial_k = _make_trial(
        mms_cases.MMSCasePol, 16, 50.0, mc=study_consts("pol"), krylov_unroll=8
    )
    s_k = trial_k.run_for_errors(Tf=0.01, dt=5e-4)
    trial_d = _make_trial(
        mms_cases.MMSCasePol, 16, 50.0, mc=study_consts("pol"),
        linear_solver="direct",
    )
    assert trial_d.integrator.linear_solver == "direct"
    s_d = trial_d.run_for_errors(Tf=0.01, dt=5e-4)
    e_k = float(s_k.overall_combined_error)
    e_d = float(s_d.overall_combined_error)
    assert abs(e_d - e_k) / e_k < 1e-8, f"direct {e_d} vs krylov {e_k}"


def test_direct_inside_mixed_refinement():
    """precision='mixed' + linear_solver='direct': f32 BCR inner solves under
    f64 iterative refinement reach the f64 study error."""
    from na_dd_tpu.harness.studies import _make_trial, study_consts
    from na_dd_tpu.mms import cases as mms_cases

    trial_k = _make_trial(
        mms_cases.MMSCasePol, 16, 50.0, mc=study_consts("pol"), krylov_unroll=8
    )
    e_k = float(trial_k.run_for_errors(Tf=0.01, dt=5e-4).overall_combined_error)
    trial_md = _make_trial(
        mms_cases.MMSCasePol, 16, 50.0, mc=study_consts("pol"),
        precision="mixed", linear_solver="direct",
    )
    e_md = float(trial_md.run_for_errors(Tf=0.01, dt=5e-4).overall_combined_error)
    assert abs(e_md - e_k) / e_k < 1e-8, f"mixed+direct {e_md} vs f64 {e_k}"


def test_direct_requires_assembled_stencils():
    from na_dd_tpu.core import FieldRegHCsTriple, MMSForcingRegHCsTriple
    from na_dd_tpu.integrators import PCTrapezoidalRegHCsTriple
    from na_dd_tpu.models import Model02
    from na_dd_tpu.harness.studies import study_consts
    from na_dd_tpu.mms import cases as mms_cases

    grid = make_uniform_grid(8, 8)
    model = Model02(study_consts("pol"))
    mms = mms_cases.MMSCasePol(grid, model=model)
    forcing = MMSForcingRegHCsTriple(
        mms_case=mms, model=model, regularization_factor=50.0
    )
    field = FieldRegHCsTriple(
        grid=grid, model=model, forcing=forcing, regularization_factor=50.0
    )
    with pytest.raises(ValueError, match="assemble_stencil"):
        PCTrapezoidalRegHCsTriple(
            field, regularization_factor=50.0,
            assemble_stencil=False, linear_solver="direct",
        )
    with pytest.raises(ValueError, match="linear_solver"):
        PCTrapezoidalRegHCsTriple(
            field, regularization_factor=50.0, linear_solver="superlu"
        )


def test_bcr_matmuls_request_highest_precision():
    """Every dot_general in the lowered BCR jaxpr must carry HIGHEST
    precision.  On TPU the DEFAULT einsum precision is bf16 MXU passes,
    which degrades the f32 inner solve from ~kappa*6e-8 to ~kappa*4e-3 per
    mixed-refinement pass and stalls the refinement short of the f64
    tolerance (observed as spurious convergence warnings in
    studies/direct_stiff_probe.py before the fix).  CPU ignores the
    attribute, so assert it structurally on the jaxpr."""
    import jax

    g = make_uniform_grid(9, 9)
    rng = np.random.RandomState(SEED)
    st = _random_stencil5(g, rng)
    mask = g.interior_mask
    b = jnp.asarray(rng.rand(*g.full_shape)) * mask
    jaxpr = jax.make_jaxpr(lambda: stencil5_solve_direct(st, b, mask))()

    def walk(jx):
        for eqn in jx.eqns:
            if eqn.primitive.name == "dot_general":
                prec = eqn.params.get("precision")
                assert prec is not None and all(
                    p == jax.lax.Precision.HIGHEST
                    for p in (prec if isinstance(prec, tuple) else (prec,))
                ), f"dot_general without HIGHEST precision: {eqn}"
            for sub in eqn.params.values():
                if hasattr(sub, "jaxpr"):
                    walk(sub.jaxpr)
                elif isinstance(sub, (list, tuple)):
                    for s in sub:
                        if hasattr(s, "jaxpr"):
                            walk(s.jaxpr)

    walk(jaxpr.jaxpr)
