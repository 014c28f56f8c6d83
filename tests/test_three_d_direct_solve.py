"""Exact BCR direct solve of Stencil7 systems (three_d/direct_solve.py).

The 3-D front-end of the block-cyclic-reduction solver: one dense block per
interior x-plane (the 2-D structure with "row" -> "plane"); the generic BCR
core is shared with ops/direct_solve.py and tested there.  Checked against
dense NumPy linear algebra on explicit masked 7-point operators, and
end-to-end as a drop-in for the 3-D Krylov Newton solves
(``linear_solver="direct"``), including inside the mixed-precision
refinement wrapper and under a 2-D device mesh (replicated gather solve).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from na_dd_tpu.core.state import State
from na_dd_tpu.models import Model02, default_model_consts
from na_dd_tpu.parallel import make_mesh
from na_dd_tpu.three_d import (
    HaloOps3,
    LOCAL_OPS3,
    MMSCaseExpSin3,
    make_setup3,
    make_uniform_grid3,
    mms_error3,
    state_from_mms_when3,
)
from na_dd_tpu.three_d.diffusion import Stencil7
from na_dd_tpu.three_d.direct_solve import stencil7_solve_direct

MC = default_model_consts._replace(
    K1=1e-3, K2=1e-3, K3=1e-3, K4=1e-3, Dl_max=1e-5, Kd=1e-2, Sd=1.0, Dd_max=1e-6
)
ETA = 50.0
SEED = 86420


@pytest.fixture(scope="module")
def model():
    return Model02(MC._replace(gamma_T=1e-2))


def _random_stencil7(shape, rng, *, diag_shift=6.0):
    mk = lambda s=0.0: jnp.asarray(rng.rand(*shape) * 0.5 + s)  # noqa: E731
    return Stencil7(c0=mk(diag_shift), cxm=mk(), cxp=mk(), cym=mk(),
                    cyp=mk(), czm=mk(), czp=mk())


def _dense_from_masked_stencil7(st, mask):
    """Dense matrix of u -> mask * (st @ (mask * u)), identity rows on dead
    nodes (the direct solver's well-posedness convention) — the 3-D twin of
    tests/test_direct_solve._dense_from_masked_stencil."""
    shape = st.c0.shape
    n = int(np.prod(shape))
    mask_flat = np.asarray(mask).ravel()
    eye = np.eye(n)
    cols = []
    for jcol in range(n):
        u = jnp.asarray(eye[jcol].reshape(shape))
        col = np.asarray(st.apply(LOCAL_OPS3, u * mask)).ravel() * mask_flat
        cols.append(col)
    M = np.stack(cols, axis=1)
    dead = mask_flat == 0
    M[dead, :] = 0.0
    M[:, dead] = np.where(np.outer(dead, dead) & np.eye(n, dtype=bool), 1.0, 0.0)[
        :, dead
    ]
    M[dead, dead] = 1.0
    return M


@pytest.mark.parametrize("shape", [(6, 5, 7), (5, 8, 4)])
def test_bcr3_matches_dense_on_interior_mask(shape):
    rng = np.random.RandomState(SEED)
    st = _random_stencil7(shape, rng)
    mask = np.zeros(shape)
    mask[1:-1, 1:-1, 1:-1] = 1.0
    mask = jnp.asarray(mask)
    b = jnp.asarray(rng.rand(*shape)) * mask

    x = stencil7_solve_direct(st, b, mask)

    M = _dense_from_masked_stencil7(st, mask)
    x_dense = np.linalg.solve(M, np.asarray(b).ravel()) * np.asarray(mask).ravel()
    np.testing.assert_allclose(
        np.asarray(x).ravel(), x_dense, rtol=0, atol=1e-12
    )


def test_bcr3_matches_dense_with_dead_interior_rows():
    """Dead interior nodes (batched pad-to-max ladders) become identity
    equations: x = 0 there, and the live sub-system is solved exactly."""
    shape = (7, 6, 5)
    rng = np.random.RandomState(SEED + 1)
    st = _random_stencil7(shape, rng)
    mask = np.zeros(shape)
    mask[1:-1, 1:-1, 1:-1] = 1.0
    mask[2, 2, 2] = 0.0
    mask[4, 1:3, :] = 0.0
    mask = jnp.asarray(mask)
    b = jnp.asarray(rng.rand(*shape)) * mask

    x = stencil7_solve_direct(st, b, mask)
    assert float(jnp.max(jnp.abs(x * (1 - mask)))) == 0.0

    M = _dense_from_masked_stencil7(st, mask)
    x_dense = np.linalg.solve(M, np.asarray(b).ravel()) * np.asarray(mask).ravel()
    np.testing.assert_allclose(
        np.asarray(x).ravel(), x_dense, rtol=0, atol=1e-12
    )


def test_direct3_newton_matches_krylov_end_to_end(model):
    """linear_solver='direct' reproduces the 3-D Krylov MMS error ~exactly
    (both drive the same Newton iteration; the linear solves differ only at
    rounding/tolerance level) — the 3-D twin of
    tests/test_direct_solve.py::test_direct_newton_matches_krylov_end_to_end.
    """
    common = dict(N=5, model=model, Tf=0.01, dt=2.5e-3)
    e_k = mms_error3(
        MMSCaseExpSin3, **common, integrator_params=dict(krylov_unroll=24)
    )
    e_d = mms_error3(
        MMSCaseExpSin3, **common, integrator_params=dict(linear_solver="direct")
    )
    assert abs(e_d - e_k) / e_k < 1e-8, f"direct {e_d} vs krylov {e_k}"


def test_direct3_inside_mixed_refinement(model):
    """precision='mixed' + linear_solver='direct' in 3-D: f32 plane-block BCR
    inner solves under f64 iterative refinement reach the f64 error."""
    common = dict(N=5, model=model, Tf=0.01, dt=2.5e-3)
    e_k = mms_error3(
        MMSCaseExpSin3, **common, integrator_params=dict(krylov_unroll=24)
    )
    e_md = mms_error3(
        MMSCaseExpSin3,
        **common,
        integrator_params=dict(precision="mixed", linear_solver="direct"),
    )
    assert abs(e_md - e_k) / e_k < 1e-8, f"mixed+direct {e_md} vs f64 {e_k}"


def test_sharded_direct3_matches_local(model):
    """One full 3-D PC step with linear_solver='direct' on a (4, 2) mesh:
    the replicated gather solve (Ops3.gather_full -> full-grid BCR ->
    local_slice) assembles bitwise the single-device system, so the sharded
    step must match the local step exactly."""
    g, case, field, integ = make_setup3(
        MMSCaseExpSin3,
        model=model,
        grid=make_uniform_grid3(7, 7, 6),  # 8 x 8 x 7 arrays: 4 x 2 shards
        integrator_params=dict(linear_solver="direct"),
    )
    s0 = state_from_mms_when3(mms_case=case, t=0.0, grid=g)
    t0, dt = 0.0, 1e-3

    s1_local, _diag_local = integ.step_fn(g, LOCAL_OPS3, s0, t0, dt)

    mesh = make_mesh((4, 2), ("x", "y"))
    hops = HaloOps3(axis_x="x", nx=4, axis_y="y", ny=2)
    spec = P("x", "y")

    def raw(g_sh, s_sh):
        s1, diag = integ.step_fn(g_sh, hops, s_sh, t0, dt)
        return s1, (diag.krylov_iters, diag.krylov_converged)

    sharded = jax.jit(
        jax.shard_map(
            raw,
            mesh=mesh,
            in_specs=(spec, spec),
            out_specs=(spec, P()),
            check_vma=True,
        )
    )
    put = lambda a: jax.device_put(a, NamedSharding(mesh, P("x", "y", None)))  # noqa: E731
    s1_sh, (_iters, conv) = sharded(jax.tree.map(put, g), jax.tree.map(put, s0))
    jax.block_until_ready(s1_sh)
    assert bool(conv)
    for v in State._fields:
        d = np.max(np.abs(np.asarray(getattr(s1_sh, v)) - np.asarray(getattr(s1_local, v))))
        assert d < 1e-12, (v, d)
