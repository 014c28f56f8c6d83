"""Multi-chip path tests on the 8-virtual-device CPU mesh: halo-exchange
shifts, sharded step, and sharded whole-simulation must match the local
implementation to machine precision."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from na_dd_tpu.core import FieldRegHCsTriple, MMSForcingRegHCsTriple, State
from na_dd_tpu.integrators import PCTrapezoidalRegHCsTriple
from na_dd_tpu.mms import state_from_mms_when
from na_dd_tpu.mms.cases import MMSCasePol
from na_dd_tpu.models import Model02, default_model_consts
from na_dd_tpu.ops import LOCAL_OPS, make_grid
from na_dd_tpu.parallel import (
    HaloOps,
    build_sharded_simulation,
    build_sharded_step,
    make_mesh,
    shard_grid_and_state,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _mk(N=15, M=15):
    g = make_grid(np.linspace(0, 1, N + 1), np.linspace(0, 1, M + 1))
    model = Model02(default_model_consts)
    mms = MMSCasePol(g, model=model)
    forcing = MMSForcingRegHCsTriple(mms_case=mms, model=model, regularization_factor=50.0)
    field = FieldRegHCsTriple(grid=g, model=model, forcing=forcing, regularization_factor=50.0)
    integ = PCTrapezoidalRegHCsTriple(field, regularization_factor=50.0, num_newton_steps=2)
    s0 = state_from_mms_when(mms_case=mms, t=0.0, grid=g)
    return g, model, mms, integ, s0


@pytest.mark.parametrize("axis", ["x", "y"])
def test_halo_shifts_match_local(axis):
    rng = np.random.RandomState(3)
    u = jnp.asarray(rng.rand(16, 16))
    mesh = make_mesh((8,), (axis,))
    spec = P(axis, None) if axis == "x" else P(None, axis)
    hops = HaloOps(
        axis_x=axis if axis == "x" else None,
        nx=8 if axis == "x" else 1,
        axis_y=axis if axis == "y" else None,
        ny=8 if axis == "y" else 1,
    )

    def f(u):
        return (
            hops.shift_xm(u),
            hops.shift_xp(u),
            hops.shift_ym(u),
            hops.shift_yp(u),
            hops.asum(u * u),
        )

    sharded = jax.jit(
        jax.shard_map(f, mesh=mesh, in_specs=(spec,), out_specs=(spec, spec, spec, spec, P()), check_vma=False)
    )
    got = sharded(jax.device_put(u, jax.sharding.NamedSharding(mesh, spec)))
    expect = (
        LOCAL_OPS.shift_xm(u),
        LOCAL_OPS.shift_xp(u),
        LOCAL_OPS.shift_ym(u),
        LOCAL_OPS.shift_yp(u),
        LOCAL_OPS.asum(u * u),
    )
    for a, b in zip(got[:4], expect[:4]):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    # reductions differ only by summation order (psum of partials)
    assert float(got[4]) == pytest.approx(float(expect[4]), rel=1e-13)


def test_2d_mesh_halo_shifts():
    rng = np.random.RandomState(4)
    u = jnp.asarray(rng.rand(8, 12))
    mesh = make_mesh((4, 2), ("x", "y"))
    spec = P("x", "y")
    hops = HaloOps(axis_x="x", nx=4, axis_y="y", ny=2)

    def f(u):
        return hops.shift_xm(u) + hops.shift_yp(u), hops.asum(u)

    sharded = jax.jit(
        jax.shard_map(f, mesh=mesh, in_specs=(spec,), out_specs=(spec, P()), check_vma=False)
    )
    got_arr, got_sum = sharded(jax.device_put(u, jax.sharding.NamedSharding(mesh, spec)))
    expect = LOCAL_OPS.shift_xm(u) + LOCAL_OPS.shift_yp(u)
    assert np.array_equal(np.asarray(got_arr), np.asarray(expect))
    assert np.asarray(got_sum) == pytest.approx(float(jnp.sum(u)), rel=1e-14)


def test_sharded_step_matches_local():
    g, model, mms, integ, s0 = _mk()
    s1_local = integ.step(s0, t0=0.0, dt=1e-3)

    mesh = make_mesh((8,), ("x",))
    gs, ss = shard_grid_and_state(mesh, g, s0)
    step = build_sharded_step(integ, mesh)
    s1_sh, diag = step(gs, ss, 0.0, 1e-3)
    for v in State._fields:
        d = np.max(np.abs(np.asarray(getattr(s1_local, v)) - np.asarray(getattr(s1_sh, v))))
        assert d < 1e-13, f"{v}: {d}"
    assert bool(diag["hcs_ok"])


def test_sharded_step_2d_mesh_matches_local():
    """Full PC step on a 2-D (4×2) mesh — halos in both axes — equals local."""
    g, model, mms, integ, s0 = _mk(N=7, M=7)  # 8×8 arrays: 4 row × 2 col shards
    s1_local = integ.step(s0, t0=0.0, dt=1e-3)

    mesh = make_mesh((4, 2), ("x", "y"))
    gs, ss = shard_grid_and_state(mesh, g, s0, axis_x="x", axis_y="y")
    step = build_sharded_step(integ, mesh, axis_x="x", axis_y="y")
    s1_sh, diag = step(gs, ss, 0.0, 1e-3)
    for v in State._fields:
        d = np.max(np.abs(np.asarray(getattr(s1_local, v)) - np.asarray(getattr(s1_sh, v))))
        assert d < 1e-12, f"{v}: {d}"


def test_sharded_simulation_matches_local():
    from na_dd_tpu.harness import run_simulation_collect_data

    g, model, mms, integ, s0 = _mk()
    num_steps, dt = 5, 1e-3

    series, dt_adj = run_simulation_collect_data(
        grid=g,
        integrator=integ,
        exact_sol_pack=mms,
        initial_state=s0,
        Tf=num_steps * dt,
        dt=dt,
        variable_names=list(State._fields),
        integral_vars=["T", "cl", "cd"],
    )

    mesh = make_mesh((8,), ("x",))
    gs, ss = shard_grid_and_state(mesh, g, s0)
    sim = build_sharded_simulation(
        integ, mesh, mms_case=mms, num_steps=num_steps, t0=0.0, dt=dt
    )
    _s_final, (h0, g0, ys) = sim(gs, ss)
    h_sq, grad_sq, _small = ys
    for v in State._fields:
        local_h = series.h_norm_sq_errors[v]
        sharded_h = np.concatenate([[float(h0[v])], np.asarray(h_sq[v])])
        # psum-of-partials vs single global sum: summation-order noise only
        np.testing.assert_allclose(sharded_h, local_h, rtol=1e-8, atol=1e-22)


def test_sharded_simulation_2d_mesh_matches_local():
    """Whole-simulation error-series parity on the 4×2 mesh: a y-axis halo
    bug that only bites after multiple steps would be caught here (the
    single-step 2-D test above cannot see it)."""
    from na_dd_tpu.harness import run_simulation_collect_data

    g, model, mms, integ, s0 = _mk(N=7, M=7)  # 8×8 arrays: 4 row × 2 col shards
    num_steps, dt = 5, 1e-3

    series, _dt_adj = run_simulation_collect_data(
        grid=g,
        integrator=integ,
        exact_sol_pack=mms,
        initial_state=s0,
        Tf=num_steps * dt,
        dt=dt,
        variable_names=list(State._fields),
        integral_vars=["T", "cl", "cd"],
    )

    mesh = make_mesh((4, 2), ("x", "y"))
    gs, ss = shard_grid_and_state(mesh, g, s0, axis_x="x", axis_y="y")
    sim = build_sharded_simulation(
        integ, mesh, mms_case=mms, num_steps=num_steps, t0=0.0, dt=dt,
        axis_x="x", axis_y="y",
    )
    s_final, (h0, g0, ys) = sim(gs, ss)
    h_sq, grad_sq, small = ys
    assert bool(np.all(np.asarray(small["hcs_ok"])))
    for v in State._fields:
        local_h = series.h_norm_sq_errors[v]
        sharded_h = np.concatenate([[float(h0[v])], np.asarray(h_sq[v])])
        np.testing.assert_allclose(sharded_h, local_h, rtol=1e-8, atol=1e-22)
        local_g = series.grad_h_norm_p_sq_errors[v]
        sharded_g = np.concatenate([[float(g0[v])], np.asarray(grad_sq[v])])
        np.testing.assert_allclose(sharded_g, local_g, rtol=1e-8, atol=1e-22)


def test_sharded_mixed_precision_step_matches_local():
    """precision='mixed' under shard_map: the f32 inner solves' dots psum in
    f32 and the f64 refinement residuals psum in f64 — the sharded mixed
    step must reproduce the local mixed step (same summation-order caveat as
    the full-precision test)."""
    g = make_grid(np.linspace(0, 1, 16), np.linspace(0, 1, 16))
    model = Model02(default_model_consts)
    mms = MMSCasePol(g, model=model)
    forcing = MMSForcingRegHCsTriple(
        mms_case=mms, model=model, regularization_factor=50.0
    )
    field = FieldRegHCsTriple(
        grid=g, model=model, forcing=forcing, regularization_factor=50.0
    )
    integ = PCTrapezoidalRegHCsTriple(
        field, regularization_factor=50.0, precision="mixed", krylov_unroll=8
    )
    s0 = state_from_mms_when(mms_case=mms, t=0.0, grid=g)

    s_local, _ = jax.jit(integ.step_fn, static_argnums=1)(
        g, LOCAL_OPS, s0, 0.0, 1e-3
    )

    mesh = make_mesh((8,), ("x",))
    gs, ss = shard_grid_and_state(mesh, g, s0)
    step = build_sharded_step(integ, mesh)
    s_sharded, diag = step(gs, ss, 0.0, 1e-3)
    assert bool(diag["krylov_converged"])  # refinement reaches the f64 target
    for v in State._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(s_sharded, v)),
            np.asarray(getattr(s_local, v)),
            rtol=0,
            atol=1e-12,
            err_msg=v,
        )


@pytest.mark.parametrize("mesh_shape", [(8,), (4, 2)])
def test_sharded_direct_solver_matches_local(mesh_shape):
    """linear_solver='direct' under shard_map: BCR cannot run per-shard (it
    addresses whole grid rows with raw indexing), so the sharded path
    replicates it — all-gather the assembled planes, full-grid BCR on every
    device, slice the local shard back out
    (ops/direct_solve.stencil5_solve_direct_ops).  The gathered system is
    bitwise the single-device system, so the step must match local exactly
    (only the residual-diagnostic psums carry summation-order noise)."""
    g, model, mms, _, s0 = _mk(N=7, M=7)
    forcing = MMSForcingRegHCsTriple(
        mms_case=mms, model=model, regularization_factor=50.0
    )
    fld = FieldRegHCsTriple(
        grid=g, model=model, forcing=forcing, regularization_factor=50.0
    )
    integ = PCTrapezoidalRegHCsTriple(
        fld, regularization_factor=50.0, linear_solver="direct",
        num_newton_steps=2,
    )
    s1_local = integ.step(s0, t0=0.0, dt=1e-3)

    if len(mesh_shape) == 1:
        mesh = make_mesh(mesh_shape, ("x",))
        gs, ss = shard_grid_and_state(mesh, g, s0)
        step = build_sharded_step(integ, mesh)
    else:
        mesh = make_mesh(mesh_shape, ("x", "y"))
        gs, ss = shard_grid_and_state(mesh, g, s0, axis_x="x", axis_y="y")
        step = build_sharded_step(integ, mesh, axis_x="x", axis_y="y")
    s1_sh, diag = step(gs, ss, 0.0, 1e-3)
    assert bool(diag["krylov_converged"])
    for v in State._fields:
        d = np.max(
            np.abs(np.asarray(getattr(s1_local, v)) - np.asarray(getattr(s1_sh, v)))
        )
        assert d < 1e-13, f"{v}: {d}"


def test_sharded_mixed_direct_step_matches_local():
    """precision='mixed' + linear_solver='direct' sharded: f32 replicated BCR
    inner solves under f64 refinement residuals must match the local mixed
    direct step."""
    g, model, mms, _, s0 = _mk(N=7, M=7)
    forcing = MMSForcingRegHCsTriple(
        mms_case=mms, model=model, regularization_factor=50.0
    )
    fld = FieldRegHCsTriple(
        grid=g, model=model, forcing=forcing, regularization_factor=50.0
    )
    integ = PCTrapezoidalRegHCsTriple(
        fld, regularization_factor=50.0, linear_solver="direct",
        precision="mixed", num_newton_steps=2,
    )
    s_local, _ = jax.jit(integ.step_fn, static_argnums=1)(
        g, LOCAL_OPS, s0, 0.0, 1e-3
    )
    mesh = make_mesh((8,), ("x",))
    gs, ss = shard_grid_and_state(mesh, g, s0)
    step = build_sharded_step(integ, mesh)
    s_sh, diag = step(gs, ss, 0.0, 1e-3)
    assert bool(diag["krylov_converged"])
    for v in State._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(s_sh, v)),
            np.asarray(getattr(s_local, v)),
            rtol=0,
            atol=1e-12,
            err_msg=v,
        )


def test_data_parallel_ensemble_matches_local():
    """The serving axis: a vmapped ensemble (independent simulations over a
    traced eta screen) with its BATCH axis sharded over the 8-device mesh
    must match the unsharded run bit-for-bit — each member is independent,
    so pure sharding annotations partition the program with zero
    collectives on the hot path (studies/ensemble_throughput.py --dp)."""
    from jax.sharding import Mesh, NamedSharding

    g, model, mms, _integ, s0 = _mk(N=7, M=7)

    def simulate_one(eta):
        forcing = MMSForcingRegHCsTriple(
            mms_case=mms, model=model, regularization_factor=eta
        )
        field = FieldRegHCsTriple(
            grid=g, model=model, forcing=forcing, regularization_factor=eta
        )
        integ = PCTrapezoidalRegHCsTriple(
            field, regularization_factor=eta, track_residuals=False,
            krylov_unroll=8,
        )

        def body(s, k):
            s1, _diag = integ.step_fn(g, LOCAL_OPS, s, k * 1e-3, 1e-3)
            return s1, None

        s_final, _ = jax.lax.scan(body, s0, jnp.arange(3, dtype=jnp.result_type(float)))
        return s_final

    etas = jnp.linspace(20.0, 200.0, 8)
    run = jax.jit(jax.vmap(simulate_one))
    out_local = jax.block_until_ready(run(etas))

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("b",))
    etas_sh = jax.device_put(etas, NamedSharding(mesh, P("b")))
    out_dp = jax.block_until_ready(run(etas_sh))
    for v in State._fields:
        d = np.max(np.abs(np.asarray(getattr(out_dp, v)) - np.asarray(getattr(out_local, v))))
        assert d == 0.0, (v, d)


def test_sharded_step_gradient_matches_local():
    """Distributed adjoints: jax.grad of an observable of the SHARDED step
    (ppermute halos + psum reductions inside shard_map, IFT adjoints on the
    Newton solves) must match the gradient of the local step — every
    collective has an exact transpose, so sharding must not change the
    derivative."""
    g, _model, _mms, _integ, s0 = _mk()
    forcing = _integ.semi_discrete_field.forcing
    field = FieldRegHCsTriple(
        grid=g, model=_model, forcing=forcing, regularization_factor=50.0
    )
    integ = PCTrapezoidalRegHCsTriple(
        field, regularization_factor=50.0, krylov_unroll=8, differentiable=True
    )

    mesh = make_mesh((8,), ("x",))
    gs, ss = shard_grid_and_state(mesh, g, s0)
    step_sh = build_sharded_step(integ, mesh)

    def loss_sharded(s):
        s1, _d = step_sh(gs, s, 0.0, 1e-3)
        return jnp.sum(s1.T * s1.T) + jnp.sum(s1.cd)

    def loss_local(s):
        s1, _d = jax.jit(integ.step_fn, static_argnums=1)(g, LOCAL_OPS, s, 0.0, 1e-3)
        return jnp.sum(s1.T * s1.T) + jnp.sum(s1.cd)

    g_sh = jax.grad(loss_sharded)(ss)
    g_lo = jax.grad(loss_local)(s0)
    for v in ("cp", "T", "cl", "cd", "cs"):
        a = np.asarray(getattr(g_sh, v))
        b = np.asarray(getattr(g_lo, v))
        np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-12)
