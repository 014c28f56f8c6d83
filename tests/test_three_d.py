"""3-D extension tests: shift semantics, closed-form 7-point planes vs the
exact linearization, diagonal probing parity, MMS convergence of the
Crank–Nicolson heat solve, and sharded (2-D mesh) parity of the same step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from na_dd_tpu.three_d import (
    LOCAL_OPS3,
    HaloOps3,
    Stencil7,
    crank_nicolson_heat_step,
    diffusion_planes3,
    heat_mms_error,
    make_grid3,
    make_uniform_grid3,
)
from na_dd_tpu.three_d.diffusion import diffusion_apply3
from na_dd_tpu.parallel import make_mesh


def _rand_grid3(rng, N=5, M=6, Pn=4):
    """Non-uniform grid: cumulative positive random spacings on [0,1]."""

    def coords(n):
        d = 0.5 + rng.rand(n)
        c = np.concatenate([[0.0], np.cumsum(d)])
        return c / c[-1]

    return make_grid3(coords(N), coords(M), coords(Pn))


def test_local_shifts_match_numpy():
    rng = np.random.RandomState(0)
    u = rng.rand(4, 5, 6)
    got = LOCAL_OPS3.shift_xm(jnp.asarray(u))
    exp = np.zeros_like(u)
    exp[1:] = u[:-1]
    assert np.array_equal(np.asarray(got), exp)
    got = LOCAL_OPS3.shift_zp(jnp.asarray(u))
    exp = np.zeros_like(u)
    exp[:, :, :-1] = u[:, :, 1:]
    assert np.array_equal(np.asarray(got), exp)


def test_diffusion_planes_match_linearization():
    """The closed-form 7-point planes must equal the exact Jacobian of the
    mimetic diffusion operator — checked by applying both to random vectors
    on a NON-uniform grid with variable coefficients."""
    rng = np.random.RandomState(1)
    g = _rand_grid3(rng)
    ax = jnp.asarray(0.5 + rng.rand(*g.full_shape))
    ay = jnp.asarray(0.5 + rng.rand(*g.full_shape))
    az = jnp.asarray(0.5 + rng.rand(*g.full_shape))

    st = diffusion_planes3(g, LOCAL_OPS3, ax, ay, az)
    _, lin = jax.linearize(
        lambda u: diffusion_apply3(LOCAL_OPS3, g, ax, ay, az, u), g.make_full0()
    )
    for _ in range(3):
        w = jnp.asarray(rng.randn(*g.full_shape))
        np.testing.assert_allclose(
            np.asarray(st.apply(LOCAL_OPS3, w)),
            np.asarray(lin(w)),
            rtol=0,
            atol=1e-12,
        )


def test_seven_point_diag_probing():
    """(i+j+k)-parity probing extracts the exact diagonal: a 7-point stencil
    couples only opposite-parity neighbors."""
    rng = np.random.RandomState(2)
    g = _rand_grid3(rng)
    ax = jnp.asarray(0.5 + rng.rand(*g.full_shape))
    st = diffusion_planes3(g, LOCAL_OPS3, ax, ax, ax)
    red = g.red_mask
    black = 1.0 - red
    diag = st.apply(LOCAL_OPS3, red) * red + st.apply(LOCAL_OPS3, black) * black
    np.testing.assert_allclose(np.asarray(diag), np.asarray(st.c0), rtol=0, atol=1e-13)


def test_heat_mms_spatial_convergence():
    """With dt ∝ h, the CN heat solve error must contract at 2nd order."""
    errs = [float(heat_mms_error(N, Tf=0.05, dt=0.05 / (2 * N))) for N in (4, 8, 16)]
    rates = [np.log2(errs[i] / errs[i + 1]) for i in range(len(errs) - 1)]
    assert all(e > 0 for e in errs)
    for r in rates:
        assert abs(r - 2.0) < 0.35, f"rates {rates}, errors {errs}"


def test_heat_solver_converges_tightly():
    """The inner BiCGStab must report convergence and the residual must be at
    solver tolerance, not truncation level."""
    g = make_uniform_grid3(6, 6, 6)
    rng = np.random.RandomState(3)
    aD = jnp.full(g.full_shape, 0.2)
    st = diffusion_planes3(g, LOCAL_OPS3, aD, aD, aD)
    u = jnp.asarray(rng.rand(*g.full_shape)) * g.interior_mask
    f = jnp.asarray(rng.rand(*g.full_shape)) * g.interior_mask
    u1, info = crank_nicolson_heat_step(g, LOCAL_OPS3, st, u, f, f, 1e-2)
    assert bool(info["converged"])
    # verify the linear system residual directly
    mask = g.interior_mask
    lhs = mask * (u1 - 0.5e-2 * st.apply(LOCAL_OPS3, u1))
    rhs = mask * (u + 0.5e-2 * st.apply(LOCAL_OPS3, u) + 1e-2 * f)
    res = float(jnp.max(jnp.abs(lhs - rhs)))
    assert res < 1e-11, res


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_sharded_heat_step_matches_local():
    """One CN step on a (4, 2) mesh sharding the x/y axes of the 3-D arrays
    (z stays on-device): ppermute halo planes + psum dots must reproduce the
    local step to roundoff."""
    g = make_uniform_grid3(7, 7, 6)  # 8 x 8 x 7 arrays: 4 row x 2 col shards
    rng = np.random.RandomState(4)
    aD = jnp.asarray(0.5 + rng.rand(*g.full_shape))
    dt = 1e-2
    u = jnp.asarray(rng.rand(*g.full_shape)) * g.interior_mask
    f = jnp.asarray(rng.rand(*g.full_shape)) * g.interior_mask

    st_local = diffusion_planes3(g, LOCAL_OPS3, aD, aD, aD)
    u1_local, info_local = crank_nicolson_heat_step(
        g, LOCAL_OPS3, st_local, u, f, f, dt
    )

    mesh = make_mesh((4, 2), ("x", "y"))
    hops = HaloOps3(axis_x="x", nx=4, axis_y="y", ny=2)
    spec = P("x", "y")

    def step(g_sh, aD_sh, u_sh, f_sh):
        st = diffusion_planes3(g_sh, hops, aD_sh, aD_sh, aD_sh)
        return crank_nicolson_heat_step(g_sh, hops, st, u_sh, f_sh, f_sh, dt)

    sharded = jax.jit(
        jax.shard_map(
            step,
            mesh=mesh,
            in_specs=(spec, spec, spec, spec),
            out_specs=(spec, P()),
            check_vma=True,
        )
    )
    put = lambda a: jax.device_put(a, NamedSharding(mesh, P("x", "y", None)))
    g_sh = jax.tree.map(put, g)
    u1_sh, info_sh = sharded(g_sh, put(aD), put(u), put(f))
    assert bool(info_sh["converged"])
    d = np.max(np.abs(np.asarray(u1_sh) - np.asarray(u1_local)))
    assert d < 1e-12, d
    # iteration counts may differ by at most one: psum reduction order can
    # legitimately flip a tolerance comparison at the convergence boundary
    assert abs(int(info_sh["iters"]) - int(info_local["iters"])) <= 1
