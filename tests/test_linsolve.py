"""Matrix-free solver tests: BiCGStab and red/black diagonal probing checked
against dense NumPy linear algebra on explicit 5-diagonal operators."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from na_dd_tpu.ops import LOCAL_OPS, linsolve, make_uniform_grid

OPS = LOCAL_OPS
SEED = 1234


def _random_stencil_operator(g, rng, *, diag_dominant=True):
    """Random 5-point stencil acting on interior grid functions."""
    shape = g.full_shape
    c = rng.rand(*shape) + (4.0 if diag_dominant else 0.5)
    w_xm = rng.rand(*shape) * 0.5
    w_xp = rng.rand(*shape) * 0.5
    w_ym = rng.rand(*shape) * 0.5
    w_yp = rng.rand(*shape) * 0.5
    mask = g.interior_mask

    def matvec(u):
        um = u * mask
        out = (
            c * um
            + w_xm * OPS.shift_xm(um)
            + w_xp * OPS.shift_xp(um)
            + w_ym * OPS.shift_ym(um)
            + w_yp * OPS.shift_yp(um)
        )
        return out * mask

    return matvec


def _dense_from_matvec(matvec, g):
    n = (g.N + 1) * (g.M + 1)
    cols = []
    for idx in range(n):
        e = np.zeros(n)
        e[idx] = 1.0
        cols.append(np.asarray(matvec(jnp.asarray(e.reshape(g.full_shape)))).ravel())
    return np.stack(cols, axis=1)


def test_probe_diag_exact():
    g = make_uniform_grid(6, 5)
    rng = np.random.RandomState(SEED)
    matvec = _random_stencil_operator(g, rng)
    dense = _dense_from_matvec(matvec, g)
    red, black = linsolve.checkerboard_masks(g)
    diag = np.asarray(linsolve.probe_diag(matvec, red * g.interior_mask, black * g.interior_mask))
    assert np.allclose(diag.ravel(), np.diag(dense), rtol=1e-14, atol=1e-14)


@pytest.mark.parametrize("diag_dominant", [True, False])
def test_bicgstab_solves_to_machine_precision(diag_dominant):
    g = make_uniform_grid(6, 7)
    rng = np.random.RandomState(SEED + 1)
    matvec = _random_stencil_operator(g, rng, diag_dominant=diag_dominant)
    x_true = jnp.asarray(rng.rand(*g.full_shape)) * g.interior_mask
    b = matvec(x_true)
    dot = lambda u, v: OPS.asum(u * v)
    x, info = linsolve.bicgstab(
        matvec, b, jnp.zeros_like(b), dot=dot, tol=1e-14, maxiter=500
    )
    err = float(jnp.max(jnp.abs(x - x_true)))
    assert err < 1e-10, f"bicgstab error {err}, iters {info['iters']}"


def test_probe_stencil_exact():
    """5-color probing recovers all five coefficient planes exactly."""
    g = make_uniform_grid(7, 6)
    rng = np.random.RandomState(SEED + 9)
    matvec = _random_stencil_operator(g, rng)
    st = linsolve.probe_stencil(matvec, g)
    # assembled stencil reproduces the operator action on random vectors
    for _ in range(3):
        w = jnp.asarray(rng.rand(*g.full_shape))
        np.testing.assert_allclose(
            np.asarray(st.apply(OPS, w)), np.asarray(matvec(w)), rtol=1e-13, atol=1e-15
        )
    # and its diagonal equals the dense diagonal
    dense = _dense_from_matvec(matvec, g)
    np.testing.assert_allclose(np.asarray(st.c0).ravel(), np.diag(dense), rtol=1e-13)


def test_bicgstab_unrolled_matches_while():
    g = make_uniform_grid(6, 7)
    rng = np.random.RandomState(SEED + 4)
    matvec = _random_stencil_operator(g, rng)
    x_true = jnp.asarray(rng.rand(*g.full_shape)) * g.interior_mask
    b = matvec(x_true)
    dot = lambda u, v: OPS.asum(u * v)
    x_w, _ = linsolve.bicgstab(matvec, b, jnp.zeros_like(b), dot=dot, tol=1e-14, maxiter=100)
    x_u, info = linsolve.bicgstab_unrolled(
        matvec, b, jnp.zeros_like(b), dot=dot, tol=1e-14, iters=60
    )
    np.testing.assert_allclose(np.asarray(x_u), np.asarray(x_w), rtol=1e-9, atol=1e-12)
    assert float(jnp.max(jnp.abs(x_u - x_true))) < 1e-9


def test_bicgstab_scanned_matches_unrolled():
    """The lax.scan formulation runs the exact same masked update as the
    unrolled straight-line solver; it must take the SAME number of effective
    iterations and agree to ~1 ulp (XLA fuses the scan body and straight-line
    code slightly differently, so exact bitwise equality across the two
    program shapes is not achievable)."""
    g = make_uniform_grid(6, 7)
    rng = np.random.RandomState(SEED + 9)
    matvec = _random_stencil_operator(g, rng)
    x_true = jnp.asarray(rng.rand(*g.full_shape)) * g.interior_mask
    b = matvec(x_true)
    dot = lambda u, v: OPS.asum(u * v)
    for iters in (4, 16):
        x_u, info_u = linsolve.bicgstab_unrolled(
            matvec, b, jnp.zeros_like(b), dot=dot, tol=1e-14, iters=iters
        )
        x_s, info_s = jax.jit(
            lambda bb: linsolve.bicgstab_scanned(
                matvec, bb, jnp.zeros_like(bb), dot=dot, tol=1e-14, iters=iters
            )
        )(b)
        np.testing.assert_allclose(
            np.asarray(x_s), np.asarray(x_u), rtol=1e-13, atol=1e-14
        )
        assert int(info_u["iters"]) == int(info_s["iters"])


def test_probe_stencil_vmapped_matches_plain():
    g = make_uniform_grid(9, 7)
    rng = np.random.RandomState(SEED + 11)
    mv = _random_stencil_operator(g, rng)
    a = linsolve.probe_stencil(mv, g)
    b = linsolve.probe_stencil_vmapped(mv, g)
    for name in a._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(b, name)), np.asarray(getattr(a, name)), rtol=0, atol=1e-15
        )


def test_bicgstab_zero_rhs():
    g = make_uniform_grid(4, 4)
    rng = np.random.RandomState(SEED + 2)
    matvec = _random_stencil_operator(g, rng)
    b = jnp.zeros(g.full_shape)
    x, info = linsolve.bicgstab(matvec, b, b, dot=lambda u, v: OPS.asum(u * v))
    assert float(jnp.max(jnp.abs(x))) == 0.0
    assert int(info["iters"]) == 0


def test_newton_inner_solve_matches_dense():
    """interior (2I - dt J) delta = rhs — matrix-free result vs dense solve."""
    g = make_uniform_grid(5, 6)
    rng = np.random.RandomState(SEED + 3)
    dt = 1e-2
    u0 = jnp.asarray(rng.rand(*g.full_shape))
    coef = jnp.asarray(rng.rand(*g.full_shape) + 0.5)

    def residual_fn(u):
        # a representative nonlinear stencil residual
        lap = (
            OPS.shift_xm(u) + OPS.shift_xp(u) + OPS.shift_ym(u) + OPS.shift_yp(u)
            - 4.0 * u
        )
        return (lap * coef - u * u) * g.interior_mask

    rhs = jnp.asarray(rng.rand(*g.full_shape)) * g.interior_mask
    red, black = linsolve.checkerboard_masks(g)
    f0, delta, info = linsolve.newton_inner_solve(
        residual_fn, u0, rhs, g, OPS, dt, red=red, black=black, tol=1e-14, maxiter=500
    )

    _, matvec = linsolve.interior_linearized_matvec(residual_fn, u0, g, dt)
    dense = _dense_from_matvec(matvec, g)
    mask_flat = np.asarray(g.interior_mask).ravel().astype(bool)
    A = dense[np.ix_(mask_flat, mask_flat)]
    b = np.asarray(rhs).ravel()[mask_flat]
    delta_dense = np.linalg.solve(A, b)
    assert np.allclose(
        np.asarray(delta).ravel()[mask_flat], delta_dense, rtol=1e-9, atol=1e-12
    )
    assert float(jnp.max(jnp.abs(delta * (1 - g.interior_mask)))) == 0.0


def test_stencil5_transpose_is_exact_dense_transpose():
    """Stencil5.transpose must reproduce the dense matrix transpose exactly
    (it is the adjoint-system operator of the differentiable direct/mixed
    solve paths — see pc_trapezoidal's ift_plane_solve)."""
    rng = np.random.default_rng(SEED)
    n = 7
    mk = lambda: jnp.asarray(rng.standard_normal((n, n)))  # noqa: E731
    st = linsolve.Stencil5(c0=mk(), cxm=mk(), cxp=mk(), cym=mk(), cyp=mk())
    st_T = st.transpose(OPS)

    def dense(stx):
        cols = []
        for idx in range(n * n):
            e = np.zeros(n * n)
            e[idx] = 1.0
            cols.append(
                np.asarray(stx.apply(OPS, jnp.asarray(e.reshape(n, n)))).ravel()
            )
        return np.stack(cols, axis=1)

    np.testing.assert_array_equal(dense(st).T, dense(st_T))
    # involution: (Aᵀ)ᵀ = A up to the zero rows the shifts introduce at the
    # array edge (plane values shifted out and back are exactly zeroed)
    st_TT = st_T.transpose(OPS)
    np.testing.assert_array_equal(dense(st), dense(st_TT))
