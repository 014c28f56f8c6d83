"""L0 tests: grid construction, stencil operators, inner products, quadrature.

Strategy mirrors the reference's state-container tests (tests/test_statevars.py):
seeded random grid functions, every operator checked against a direct NumPy
recomputation, on both uniform and non-uniform grids.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from na_dd_tpu.ops import (
    LOCAL_OPS,
    avg_int,
    inner_products as ip,
    make_grid,
    make_uniform_grid,
    stencils as st,
)

SEED = 20250503
OPS = LOCAL_OPS


def _random_grid(nonuniform: bool, N=7, M=9, seed=SEED):
    rng = np.random.RandomState(seed)
    if nonuniform:
        x = np.sort(np.concatenate([[0.0, 1.0], rng.rand(N - 1)]))
        y = np.sort(np.concatenate([[0.0, 1.0], rng.rand(M - 1)]))
    else:
        x = np.linspace(0, 1, N + 1)
        y = np.linspace(0, 1, M + 1)
    g = make_grid(x, y)
    u = rng.rand(N + 1, M + 1)
    v = rng.rand(N + 1, M + 1)
    return g, x, y, u, v


@pytest.fixture(params=[False, True], ids=["uniform", "nonuniform"])
def gridcase(request):
    return _random_grid(request.param)


def test_grid_metric_arrays(gridcase):
    g, x, y, _, _ = gridcase
    N, M = g.N, g.M
    h = np.diff(x)
    k = np.diff(y)
    hh = np.asarray(g.hh)
    kk = np.asarray(g.kk)
    assert np.allclose(hh[1:, 0], h)
    assert hh[0, 0] == 0.0  # 0-sentinel where reference stored inf
    assert np.allclose(kk[0, 1:], k)
    # reciprocals are exact reciprocals where defined, 0 elsewhere
    inv_hh = np.asarray(g.inv_hh)
    assert np.allclose(inv_hh[1:], 1.0 / hh[1:])
    assert np.all(inv_hh[0] == 0.0)
    inv_hp = np.asarray(g.inv_hh_phalf)
    assert np.all(inv_hp[0] == 0.0) and np.all(inv_hp[N] == 0.0)
    hp = np.asarray(g.hh_phalf)
    assert np.allclose(hp[1:N, 0], 0.5 * (h[:-1] + h[1:]))
    # midpoints
    xxp = np.asarray(g.xx_phalf)
    assert np.allclose(xxp[:-1, 0], 0.5 * (x[:-1] + x[1:]))
    assert np.all(xxp[-1] == 0.0)
    # masks
    im = np.asarray(g.interior_mask)
    assert im.sum() == (N - 1) * (M - 1)
    assert np.all(im[0] == 0) and np.all(im[:, 0] == 0)
    assert np.all(im[-1] == 0) and np.all(im[:, -1] == 0)
    # parity mask
    red = np.asarray(g.red_mask)
    ii, jj = np.meshgrid(np.arange(N + 1), np.arange(M + 1), indexing="ij")
    assert np.array_equal(red, ((ii + jj) % 2 == 0).astype(float))


def test_stencil_operators_vs_direct(gridcase):
    g, x, y, u, _ = gridcase
    hh = np.asarray(g.hh)
    kk = np.asarray(g.kk)
    hp = np.asarray(g.hh_phalf)
    kp = np.asarray(g.kk_phalf)

    # Mx: (u[i,j]+u[i-1,j])/2, row0 = 0 (reference Mx_reg, prob1base.py:1499)
    mx = np.zeros_like(u)
    mx[1:, :] = 0.5 * (u[1:, :] + u[:-1, :])
    assert np.allclose(np.asarray(st.Mx(OPS, g, u)), mx)

    my = np.zeros_like(u)
    my[:, 1:] = 0.5 * (u[:, 1:] + u[:, :-1])
    assert np.allclose(np.asarray(st.My(OPS, g, u)), my)

    dxr = np.zeros_like(u)
    dxr[1:, :] = (u[1:, :] - u[:-1, :]) / hh[1:, :]
    assert np.allclose(np.asarray(st.Dx_reg(OPS, g, u)), dxr)

    dyr = np.zeros_like(u)
    dyr[:, 1:] = (u[:, 1:] - u[:, :-1]) / kk[:, 1:]
    assert np.allclose(np.asarray(st.Dy_reg(OPS, g, u)), dyr)

    dxs = np.zeros_like(u)
    dxs[1:-1, :] = (u[2:, :] - u[1:-1, :]) / hp[1:-1, :]
    assert np.allclose(np.asarray(st.Dx_star(OPS, g, u)), dxs)

    dys = np.zeros_like(u)
    dys[:, 1:-1] = (u[:, 2:] - u[:, 1:-1]) / kp[:, 1:-1]
    assert np.allclose(np.asarray(st.Dy_star(OPS, g, u)), dys)


def test_inner_products_vs_sliced_sums(gridcase):
    g, _, _, u, v = gridcase
    hp = np.asarray(g.hh_phalf)
    kp = np.asarray(g.kk_phalf)
    hh = np.asarray(g.hh)
    kk = np.asarray(g.kk)

    ref_H = np.sum(u[1:-1, 1:-1] * v[1:-1, 1:-1] * hp[1:-1, 1:-1] * kp[1:-1, 1:-1])
    assert np.isclose(float(ip.inner_H(OPS, g, u, v)), ref_H, rtol=1e-14)

    ref_pk = np.sum(u[1:, 1:-1] * v[1:, 1:-1] * hh[1:, 1:-1] * kp[1:, 1:-1])
    assert np.isclose(float(ip.inner_pk(OPS, g, u, v)), ref_pk, rtol=1e-14)

    ref_hp = np.sum(u[1:-1, 1:] * v[1:-1, 1:] * hp[1:-1, 1:] * kk[1:-1, 1:])
    assert np.isclose(float(ip.inner_hp(OPS, g, u, v)), ref_hp, rtol=1e-14)

    assert np.isclose(
        float(ip.inner_p(OPS, g, u, v, u, v)),
        float(ip.inner_pk(OPS, g, u, u)) + float(ip.inner_hp(OPS, g, v, v)),
        rtol=1e-14,
    )
    ref_H_uu = np.sum(u[1:-1, 1:-1] ** 2 * hp[1:-1, 1:-1] * kp[1:-1, 1:-1])
    assert float(ip.norm_H(OPS, g, u)) == pytest.approx(np.sqrt(ref_H_uu))


def test_avg_int_exact_for_quadratics(gridcase):
    """3x3 Gauss-Legendre integrates polynomials up to degree 5 exactly."""
    g, x, y, _, _ = gridcase
    N, M = g.N, g.M

    f = lambda p, q: p**3 * q**2 + 2.0 * p + 1.0
    out = np.asarray(avg_int(f, g, OPS))

    # direct exact cell-average over dual cells
    xp = 0.5 * (x[:-1] + x[1:])  # x_{i+1/2}, i=0..N-1
    yp = 0.5 * (y[:-1] + y[1:])
    expected = np.zeros((N + 1, M + 1))
    for i in range(1, N):
        for j in range(1, M):
            x0, x1 = xp[i - 1], xp[i]
            y0, y1 = yp[j - 1], yp[j]
            ix = (x1**4 - x0**4) / 4 * (y1**3 - y0**3) / 3
            lin = (x1**2 - x0**2) * (y1 - y0)  # integral of 2p
            const = (x1 - x0) * (y1 - y0)
            expected[i, j] = (ix + lin + const) / ((x1 - x0) * (y1 - y0))
    assert np.allclose(out, expected, rtol=1e-13, atol=1e-15)
    assert np.all(out[0] == 0) and np.all(out[:, -1] == 0)


def test_make_uniform_grid_shapes():
    g = make_uniform_grid(4, 6)
    assert g.full_shape == (5, 7)
    assert g.interior_shape == (3, 5)
    assert g.make_full0().shape == (5, 7)
    assert float(jnp.sum(g.const_with_nullbd(3.0))) == pytest.approx(3.0 * 3 * 5)
