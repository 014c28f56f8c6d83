"""Double-float (two-f32) EFT arithmetic: exactness + residual accuracy.

Validates na_dd_tpu/ops/doublefloat.py — the machinery that lets the
mixed-precision refinement compute its f64-grade true residuals in native
f32 (no reference counterpart: the reference runs native CPU f64
throughout, src/prob1base.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from na_dd_tpu.ops import doublefloat as dfm
from na_dd_tpu.ops.linsolve import Stencil5
from na_dd_tpu.ops.shifts import LOCAL_OPS


def _rand(key, shape, scale=1.0):
    return scale * jax.random.normal(key, shape, dtype=jnp.float64)


def test_two_sum_exact():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal(4096), jnp.float32)
    b = jnp.asarray(rng.standard_normal(4096) * 1e-6, jnp.float32)
    s, e = dfm.two_sum(a, b)
    # s + e must equal a + b EXACTLY in f64 (both representable)
    lhs = s.astype(jnp.float64) + e.astype(jnp.float64)
    rhs = a.astype(jnp.float64) + b.astype(jnp.float64)
    assert jnp.all(lhs == rhs)


def test_two_prod_exact():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal(4096), jnp.float32)
    b = jnp.asarray(rng.standard_normal(4096), jnp.float32)
    p, e = dfm.two_prod(a, b)
    lhs = p.astype(jnp.float64) + e.astype(jnp.float64)
    rhs = a.astype(jnp.float64) * b.astype(jnp.float64)
    # the f32*f32 product is exactly representable in f64
    assert jnp.all(lhs == rhs)


def test_split_roundtrip_and_accuracy():
    key = jax.random.PRNGKey(2)
    x = _rand(key, (64, 64))
    d = dfm.df_split(x)
    back = dfm.df_to(d, jnp.float64)
    # hi+lo carries ~2^-48 relative of the f64 value
    assert float(jnp.max(jnp.abs(back - x) / jnp.abs(x).max())) < 2e-14
    assert jnp.all(jnp.abs(d.lo) <= jnp.abs(d.hi) * 2.0 ** (-23))


def test_df_add_cancellation():
    # b - A x with strong cancellation: the accurate add must keep the
    # small difference to DF precision (the sloppy 3-flop add does not).
    key = jax.random.PRNGKey(3)
    x = _rand(key, (128,))
    y = x * (1.0 + 1e-6) + 1e-9
    d = dfm.df_sub(dfm.df_split(y), dfm.df_split(x))
    ref = y - x
    err = float(jnp.max(jnp.abs(dfm.df_to(d, jnp.float64) - ref)))
    assert err < 1e-13 * float(jnp.max(jnp.abs(x)))


def test_df_stencil_residual_matches_f64():
    """The whole point: r = b - A·x in DF agrees with the emulated-f64
    residual to ~2^-47·‖b‖ even when r itself is 1e-6·‖b‖."""
    key = jax.random.PRNGKey(4)
    ks = jax.random.split(key, 8)
    N = 96
    planes = [_rand(k, (N, N)) for k in ks[:5]]
    planes[0] = planes[0] + 4.0  # diagonally dominant-ish
    st = Stencil5(*planes)
    x = _rand(ks[5], (N, N))
    ax = st.apply(LOCAL_OPS, x)
    # b chosen so the residual is ~1e-6 of b: the refinement regime
    b = ax * (1.0 + 1e-6)
    r64 = b - ax

    st_hi, st_lo = dfm.df_split_stencil(st)
    x_df = dfm.df_split(x)
    ax_df = dfm.df_stencil_apply(st_hi, st_lo, LOCAL_OPS, x_df)
    r_df = dfm.df_sub(dfm.df_split(b), ax_df)
    r = dfm.df_to(r_df, jnp.float64)

    scale = float(jnp.max(jnp.abs(b)))
    abs_err = float(jnp.max(jnp.abs(r - r64)))
    assert abs_err < 1e-13 * scale, (abs_err, scale)
    # and the hi part alone is a faithful f32 image of the residual
    hi_err = float(jnp.max(jnp.abs(r_df.hi.astype(jnp.float64) - r64)))
    assert hi_err < 1e-6 * float(jnp.max(jnp.abs(r64))) + 1e-14 * scale


def test_df_mul_and_scale():
    key = jax.random.PRNGKey(5)
    a = _rand(key, (256,))
    b = _rand(jax.random.PRNGKey(6), (256,))
    prod = dfm.df_to(dfm.df_mul(dfm.df_split(a), dfm.df_split(b)), jnp.float64)
    assert float(jnp.max(jnp.abs(prod - a * b))) < 1e-13 * float(
        jnp.max(jnp.abs(a * b))
    )


def test_df_add_f32_accumulation():
    # z <- z + e over many refinement-style updates keeps DF precision
    z = dfm.df_zeros_like(jnp.zeros((64,)))
    ref = jnp.zeros((64,), jnp.float64)
    key = jax.random.PRNGKey(7)
    for i in range(8):
        e = jax.random.normal(
            jax.random.fold_in(key, i), (64,), dtype=jnp.float32
        ) * (10.0 ** (-i))
        z = dfm.df_add_f32(z, e)
        ref = ref + e.astype(jnp.float64)
    assert float(jnp.max(jnp.abs(dfm.df_to(z, jnp.float64) - ref))) < 1e-13
