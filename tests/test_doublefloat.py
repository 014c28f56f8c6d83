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


# ---------------------------------------------------------------------------
# DF transcendentals (round 5): native-f32 exp/log/logistic/pow/sin/cos/tanh
# vs f64 libm.  These are what lets df_lift run the hot coefficient ops
# (Dl/Dd exponentials, the H_eta sigmoid — reference src/prob1base.py:96-203,
# 3452-3466) without the emulated-f64 passthrough.
# ---------------------------------------------------------------------------

def _gate_rel(got_df, ref64, tol):
    got = dfm.df_to(got_df, jnp.float64)
    rel = jnp.abs(got - ref64) / jnp.maximum(jnp.abs(ref64), 1e-300)
    assert float(jnp.max(rel)) < tol, float(jnp.max(rel))


def test_df_exp_accuracy_wide_range():
    x = jnp.concatenate([
        jnp.linspace(-87.0, 88.0, 4001, dtype=jnp.float64),
        jnp.linspace(-2.0, 2.0, 4001, dtype=jnp.float64),
        jnp.array([0.0, 1.0, -1.0, 1e-8, -1e-8, 700.0, -1e6], jnp.float64),
    ])
    got = dfm.df_exp(dfm.df_split(x))
    ref = jnp.exp(x)
    rel = jnp.abs(dfm.df_to(got, jnp.float64) - ref) / ref
    # XLA flushes f32 subnormals to zero (CPU and TPU), costing the lo word
    # up to ~1.2e-38 ABSOLUTE: full DF relative accuracy therefore holds for
    # results >= ~4e-25 and degrades gracefully (floor 2^-24) below, until
    # the hard f32 underflow
    # ... and the input pair itself only carries x to 2^-49 relative, which
    # maps to |x|·2^-49 relative in exp — the gate scales accordingly
    inside = (ref > 1e-24) & (x < 88.0)
    gate = 3e-14 + jnp.abs(x) * 2.0 ** -48
    assert float(jnp.max(jnp.where(inside, rel - gate, 0.0))) <= 0.0
    tiny = (x > -87.0) & ~inside & (x < 88.0)
    assert float(jnp.max(jnp.where(tiny, rel, 0.0))) < 5e-7
    assert float(dfm.df_to(got, jnp.float64)[-1]) == 0.0  # deep underflow -> 0
    assert float(dfm.df_to(got, jnp.float64)[-2]) == jnp.inf  # overflow -> inf
    # exp(0) == 1 exactly
    i0 = int(jnp.argmin(jnp.abs(x - 0.0)))
    assert float(got.hi[i0]) == 1.0 and float(got.lo[i0]) == 0.0


def test_df_logistic_accuracy():
    x = jnp.linspace(-80.0, 80.0, 8001, dtype=jnp.float64)
    got = dfm.df_to(dfm.df_logistic(dfm.df_split(x)), jnp.float64)
    ref = jax.nn.sigmoid(x)
    rel = jnp.abs(got - ref) / ref
    # same subnormal-flush floor as df_exp: full DF accuracy for
    # sigma >= ~4e-25, graceful f32-level degradation below
    gate = jnp.where(ref > 1e-24, 3e-14 + jnp.abs(x) * 2.0 ** -48, 5e-7)
    assert float(jnp.max(rel - gate)) <= 0.0
    # the eta-sigmoid regime of the studies: eta*cs with eta up to 1000
    # (|arg| capped at 50: below sigma ~ 2e-22 the f32 range floor applies)
    cs = jnp.linspace(-0.05, 0.05, 2001, dtype=jnp.float64) * 1000.0
    _gate_rel(dfm.df_logistic(dfm.df_split(cs)), jax.nn.sigmoid(cs), 3e-14)


def test_df_log_accuracy_and_domain():
    x = jnp.concatenate([
        jnp.logspace(-30, 30, 4001, base=10.0, dtype=jnp.float64),
        jnp.linspace(0.5, 1.5, 2001, dtype=jnp.float64),  # cancellation zone
    ])
    got = dfm.df_log(dfm.df_split(x))
    ref = jnp.log(x)
    err = jnp.abs(dfm.df_to(got, jnp.float64) - ref)
    # absolute error near log(1)=0, relative elsewhere, PLUS the input
    # pair's own flush floor: below x ~ 1e-30 the split's lo word lands in
    # the f32 subnormal range and flushes, costing up to ~1.3e-38/x in x
    # (and hence in log x)
    gate = 3e-14 * jnp.maximum(jnp.abs(ref), 1.0) + 2e-38 / x
    assert float(jnp.max(err - gate)) <= 0.0
    z = dfm.df_log(dfm.df_split(jnp.array([0.0], jnp.float64)))
    assert float(z.hi[0]) == -jnp.inf
    n = dfm.df_log(dfm.df_split(jnp.array([-1.0], jnp.float64)))
    assert bool(jnp.isnan(n.hi[0]))


def test_df_pow_matches_f64_fractional_gammas():
    # the NonFullySmoothPol workload: |x - theta|**gamma, gamma fractional
    base = jnp.abs(jnp.linspace(-0.4, 0.6, 2001, dtype=jnp.float64))
    for gamma in (1.1, 2.1, 3.1, 4.1):
        g = jnp.full_like(base, gamma)
        got = dfm.df_pow(dfm.df_split(base), dfm.df_split(g))
        ref = base ** gamma
        err = jnp.abs(dfm.df_to(got, jnp.float64) - ref)
        # relative error scales with |gamma·log base| (exp of an argument
        # carried to ~2^-48 relative); the absolute 1e-37 floor covers the
        # f32 subnormal-flush range near base = 0 (values that multiply O(1)
        # coefficients, so only their absolute size matters)
        gate = (1.0 + jnp.abs(gamma * jnp.log(jnp.maximum(base, 1e-300)))) * 2e-14
        assert float(jnp.max(err - ref * gate - 1e-37)) <= 0.0
    # exact-zero base: 0**gamma == 0 (no NaN from the log path)
    z = dfm.df_pow(dfm.df_split(jnp.zeros(3, jnp.float64)),
                   dfm.df_split(jnp.full(3, 2.1, jnp.float64)))
    assert jnp.all(z.hi == 0.0) and jnp.all(z.lo == 0.0)


def test_df_sin_cos_accuracy():
    x = jnp.concatenate([
        jnp.linspace(-20.0, 20.0, 8001, dtype=jnp.float64),
        jnp.pi * jnp.linspace(0.0, 1.0, 257, dtype=jnp.float64),  # sin(pi x) grid
    ])
    d = dfm.df_split(x)
    err_s = jnp.abs(dfm.df_to(dfm.df_sin(d), jnp.float64) - jnp.sin(x))
    err_c = jnp.abs(dfm.df_to(dfm.df_cos(d), jnp.float64) - jnp.cos(x))
    # absolute gate (Cody-Waite reduction: ~2^-48 * |x|)
    assert float(jnp.max(err_s)) < 1e-13
    assert float(jnp.max(err_c)) < 1e-13


def test_df_tanh_and_sqrt_and_rsqrt():
    x = jnp.linspace(-20.0, 20.0, 4001, dtype=jnp.float64)
    err = jnp.abs(dfm.df_to(dfm.df_tanh(dfm.df_split(x)), jnp.float64) - jnp.tanh(x))
    assert float(jnp.max(err)) < 3e-14
    # sqrt with EXACT ZEROS present (boundary-masked arrays; ADVICE r4)
    y = jnp.concatenate([jnp.zeros(4, jnp.float64),
                         jnp.logspace(-20, 20, 2001, dtype=jnp.float64)])
    got = dfm.df_sqrt(dfm.df_split(y))
    assert jnp.all(got.hi[:4] == 0.0) and jnp.all(~jnp.isnan(got.hi))
    _gate_rel(dfm.DF(got.hi[4:], got.lo[4:]), jnp.sqrt(y[4:]), 3e-14)
    r = dfm.df_rsqrt(dfm.df_split(y[4:]))
    _gate_rel(r, 1.0 / jnp.sqrt(y[4:]), 5e-14)


def test_df_exp_jits():
    f = jax.jit(lambda v: dfm.df_to(dfm.df_exp(dfm.df_split(v)), jnp.float64))
    x = jnp.linspace(-5.0, 5.0, 101, dtype=jnp.float64)
    assert float(jnp.max(jnp.abs(f(x) - jnp.exp(x)) / jnp.exp(x))) < 3e-14
