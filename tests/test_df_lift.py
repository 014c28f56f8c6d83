"""df_lift: the double-float jaxpr interpreter vs the f64 pipeline.

Gates ops/df_lift.py on the REAL workloads it exists for: the five-field
semi-discrete system and the Newton plane assembly (the byte-dominant
emulated-f64 code identified by studies/mixed_byte_audit.py).  Reference
physics: src/prob1base.py:2429-2876 (fields), :2674-2839 (Jacobians) — the
lifted evaluation must agree with our parity-certified f64 evaluation to
double-float accuracy."""
import jax
import jax.numpy as jnp
import pytest

from na_dd_tpu.harness.studies import _make_trial, study_consts
from na_dd_tpu.mms import cases as mms_cases
from na_dd_tpu.mms.engine import state_from_mms_when
from na_dd_tpu.ops import LOCAL_OPS
from na_dd_tpu.ops.df_lift import df_call, df_lift_report


@pytest.fixture(scope="module")
def pol_setup():
    trial = _make_trial(
        mms_cases.MMSCasePol, 24, 50.0, mc=study_consts("pol"), krylov_unroll=8
    )
    g = trial.grid
    field = trial.integrator.semi_discrete_field
    s0 = state_from_mms_when(mms_case=trial.mms_case, t=0.011, grid=g)
    return g, field, s0


def _gate(got, ref, scale=None, tol=3e-13, label=""):
    # floor the scale at 1e-20: below ~1e-31 the DF lo word underflows the
    # f32 subnormal range, so an all-but-zero array (noise-level plane)
    # carries ~1e-37 absolute error — physically nothing, and far outside
    # any quantity the integrator consumes.
    scale = float(jnp.max(jnp.abs(ref))) if scale is None else scale
    err = float(jnp.max(jnp.abs(got - ref)))
    assert err <= tol * max(scale, 1e-20), (label, err, scale)


def test_df_lift_all_fields_matches_f64(pol_setup):
    """The full five-field evaluation (diffusion, advection, factorized
    reaction with the eta-sigmoid, forcing) in DF vs f64: absolute error at
    the double-float level relative to each field's own scale."""
    g, field, s0 = pol_setup
    ref = field.all_fields(g, LOCAL_OPS, s0, 0.011)
    got = df_call(lambda s, t: field.all_fields(g, LOCAL_OPS, s, t), s0, 0.011)
    for name in ("cp", "T", "cl", "cd", "cs"):
        _gate(getattr(got, name), getattr(ref, name), label=name)


def test_df_lift_newton_planes_match_f64(pol_setup):
    """The analytic Jacobian/coupling plane assembly in DF vs f64 (the
    operator that the mixed refinement consumes — plane errors multiply
    straight into the Newton residual)."""
    g, field, s0 = pol_setup

    def planes(s):
        return (
            field.stencil_dFT_dT(g, LOCAL_OPS, s),
            field.stencil_dFcl_dcl(g, LOCAL_OPS, s),
            field.stencil_dFcd_dcd(g, LOCAL_OPS, s),
            field.stencil_dFcl_dT(g, LOCAL_OPS, s),
            field.stencil_dFcd_dT(g, LOCAL_OPS, s),
            field.diag_dFcd_dcl(g, s),
        )

    ref = planes(s0)
    got = df_call(planes, s0)
    for st_ref, st_got in zip(ref, got):
        for p_ref, p_got in zip(
            jax.tree_util.tree_leaves(st_ref), jax.tree_util.tree_leaves(st_got)
        ):
            _gate(p_got, p_ref, label="plane")


def test_df_lift_is_jittable_and_no_passthrough(pol_setup):
    """The lifted evaluation must trace into ONE jittable XLA program with
    ZERO f64 passthroughs: since round 5 the transcendentals (exp, logistic,
    pow, sin, cos, log, tanh) have native-f32 DF rules, so anything in the
    report means a hot primitive silently fell off the native-f32 path."""
    g, field, s0 = pol_setup
    df_lift_report(reset=True)  # earlier lifts in the process don't leak in
    fn = jax.jit(
        lambda s, t: df_call(
            lambda ss, tt: field.all_fields(g, LOCAL_OPS, ss, tt), s, t
        )
    )
    ref = field.all_fields(g, LOCAL_OPS, s0, 0.011)
    got = fn(s0, 0.011)
    _gate(got.T, ref.T, label="jit T")
    assert df_lift_report() == {}, (
        f"unexpected f64 passthroughs: {df_lift_report()}"
    )


def test_df_lift_sqrt_with_zeros_and_minmax_nan():
    """sqrt through the lifted interpreter: must tolerate the `accuracy`
    primitive param of current JAX, return exactly 0 at exact-zero inputs
    (boundary-masked arrays are pervasive — ADVICE r4), and max/min must
    propagate NaN like jnp.maximum/minimum."""
    x = jnp.concatenate(
        [jnp.zeros(3, jnp.float64), jnp.linspace(0.5, 4.0, 61, jnp.float64)]
    )

    def f(v):
        return jnp.sqrt(v) + jnp.maximum(v, 0.25) - jnp.minimum(v, 3.0)

    got = df_call(f, x)
    ref = f(x)
    assert not bool(jnp.any(jnp.isnan(got)))
    _gate(got, ref, label="sqrt+minmax")

    xn = jnp.array([1.0, jnp.nan, 2.0], jnp.float64)
    got_max = df_call(lambda v: jnp.maximum(v, 1.5), xn)
    ref_max = jnp.maximum(xn, 1.5)
    assert bool(jnp.isnan(got_max[1])) == bool(jnp.isnan(ref_max[1]))
    assert jnp.allclose(got_max[::2], ref_max[::2])
