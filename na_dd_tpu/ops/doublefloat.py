"""Double-float (two-float32) arithmetic for the mixed-precision residuals.

The axon TPU has no native f64: every f64 op is emulated by the backend at a
measured ~50x the cost of its native-f32 twin (studies/mixed_perf_probe.json:
123 N=256 plane applies take 25 ms against ~0.4 ms of HBM traffic — the
emulated apply is compute-bound, not bandwidth-bound).  The mixed-precision
iterative refinement (integrators/pc_trapezoidal.py::solve_assembled_mixed
and the fused block-triangular sweep) only needs the f64 bits in ONE place:
the true residual ``r = b - A·x`` between the native-f32 inner solves.

This module computes that residual in **double-float**: each f64 quantity is
an unevaluated pair of f32s ``hi + lo`` (|lo| <= ulp(hi)/2, ~2^-48 relative),
and the stencil apply/additions run entirely in native f32 using the classic
error-free transformations (Knuth two-sum, Dekker/Veltkamp two-prod — no FMA
required, TPU-safe).  Accuracy: the residual comes out with absolute error
~2^-47·‖b‖, which is below the refinement contraction target (each pass
needs r to ~1e-8 of itself, and ‖r‖ >= 1e-6·‖b‖ after one inner solve), so
refinement converges to the same f64 target while the ONLY remaining
emulated-f64 work per sweep is the one-time hi/lo split of the coefficient
planes (one f64 subtract each) and the final hi+lo reconstruction.

Counterpart in the reference: none — the reference (src/prob1base.py) runs
everything in native CPU f64.  This is TPU-specific machinery that makes the
f64-accurate mode fast on an f32 chip.

Used by: integrators/pc_trapezoidal.py (mixed_df knob / NA_DD_TPU_MIXED_DF).
Validated by tests/test_doublefloat.py (EFT exactness + residual vs f64).
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class DF(NamedTuple):
    """An unevaluated f32 sum hi + lo (both arrays, same shape)."""

    hi: jax.Array
    lo: jax.Array


_F32 = jnp.float32


def two_sum(a, b):
    """Knuth two-sum: s + e == a + b exactly (6 native flops)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """Dekker quick-two-sum; requires |a| >= |b| (or a == 0)."""
    s = a + b
    e = b - (s - a)
    return s, e


# Veltkamp split constant for f32 (24-bit mantissa -> 12|12 halves).
_SPLIT = _F32(4097.0)  # 2**12 + 1


def two_prod(a, b):
    """Dekker two-prod: p + e == a*b exactly, FMA-free.

    Splits each factor into 12-bit halves whose pairwise products are exact
    in f32.  If XLA contracts any of the mult/subtract pairs into an FMA the
    result only gets MORE exact (fma(a,b,-p) is the error term itself), so
    the transform is safe under either lowering.
    """
    p = a * b
    ca = _SPLIT * a
    ahi = ca - (ca - a)
    alo = a - ahi
    cb = _SPLIT * b
    bhi = cb - (cb - b)
    blo = b - bhi
    e = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, e


def df_split(x) -> DF:
    """Split an f64 array into its double-float (hi, lo) f32 pair.

    The only emulated-f64 work in the DF pipeline: one downcast plus one
    f64 subtract per array (vs ~10 emulated ops per stencil apply it
    replaces)."""
    hi = x.astype(_F32)
    lo = (x - hi.astype(x.dtype)).astype(_F32)
    return DF(hi, lo)


def df_split_with_hi(x, hi) -> DF:
    """df_split when the f32 downcast already exists (reuse, saves a cast)."""
    lo = (x - hi.astype(x.dtype)).astype(_F32)
    return DF(hi, lo)


def df_to(x: DF, dtype):
    """Reconstruct the f64 value hi + lo (one emulated add per array)."""
    return x.hi.astype(dtype) + x.lo.astype(dtype)


def df_zeros_like(a) -> DF:
    z = jnp.zeros(a.shape, _F32)
    return DF(z, z)


def df_neg(a: DF) -> DF:
    return DF(-a.hi, -a.lo)


def df_add(a: DF, b: DF) -> DF:
    """Accurate (ieee-style) DF + DF: stays fully accurate under the strong
    cancellation of the residual subtraction b - A·x (the sloppy 3-flop
    variant loses its low word exactly there)."""
    sh, eh = two_sum(a.hi, b.hi)
    sl, el = two_sum(a.lo, b.lo)
    eh = eh + sl
    sh, eh = fast_two_sum(sh, eh)
    eh = eh + el
    sh, eh = fast_two_sum(sh, eh)
    return DF(sh, eh)


def df_sub(a: DF, b: DF) -> DF:
    return df_add(a, df_neg(b))


def df_add_f32(a: DF, b) -> DF:
    """DF + plain f32 array (the refinement's z += e correction update)."""
    sh, eh = two_sum(a.hi, b)
    eh = eh + a.lo
    sh, eh = fast_two_sum(sh, eh)
    return DF(sh, eh)


def df_mul(a: DF, b: DF) -> DF:
    """Elementwise DF × DF (drops the lo·lo term: O(2^-48) relative)."""
    p, e = two_prod(a.hi, b.hi)
    e = e + (a.hi * b.lo + a.lo * b.hi)
    p, e = fast_two_sum(p, e)
    return DF(p, e)


def df_mask(a: DF, m32) -> DF:
    """Multiply by a 0/1 mask (exact in f32)."""
    return DF(a.hi * m32, a.lo * m32)


def df_stencil_apply(st_hi, st_lo, ops, z: DF) -> DF:
    """A·z for an assembled stencil in double-float: the mixed refinement's
    residual matvec with zero emulated-f64 arithmetic.

    ``st_hi``/``st_lo`` are the stencil's planes split by :func:`df_split`
    (any plane NamedTuple whose ``apply`` is Σ cₖ · shiftₖ(w) — Stencil5 in
    2-D, Stencil7 in 3-D; the shift protocol comes from ``ops`` so the same
    code serves local and sharded layouts: shifting hi and lo independently
    is exact).  Per term: Dekker two-prod of the hi parts plus the two f32
    cross terms; terms accumulate through Knuth two-sums with a single error
    channel (error O(k·2^-48) for k planes — far below the residual's own
    1e-8 relative requirement)."""
    shifts = _plane_shifts(type(st_hi), ops)
    acc_h = None
    acc_e = None
    for ch, cl, shift in zip(st_hi, st_lo, shifts):
        zh = shift(z.hi)
        zl = shift(z.lo)
        p, e = two_prod(ch, zh)
        e = e + (ch * zl + cl * zh)
        if acc_h is None:
            acc_h, acc_e = p, e
        else:
            acc_h, err = two_sum(acc_h, p)
            acc_e = acc_e + (e + err)
    sh, el = fast_two_sum(acc_h, acc_e)
    return DF(sh, el)


def _plane_shifts(stencil_cls, ops):
    """Shift callables matching the plane order of the stencil NamedTuple."""
    fields = stencil_cls._fields
    ident = lambda w: w  # noqa: E731
    table = {
        "c0": ident,
        "cxm": ops.shift_xm,
        "cxp": ops.shift_xp,
        "cym": ops.shift_ym,
        "cyp": ops.shift_yp,
    }
    # Stencil7 (3-D) planes, when present on the ops protocol
    if hasattr(ops, "shift_zm"):
        table["czm"] = ops.shift_zm
        table["czp"] = ops.shift_zp
    try:
        return [table[f] for f in fields]
    except KeyError as exc:  # pragma: no cover - config error
        raise ValueError(
            f"df_stencil_apply: unknown plane {exc} on {stencil_cls.__name__}"
        ) from exc


# ---------------------------------------------------------------------------
# DF transcendentals (round-5: VERDICT task 2)
#
# The hot per-step coefficient ops — Dl = Dl_max·exp(−φl·cp),
# Dd = Dd_max·exp(−φd·cp − φT/T), H_η(x) = logistic(ηx) (reference
# src/prob1base.py:96-203, 3452-3466) — are full-grid transcendentals.  Under
# df_lift they used to reconstruct to emulated f64 (the passthrough), keeping
# the lifted field evaluation pinned to the emulated-f64 byte floor.  These
# implementations run entirely in native f32 using DF arithmetic, accurate to
# a few units of the DF ulp (2^-48 relative ≈ 1e-14; validated against f64 in
# tests/test_doublefloat.py).
#
# No reference counterpart — the reference calls native CPU f64 libm.
# ---------------------------------------------------------------------------


def _df_const(v: float) -> tuple:
    """Exactly split a Python float into an (hi, lo) pair of f32-exact
    Python floats (kept as weak-typed scalars so they fold into constants)."""
    hi = float(np.float32(v))
    lo = float(np.float32(v - hi))
    return hi, lo


def df_scale2(a: DF, p) -> DF:
    """Multiply by an exact power of two (or any exact-f32 scalar)."""
    return DF(a.hi * p, a.lo * p)


def _df_add_const(a: DF, c) -> DF:
    hi, lo = c
    s = df_add_f32(a, jnp.asarray(hi, _F32))
    if lo:
        s = df_add_f32(s, jnp.asarray(lo, _F32))
    return s


def _df_mul_const(a: DF, c) -> DF:
    hi, lo = c
    p, e = two_prod(a.hi, jnp.asarray(hi, _F32))
    e = e + (a.hi * jnp.asarray(lo, _F32) + a.lo * jnp.asarray(hi, _F32))
    p, e = fast_two_sum(p, e)
    return DF(p, e)


_LN2 = _df_const(math.log(2.0))
#: third Cody–Waite term: ln2 − LN2_HI − LN2_LO (k·this would otherwise
#: inject ~1.7e-14 absolute into the reduced argument at |k| ≈ 150)
_LN2_LO2 = float(np.float32(math.log(2.0) - _LN2[0] - _LN2[1]))
_INV_LN2 = float(np.float32(1.0 / math.log(2.0)))

#: 1/k! Horner coefficients for expm1 on |s| <= ln2/2/2^5 ≈ 0.0109
#: (series through s^7: next term s^8/8! < 4e-21, far below the DF ulp)
_EXP_COEFFS = [_df_const(1.0 / math.factorial(k)) for k in range(7, 1, -1)]

#: scaling depth for the exp argument reduction
_EXP_M = 5

def _exact_pow2(ki):
    """2^ki as an EXACT f32 for ki in the normal-exponent range [-126, 127],
    built from the exponent field (f32 ``jnp.exp2`` is an approximation —
    exp(k·ln2) — with ~|k|·2^-24 relative error, measured 3e-6 at k=125)."""
    return jax.lax.bitcast_convert_type(
        ((ki + 127) << 23).astype(jnp.int32), _F32
    )


def _df_ldexp(a: DF, ki) -> DF:
    """a · 2^ki with exact power-of-two factors; the two-stage split keeps
    each factor in the normal range for |ki| <= 252."""
    k1 = ki // 2
    k2 = ki - k1
    p2a = _exact_pow2(k1)
    p2b = _exact_pow2(k2)
    return df_scale2(df_scale2(a, p2a), p2b)


#: f32 exp over/underflow bounds on the REDUCED-path input
#: (below -103.9 the result underflows even f32 subnormals; above 88.8
#:  it overflows f32 — the DF pipeline inherits the f32 range by design)
_EXP_UNDER = -104.0
_EXP_OVER = 88.72


def df_exp(a: DF) -> DF:
    """exp in double-float: range reduction x = k·ln2 + r, Taylor expm1 on
    r/2^m, m squarings, scale by 2^k.  ~2-3 DF-ulp relative error for
    results ≥ ~4e-31; below that the lo word lands in the f32 subnormal
    range, which XLA flushes to zero (CPU and TPU), so accuracy degrades
    gracefully to plain-f32 (2^-24) until the hard underflow→0 at −104
    (overflow→inf above 88.7).  The physics never cares: the only tiny-exp
    consumer is the masked T→0 limit of Dd, where the f64 value is ≤ 1e-30
    and contributes below every tolerance in the pipeline."""
    # clamp the compute path so k stays an exact-f32 integer; restore the
    # under/overflow limits afterwards
    x = jnp.clip(a.hi, _EXP_UNDER, _EXP_OVER)
    xl = jnp.where((a.hi > _EXP_UNDER) & (a.hi < _EXP_OVER), a.lo, 0.0)
    k = jnp.round(x * _INV_LN2)  # |k| <= 152: exact in f32
    # k·ln2 accumulated in full DF (a plain f32 `e + k·LN2_LO` rounds at
    # ulp(e) ≈ 2^-40, measured as a 2.4e-13 relative error in the result)
    p, e = two_prod(k, jnp.asarray(_LN2[0], _F32))
    p2, e2 = two_prod(k, jnp.asarray(_LN2[1], _F32))
    e2 = e2 + k * jnp.asarray(_LN2_LO2, _F32)
    r = df_add(DF(x, xl), DF(-p, -e))
    r = df_add(r, DF(-p2, -e2))  # |r| <= ln2/2 + eps
    s = df_scale2(r, _F32(2.0 ** (-_EXP_M)))
    # Horner for expm1(s)/s
    h = DF(jnp.full_like(s.hi, _EXP_COEFFS[0][0]),
           jnp.full_like(s.hi, _EXP_COEFFS[0][1]))
    for c in _EXP_COEFFS[1:]:
        h = _df_add_const(df_mul(h, s), c)
    h = _df_add_const(df_mul(h, s), (1.0, 0.0))
    u = df_mul(s, h)  # expm1(s)
    for _ in range(_EXP_M):  # expm1(2x) = 2u + u²
        u = df_add(df_scale2(u, _F32(2.0)), df_mul(u, u))
    ex = _df_add_const(u, (1.0, 0.0))  # exp(r)
    out = _df_ldexp(ex, k.astype(jnp.int32))
    zero = jnp.zeros_like(a.hi)
    out = DF(jnp.where(a.hi <= _EXP_UNDER, zero, out.hi),
             jnp.where(a.hi <= _EXP_UNDER, zero, out.lo))
    out = DF(jnp.where(a.hi >= _EXP_OVER, jnp.inf, out.hi),
             jnp.where(a.hi >= _EXP_OVER, zero, out.lo))
    return out


def df_logistic(a: DF) -> DF:
    """1/(1+exp(−x)) in double-float (the H_η regularized Heaviside).

    Computed from t = exp(−|x|) ∈ (0,1] (no overflow) as σ = 1/(1+t) for
    x ≥ 0 and t/(1+t) for x < 0 — each branch carries FULL relative
    precision of its own small quantity (a 1−σ(+) rewrite would leave the
    negative branch with only absolute 2^-48 accuracy, i.e. 2^-48/σ
    relative — measured 9e-8 at x = −16.5)."""
    neg = a.hi < 0
    ax = DF(jnp.where(neg, -a.hi, a.hi), jnp.where(neg, -a.lo, a.lo))
    t = df_exp(df_neg(ax))
    denom = _df_add_const(t, (1.0, 0.0))
    sp = df_div(DF(jnp.ones_like(a.hi), jnp.zeros_like(a.hi)), denom)
    sn = df_div(t, denom)
    return DF(jnp.where(neg, sn.hi, sp.hi), jnp.where(neg, sn.lo, sp.lo))


def df_log(a: DF) -> DF:
    """log in double-float.

    Splits a = m·2^K with m ∈ [2/3, 4/3) extracted from the exponent field,
    then one Newton step y ← y + (m·exp(−y) − 1) on the f32 estimate doubles
    it to ~2^-48 — exp only ever sees |y| ≤ 0.41, far from the subnormal
    flush zone that would poison a direct Newton on a (measured 1.3e-8
    absolute at a = 1e30).  log(0) → −inf, log(<0) → nan, matching f64 libm."""
    safe = a.hi > 0
    ah = jnp.where(safe, a.hi, 1.0)
    al = jnp.where(safe, a.lo, 0.0)
    # normalize subnormal hi into the extraction's range first
    tiny = ah < 2.0 ** -100
    ah = jnp.where(tiny, ah * _F32(2.0 ** 100), ah)
    al = jnp.where(tiny, al * _F32(2.0 ** 100), al)
    bits = jax.lax.bitcast_convert_type(ah, jnp.int32)
    K = ((bits >> 23) & 0xFF) - 127
    # keep m in [2/3, 4/3) so log(m) is small: bump K where mantissa >= 1.5
    frac_ge_15 = (bits & 0x7FFFFF) >= 0x400000
    K = jnp.where(frac_ge_15, K + 1, K)
    m = _df_ldexp(DF(ah, al), -K)
    y0 = jnp.log(m.hi)
    em = df_exp(DF(-y0, jnp.zeros_like(y0)))
    d = _df_add_const(df_mul(m, em), (-1.0, 0.0))
    logm = df_add(DF(y0, jnp.zeros_like(y0)), d)
    Keff = (K - jnp.where(tiny, 100, 0)).astype(_F32)
    p, e = two_prod(Keff, jnp.asarray(_LN2[0], _F32))
    p2, e2 = two_prod(Keff, jnp.asarray(_LN2[1], _F32))
    e2 = e2 + Keff * jnp.asarray(_LN2_LO2, _F32)
    res = df_add(df_add(logm, DF(p, e)), DF(p2, e2))
    bad = jnp.where(a.hi == 0, -jnp.inf, jnp.nan).astype(_F32)
    return DF(jnp.where(safe, res.hi, bad), jnp.where(safe, res.lo, 0.0))


def df_pow(a: DF, b: DF) -> DF:
    """a**b = exp(b·log(a)) in double-float.

    Domain handling matches f64 pow for the workloads' inputs (the fractional
    |x−θ|^γ powers of the limited-regularity MMS cases, base ≥ 0): a > 0
    normal path; a == 0 → 0 (b > 0), 1 (b == 0), inf (b < 0); a < 0 → nan
    (the symbolic pipeline lowers integer exponents to integer_pow, which has
    its own exact rule)."""
    safe = a.hi > 0
    one = jnp.ones_like(a.hi)
    a_safe = DF(jnp.where(safe, a.hi, one), jnp.where(safe, a.lo, 0.0))
    res = df_exp(df_mul(b, df_log(a_safe)))
    rb = b.hi + b.lo
    zero_base = (a.hi == 0.0) & (a.lo == 0.0)
    special = jnp.where(rb > 0, 0.0, jnp.where(rb == 0, 1.0, jnp.inf))
    hi = jnp.where(safe, res.hi, jnp.where(zero_base, special, jnp.nan))
    lo = jnp.where(safe, res.lo, 0.0)
    return DF(hi, lo)


def df_sqrt(a: DF) -> DF:
    """sqrt via f32 estimate + one Heron correction in DF.
    sqrt(0) = 0 exactly (the boundary-masked arrays are pervasively zero);
    sqrt(<0) = nan via the f32 estimate."""
    y0 = jnp.sqrt(a.hi)
    p, e = two_prod(y0, y0)
    r = df_add(a, DF(-p, -e))
    denom = 2.0 * y0
    y1 = jnp.where(y0 == 0, 0.0, (r.hi + r.lo) / jnp.where(denom == 0, 1.0, denom))
    s, t = fast_two_sum(y0, y1)
    return DF(s, t)


def df_rsqrt(a: DF) -> DF:
    """1/sqrt(a) in double-float (Heron-corrected sqrt, then DF division)."""
    one = DF(jnp.ones_like(a.hi), jnp.zeros_like(a.hi))
    return df_div(one, df_sqrt(a))


def df_div(a: DF, b: DF) -> DF:
    """DF / DF: f32 estimate + one long-division correction (~2-3 DF ulp)."""
    q0 = a.hi / b.hi
    p, e = two_prod(q0, b.hi)
    r = df_add(a, DF(-p, -(e + q0 * b.lo)))
    q1 = (r.hi + r.lo) / b.hi
    s, t = fast_two_sum(q0, q1)
    return DF(s, t)


# three-part Cody–Waite split of π/2 so k·π/2 subtracts exactly for the
# moderate arguments the MMS forcings produce (|x| ≲ 1e3)
_PIO2_1 = float(np.float32(math.pi / 2))
_PIO2_2 = float(np.float32(math.pi / 2 - _PIO2_1))
_PIO2_3 = float(np.float32(math.pi / 2 - _PIO2_1 - _PIO2_2))
_INV_PIO2 = float(np.float32(2.0 / math.pi))

#: sin Taylor (odd, through r^15) and cos Taylor (even, through r^16)
#: coefficients on |r| <= π/4, Horner in r²
_SIN_COEFFS = [_df_const((-1.0) ** k / math.factorial(2 * k + 1))
               for k in range(7, 0, -1)]
_COS_COEFFS = [_df_const((-1.0) ** k / math.factorial(2 * k))
               for k in range(8, 0, -1)]


def _df_sincos_reduced(a: DF):
    """(sin, cos, quadrant) after Cody–Waite reduction by π/2."""
    k = jnp.round(a.hi * _INV_PIO2)
    r = a
    for part in (_PIO2_1, _PIO2_2, _PIO2_3):
        p, e = two_prod(k, jnp.asarray(part, _F32))
        r = df_add(r, DF(-p, -e))
    r2 = df_mul(r, r)
    hs = DF(jnp.full_like(r.hi, _SIN_COEFFS[0][0]),
            jnp.full_like(r.hi, _SIN_COEFFS[0][1]))
    for c in _SIN_COEFFS[1:]:
        hs = _df_add_const(df_mul(hs, r2), c)
    hs = _df_add_const(df_mul(hs, r2), (1.0, 0.0))
    sin_r = df_mul(r, hs)
    hc = DF(jnp.full_like(r.hi, _COS_COEFFS[0][0]),
            jnp.full_like(r.hi, _COS_COEFFS[0][1]))
    for c in _COS_COEFFS[1:]:
        hc = _df_add_const(df_mul(hc, r2), c)
    cos_r = _df_add_const(df_mul(hc, r2), (1.0, 0.0))
    q = jnp.mod(k, 4.0)  # 0..3, exact for |k| < 2^24
    return sin_r, cos_r, q


def _quadrant_select(q, v0: DF, v1: DF, v2: DF, v3: DF) -> DF:
    hi = jnp.where(q == 0, v0.hi, jnp.where(q == 1, v1.hi,
                   jnp.where(q == 2, v2.hi, v3.hi)))
    lo = jnp.where(q == 0, v0.lo, jnp.where(q == 1, v1.lo,
                   jnp.where(q == 2, v2.lo, v3.lo)))
    return DF(hi, lo)


def df_sin(a: DF) -> DF:
    """sin in double-float; absolute error a few DF ulp of |a| (Cody–Waite
    argument reduction is exact only to ~2^-48·|a|, plenty for the MMS
    forcings' |a| ≤ 1e3 arguments)."""
    s, c, q = _df_sincos_reduced(a)
    return _quadrant_select(q, s, c, df_neg(s), df_neg(c))


def df_cos(a: DF) -> DF:
    """cos in double-float (see :func:`df_sin`)."""
    s, c, q = _df_sincos_reduced(a)
    return _quadrant_select(q, c, df_neg(s), df_neg(c), s)


def df_tanh(a: DF) -> DF:
    """tanh = 2σ(2x) − 1 in double-float.  Absolute error ~2^-48 (relative
    error degrades ∝ 1/|x| below |x| ≈ 1e-5 — fine for every consumer here,
    which compares tanh against O(1) quantities)."""
    s = df_logistic(df_scale2(a, _F32(2.0)))
    return _df_add_const(df_scale2(s, _F32(2.0)), (-1.0, 0.0))


def df_split_stencil(st, st_hi=None):
    """Split every plane of an assembled stencil; reuses the f32 downcast
    ``st_hi`` when the caller already made one (the mixed path's kernel
    planes).  Returns (st_hi, st_lo) as two instances of type(st)."""
    cls = type(st)
    if st_hi is None:
        st_hi = cls(*(p.astype(_F32) for p in st))
    st_lo = cls(
        *(
            (p - h.astype(p.dtype)).astype(_F32)
            for p, h in zip(st, st_hi)
        )
    )
    return st_hi, st_lo
