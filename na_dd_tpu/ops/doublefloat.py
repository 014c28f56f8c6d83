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

from typing import NamedTuple

import jax
import jax.numpy as jnp


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
