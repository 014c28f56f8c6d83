"""df_lift: evaluate ANY jax function in double-float (two-f32) arithmetic.

Why this exists (the round-4 byte audit, studies/results/mixed_byte_audit.json):
on the axon TPU every f64 op is emulated, and the emulation inflates the
integrator step from 173 MB (pure f32) to 1041 MB (mixed, zero refinement) of
cost-model traffic — 7.2x the bytes and 43x the flops.  The f64 bits are only
*needed* at ~2^-40 accuracy in a few cancelling combinations; everywhere else
double-float (an unevaluated f32 pair hi + lo, ~2^-48 relative) is enough and
runs on native-f32 vector hardware with mostly-f32 intermediates.

Rather than rewriting the physics in DF by hand, this module interprets the
jaxpr of the EXISTING field/assembly code with double-float rules:

* structural primitives (slice, pad, reshape, broadcast, concatenate,
  select_n, optimization_barrier, ...) apply to hi and lo independently —
  exact;
* add/sub/mul/div/integer_pow run as error-free-transformation algorithms
  (ops/doublefloat.py: Knuth two-sum, Dekker two-prod, DF division) —
  native f32, no FMA required;
* transcendentals (exp, logistic, sin, ...) and any UNKNOWN primitive fall
  back to an f64 passthrough (reconstruct hi+lo -> f64, bind the original
  primitive, split back).  This keeps the interpreter TOTAL — correctness
  never depends on rule coverage — while the passthrough counter
  (:func:`df_lift_report`) shows exactly where emulated-f64 work remains;
* comparisons decide on the reconstructed f64 value (so regularization
  branches match the f64 pipeline), and integer/bool values flow through
  unchanged.

Interpretation happens at TRACE time: ``df_lift(fn)`` returns an ordinary
jittable function whose XLA graph IS the DF computation.

No reference counterpart (the reference is native CPU f64 throughout,
src/prob1base.py); this is TPU-native machinery for running f64-grade
physics on an f32 chip.  Validated by tests/test_df_lift.py against the f64
evaluation of the full five-field system and the Newton plane assembly.
"""
from __future__ import annotations

import collections
from functools import partial
from typing import Any, Callable

import jax
import jax.extend.core  # noqa: F401  (jax.extend is not auto-imported)
import jax.numpy as jnp

from na_dd_tpu.ops.doublefloat import (
    DF,
    df_add,
    df_cos,
    df_div,
    df_exp,
    df_log,
    df_logistic,
    df_mul,
    df_pow,
    df_rsqrt,
    df_sin,
    df_split,
    df_sqrt,
    df_tanh,
    df_to,
)

_F32 = jnp.float32
_F64 = jnp.float64


def _is_float(aval) -> bool:
    return jnp.issubdtype(aval.dtype, jnp.floating)


# ---------------------------------------------------------------------------
# DF rules for the hot primitives
# ---------------------------------------------------------------------------

def _df_neg(a: DF) -> DF:
    return DF(-a.hi, -a.lo)


def _df_sub(a: DF, b: DF) -> DF:
    return df_add(a, _df_neg(b))


def _df_integer_pow(a: DF, *, y: int) -> DF:
    if y == 0:
        return DF(jnp.ones_like(a.hi), jnp.zeros_like(a.hi))
    if y < 0:
        one = DF(jnp.ones_like(a.hi), jnp.zeros_like(a.hi))
        return df_div(one, _df_integer_pow(a, y=-y))
    # square-and-multiply in DF
    result = None
    base = a
    n = y
    while n:
        if n & 1:
            result = base if result is None else df_mul(result, base)
        n >>= 1
        if n:
            base = df_mul(base, base)
    return result


def _df_abs(a: DF) -> DF:
    neg = a.hi < 0
    return DF(jnp.where(neg, -a.hi, a.hi), jnp.where(neg, -a.lo, a.lo))


def _df_select(pred, a: DF, b: DF) -> DF:
    return DF(jnp.where(pred, a.hi, b.hi), jnp.where(pred, a.lo, b.lo))


def _df_minmax(ge: bool):
    """max/min deciding on the reconstructed f64 values (consistent with the
    _COMPARES rule) and propagating NaN like jnp.maximum/minimum."""

    def rule(a: DF, b: DF) -> DF:
        ra, rb = df_to(a, _F64), df_to(b, _F64)
        res = _df_select(ra >= rb if ge else ra <= rb, a, b)
        isnan = jnp.isnan(ra) | jnp.isnan(rb)
        nan = jnp.full(jnp.broadcast_shapes(a.hi.shape, b.hi.shape), jnp.nan, _F32)
        return _df_select(isnan, DF(nan, nan), res)

    return rule


def _binop(op):
    def rule(a, b):
        return op(a, b)

    return rule


_DF_RULES: dict[str, Callable[..., Any]] = {
    "add": _binop(df_add),
    "sub": _binop(_df_sub),
    "mul": _binop(df_mul),
    "div": _binop(df_div),
    "neg": _df_neg,
    "integer_pow": _df_integer_pow,
    "sqrt": df_sqrt,
    "rsqrt": df_rsqrt,
    "abs": _df_abs,
    "sign": lambda a: DF(jnp.sign(df_to(a, _F64)).astype(_F32),
                         jnp.zeros_like(a.hi)),
    "max": _df_minmax(ge=True),
    "min": _df_minmax(ge=False),
    # transcendentals: native-f32 DF algorithms (ops/doublefloat.py),
    # replacing the emulated-f64 passthrough that used to dominate the
    # lifted field evaluation's byte budget (VERDICT r4 task 2)
    "exp": df_exp,
    "log": df_log,
    "logistic": df_logistic,
    "pow": _binop(df_pow),
    "sin": df_sin,
    "cos": df_cos,
    "tanh": df_tanh,
}

def _df_reduce(jnp_fn):
    """Order-statistic reductions (max/min) decided on the f32 image
    hi + lo: the result seeds comparisons/early-exit thresholds, where f32
    granularity only moves an ulp-edge decision (an emulated-f64 reduction
    per call would defeat the point of the lift)."""

    def rule(a: DF, *, axes):
        v = jnp_fn(a.hi + a.lo, axis=axes)
        return DF(v, jnp.zeros_like(v))

    return rule


_DF_RULES["reduce_max"] = _df_reduce(jnp.max)
_DF_RULES["reduce_min"] = _df_reduce(jnp.min)

#: primitive params that do not change the math and are safe to drop when
#: calling a DF rule (jax >= 0.5 threads an `accuracy` hint through every
#: transcendental — the DF algorithms are fixed-accuracy by construction)
_BENIGN_PARAMS = frozenset({"accuracy"})


#: structural / layout primitives: exact when applied to hi and lo
#: independently (they move values, never round them)
_STRUCTURAL = frozenset(
    {
        "broadcast_in_dim",
        "concatenate",
        "reshape",
        "slice",
        "squeeze",
        "transpose",
        "rev",
        "pad",
        "expand_dims",
        "dynamic_slice",
        "gather",
        "optimization_barrier",
        "copy",
        "stop_gradient",
    }
)

#: comparison primitives: decide on the reconstructed f64 value so the
#: branch structure matches the f64 pipeline exactly
_COMPARES = frozenset({"eq", "ne", "lt", "le", "gt", "ge"})

_passthrough_counter: collections.Counter = collections.Counter()


def df_lift_report(reset: bool = False) -> dict:
    """Primitive -> count of f64-passthrough binds since process start (or
    since the last ``reset=True`` call; trace-time counts — shows where
    emulated-f64 work remains).  Tests that assert on the report should pass
    ``reset=True`` first so earlier lifts in the process don't leak in."""
    report = dict(_passthrough_counter)
    if reset:
        _passthrough_counter.clear()
    return report


def _reconstruct(v):
    return df_to(v, _F64) if isinstance(v, DF) else v


#: consts with at least this many elements stay f64 and are split ON DEMAND
#: (per consuming op) instead of eagerly.  Rationale: the time-table forcing
#: arrays (harness NA_DD_TPU_TIME_TABLES) are (num_steps+1, N, N) closure
#: constants consumed through ONE dynamic_slice per step — an eager split
#: would reprocess the whole ~100 MB table inside every step, while the
#: lazy path splits only the sliced row.  Small consts (grid metrics,
#: masks) stay eager so their repeated uses split once, not per use.
_LAZY_CONST_ELEMS = 1 << 20


def _maybe_df(v, aval, *, lazy_ok: bool = False):
    """Split a concrete float input/const into DF; leave the rest alone."""
    if _is_float(aval):
        if lazy_ok and getattr(aval, "size", 0) >= _LAZY_CONST_ELEMS:
            return jnp.asarray(v, _F64)
        return df_split(jnp.asarray(v, _F64))
    return v


def _eval_jaxpr_df(jaxpr, consts, *args):
    env: dict = {}

    def read(atom):
        if isinstance(atom, jax.extend.core.Literal):
            return _maybe_df(atom.val, atom.aval)
        return env[atom]

    def write(var, val):
        env[var] = val

    for var, const in zip(jaxpr.constvars, consts):
        write(var, _maybe_df(const, var.aval, lazy_ok=True))
    for var, arg in zip(jaxpr.invars, args):
        write(var, arg)

    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        invals = [read(a) for a in eqn.invars]

        if name in ("pjit", "jit", "closed_call", "core_call", "custom_jvp_call",
                    "custom_vjp_call", "custom_vjp_call_jaxpr", "remat", "checkpoint"):
            inner = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr") or eqn.params.get("fun_jaxpr")
            if inner is None:
                raise NotImplementedError(f"df_lift: call primitive {name} without jaxpr param")
            if hasattr(inner, "jaxpr"):  # ClosedJaxpr
                outs = _eval_jaxpr_df(inner.jaxpr, inner.consts, *invals)
            else:
                outs = _eval_jaxpr_df(inner, [], *invals)
        elif name in _STRUCTURAL:
            if any(isinstance(v, DF) for v in invals):
                # lazy (still-f64) float operands must be split before the
                # hi/lo fan-out — duplicating them into both channels would
                # double-count the value
                invals = [
                    df_split(v)
                    if not isinstance(v, DF) and hasattr(v, "dtype")
                    and jnp.issubdtype(v.dtype, jnp.floating)
                    else v
                    for v in invals
                ]
                his = [v.hi if isinstance(v, DF) else v for v in invals]
                los = [v.lo if isinstance(v, DF) else v for v in invals]
                out_hi = eqn.primitive.bind(*his, **eqn.params)
                out_lo = eqn.primitive.bind(*los, **eqn.params)
                outs = (
                    [DF(h, l) for h, l in zip(out_hi, out_lo)]
                    if eqn.primitive.multiple_results
                    else [DF(out_hi, out_lo)]
                )
            else:
                out = eqn.primitive.bind(*invals, **eqn.params)
                outs = list(out) if eqn.primitive.multiple_results else [out]
        elif name == "select_n" and any(isinstance(v, DF) for v in invals):
            pred, *cases = invals
            assert not isinstance(pred, DF)
            # promote any plain case (e.g. a literal 0) to DF
            cases = [
                c if isinstance(c, DF) else df_split(jnp.asarray(c, _F64))
                for c in cases
            ]
            hi = eqn.primitive.bind(pred, *(c.hi for c in cases), **eqn.params)
            lo = eqn.primitive.bind(pred, *(c.lo for c in cases), **eqn.params)
            outs = [DF(hi, lo)]
        elif name in _COMPARES:
            outs = [eqn.primitive.bind(*map(_reconstruct, invals), **eqn.params)]
        elif (
            name == "pow"
            and isinstance(eqn.invars[1], jax.extend.core.Literal)
            and jnp.ndim(eqn.invars[1].val) == 0
            and float(eqn.invars[1].val).is_integer()
            and abs(float(eqn.invars[1].val)) <= 64
        ):
            # integer-valued literal exponents (sympy lambdify emits 1/(1+t)
            # as pow(x, -1.0) etc.): square-and-multiply instead of the full
            # exp(b·log a) DF pow — ~25 ops vs ~1000 (the lifted MMS forcing
            # graph shrank 5x; all 77 pows in the Pol case are such literals)
            base = invals[0]
            if not isinstance(base, DF):
                base = df_split(jnp.asarray(base, _F64))
            outs = [_df_integer_pow(base, y=int(float(eqn.invars[1].val)))]
        elif name == "convert_element_type":
            (v,) = invals
            new_dtype = eqn.params["new_dtype"]
            if isinstance(v, DF):
                if jnp.issubdtype(new_dtype, jnp.floating):
                    outs = [v]  # every float is DF in this interpreter
                else:
                    outs = [_reconstruct(v).astype(new_dtype)]
            else:
                if jnp.issubdtype(new_dtype, jnp.floating):
                    outs = [df_split(jnp.asarray(v, _F64))]
                else:
                    outs = [eqn.primitive.bind(v, **eqn.params)]
        elif name in _DF_RULES and all(
            isinstance(v, DF) or not hasattr(v, "dtype") or
            jnp.issubdtype(jnp.asarray(v).dtype, jnp.floating)
            for v in invals
        ) and any(isinstance(v, DF) for v in invals):
            dfvals = [
                v if isinstance(v, DF) else df_split(jnp.asarray(v, _F64))
                for v in invals
            ]
            params = {k: v for k, v in eqn.params.items()
                      if k not in _BENIGN_PARAMS}
            outs = [_DF_RULES[name](*dfvals, **params)]
        else:
            # total fallback: reconstruct f64, bind the original primitive,
            # split float outputs back to DF.  Counts toward the report.
            if any(isinstance(v, DF) for v in invals):
                _passthrough_counter[name] += 1
            vals = [_reconstruct(v) for v in invals]
            out = eqn.primitive.bind(*vals, **eqn.params)
            outs = list(out) if eqn.primitive.multiple_results else [out]
            outs = [
                df_split(o)
                if hasattr(o, "dtype") and jnp.issubdtype(o.dtype, jnp.floating)
                else o
                for o in outs
            ]

        for var, out in zip(eqn.outvars, outs):
            write(var, out)

    return [read(v) for v in jaxpr.outvars]


def df_call(fn: Callable, *args, out: str = "f64"):
    """Evaluate ``fn(*args)`` in double-float.

    ``args`` is an arbitrary pytree of f64 arrays/scalars (plus non-float
    leaves, which pass through).  ``out="f64"`` reconstructs float outputs
    to f64; ``out="df"`` returns :class:`DF` pairs (for callers composing
    several lifted stages without round-tripping through emulated f64).
    """
    closed = jax.make_jaxpr(fn)(*args)
    flat_args, _ = jax.tree_util.tree_flatten(args)
    df_args = []
    for a in flat_args:
        arr = jnp.asarray(a)
        if jnp.issubdtype(arr.dtype, jnp.floating):
            df_args.append(df_split(arr.astype(_F64)))
        else:
            df_args.append(arr)
    outs = _eval_jaxpr_df(closed.jaxpr, closed.consts, *df_args)
    if out == "f64":
        outs = [_reconstruct(o) for o in outs]
    out_tree = jax.tree_util.tree_structure(
        jax.eval_shape(fn, *args)
    )
    return jax.tree_util.tree_unflatten(out_tree, outs)


def df_lift(fn: Callable, out: str = "f64") -> Callable:
    """Return a jittable function computing ``fn`` in double-float."""
    return partial(df_call, fn, out=out)


def _is_df(x) -> bool:
    return isinstance(x, DF)


def df_call_df(fn: Callable, *args, out: str = "df"):
    """Evaluate ``fn(*args)`` in double-float where ``args``' float leaves
    may ALREADY be :class:`DF` pairs (mixed with plain arrays/scalars).

    This is the composition entry point for the f32-state integrator: the
    step carries its state as DF pairs and threads them through several
    lifted stages (field evals, plane assembly, correctors) without ever
    round-tripping through emulated f64.  ``fn`` itself is ordinary f64
    jax code — it is traced at f64 avals and interpreted with DF rules.
    """
    leaves, treedef = jax.tree_util.tree_flatten(args, is_leaf=_is_df)
    spec = [
        jax.ShapeDtypeStruct(l.hi.shape, _F64) if isinstance(l, DF) else l
        for l in leaves
    ]
    spec_args = jax.tree_util.tree_unflatten(treedef, spec)
    closed = jax.make_jaxpr(fn)(*spec_args)
    df_args = []
    for l in leaves:
        if isinstance(l, DF):
            df_args.append(l)
            continue
        arr = jnp.asarray(l)
        if jnp.issubdtype(arr.dtype, jnp.floating):
            df_args.append(df_split(arr.astype(_F64)))
        else:
            df_args.append(arr)
    outs = _eval_jaxpr_df(closed.jaxpr, closed.consts, *df_args)
    if out == "f64":
        outs = [_reconstruct(o) for o in outs]
    out_tree = jax.tree_util.tree_structure(jax.eval_shape(fn, *spec_args))
    return jax.tree_util.tree_unflatten(out_tree, outs)
