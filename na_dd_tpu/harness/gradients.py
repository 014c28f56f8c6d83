"""End-to-end differentiable simulation: adjoint gradients + calibration.

A capability the reference does not have at all: its forward model is
NumPy/SuperLU, so sensitivities of a simulation outcome with respect to the
physical constants (``Dl_max``, ``Dd_max``, ``Kd``, ``K1..K4``, the
regularization factor eta, ...) or the initial state can only be estimated by
finite-differencing whole runs — one full simulation per parameter per probe.

Here the whole simulation is one JAX program, so ``jax.grad`` delivers EXACT
discrete adjoints of any observable with respect to ALL parameters at once,
at the cost of roughly one extra (transposed) simulation:

* the implicit Newton solves use implicit-function-theorem adjoints
  (``lax.custom_linear_solve`` — see ``PCTrapezoidalBase(differentiable=
  True)``): the reverse pass solves the transposed 5-point systems with the
  same BiCGStab instead of differentiating through Krylov iterations;
* the scan over time steps is rematerialized (``jax.checkpoint`` per step),
  so reverse-mode memory is one state + one step's intermediates, independent
  of ``num_steps``;
* model constants enter as traced scalars (the :class:`ModelConsts` NamedTuple
  is a pytree), so one ``jax.grad`` call yields the full parameter gradient,
  and ``jax.vmap`` over parameter pytrees batches whole gradient evaluations
  (ensemble calibration on one chip).

Typical use::

    sim = build_simulator(grid, dt=1e-3, num_steps=100)
    # Pick an observable that is actually sensitive to the parameters you
    # fit: dissolved_drug_fraction carries O(1) Kd sensitivity, whereas
    # released_drug_fraction is Kd-invariant by the conservation structure
    # of the reaction (it only transfers mass between cs and cd).
    observable = lambda s: dissolved_drug_fraction(LOCAL_OPS, grid, s)
    loss = lambda p: ((observable(sim(p, s0)) - measured) / measured) ** 2
    g = jax.grad(loss)({"Kd": 1e-2, "Dl_max": 8.01e-4})

or gradient-descent calibration in one call via :func:`fit_parameters`.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from na_dd_tpu.core.state import State
from na_dd_tpu.harness.simulate import make_integrator
from na_dd_tpu.models.coefficients import Model02
from na_dd_tpu.models.consts import ModelConsts, default_model_consts
from na_dd_tpu.ops.grid import Grid
from na_dd_tpu.ops.shifts import LOCAL_OPS, Ops

#: Parameter keys accepted by :func:`build_simulator` beyond the model
#: constants themselves.
_EXTRA_PARAMS = frozenset({"regularization_factor"})


def build_simulator(
    grid: Grid,
    *,
    dt: float,
    num_steps: int,
    t0: float = 0.0,
    variant: str = "reghcstriple",
    base_consts: ModelConsts = default_model_consts,
    model_cls=Model02,
    forcing=None,
    ops: Ops = LOCAL_OPS,
    remat: bool = True,
    **integrator_params,
) -> Callable[[Dict[str, jax.Array], State], State]:
    """Build ``sim(params, state0) -> final State``, a pure function that is
    jit-, grad- and vmap-able in both arguments.

    ``params`` is a (possibly empty) dict overriding entries of
    ``base_consts`` (any :class:`ModelConsts` field) plus optionally
    ``"regularization_factor"`` (the RegHCs eta).  Values may be Python
    floats or traced scalars — the field/integrator stack treats model
    constants as ordinary JAX values, so gradients flow through the
    closed-form Jacobian planes, the correctors and the forcing evaluation.

    The integrator is constructed with ``differentiable=True`` (IFT adjoints
    on every Newton solve); with ``remat`` each step is wrapped in
    ``jax.checkpoint`` so the reverse sweep recomputes step intermediates
    instead of storing num_steps of them.
    """
    integ_defaults = dict(differentiable=True)
    integ_defaults.update(integrator_params)

    def sim(params: Dict[str, jax.Array], state0: State) -> State:
        unknown = set(params) - set(ModelConsts._fields) - _EXTRA_PARAMS
        if unknown:
            raise ValueError(
                f"unknown parameter(s) {sorted(unknown)}; valid keys are "
                f"ModelConsts fields plus {sorted(_EXTRA_PARAMS)}"
            )
        mc = base_consts._replace(
            **{k: v for k, v in params.items() if k in ModelConsts._fields}
        )
        # Only forward eta when the params supply it — make_integrator owns
        # the default so the two cannot drift apart.
        eta_kw = (
            {"regularization_factor": params["regularization_factor"]}
            if "regularization_factor" in params
            else {}
        )
        integ = make_integrator(
            grid,
            model_cls(mc),
            variant=variant,
            forcing=forcing,
            **eta_kw,
            **integ_defaults,
        )

        def step(s, t):
            s1, _diag = integ.step_fn(grid, ops, s, t, dt)
            return s1

        if remat:
            step = jax.checkpoint(step)

        def body(s, k):
            return step(s, t0 + k * dt), None

        ks = jnp.arange(num_steps, dtype=jnp.result_type(float))
        s_final, _ = jax.lax.scan(body, state0, ks)
        return s_final

    return sim


def fit_parameters(
    sim: Callable[[Dict[str, jax.Array], State], State],
    observable: Callable[[State], jax.Array],
    target,
    params0: Dict[str, float],
    state0: State,
    *,
    num_iterations: int = 50,
    learning_rate: float = 1e-2,
    optimizer=None,
    loss_fn: Optional[Callable] = None,
):
    """Gradient-based calibration: fit ``params`` so that
    ``observable(sim(params, state0))`` matches ``target``.

    Parameters are optimized in LOG space (every physical constant here is
    positive and they span ~14 orders of magnitude — K's ~1e-2, Dd_max
    ~2.5e-6, gamma_T 1e-9 — so raw gradient steps with one learning rate are
    hopeless; log-space makes the step size a relative change).

    ``optimizer`` is any optax GradientTransformation (default
    ``optax.adam(learning_rate)``); ``loss_fn(pred, target)`` defaults to the
    TARGET-NORMALIZED mean squared error ``mean(((pred-target)/scale)**2)``
    with ``scale = max(|target|)`` (or 1 for an all-zero target).  The
    normalization matters: Adam's default ``eps=1e-8`` freezes updates when
    gradients are far below eps, so a raw MSE on a small-magnitude observable
    (e.g. a 1e-9 fraction mismatch → 1e-17 loss) silently stalls; the relative
    loss is O(1) regardless of the observable's units.  If you pass your own
    ``loss_fn``, keep its scale near O(1) or supply
    ``optimizer=optax.adam(lr, eps=...)`` accordingly.

    Returns ``(params, history)`` with ``history`` a list of float losses per
    iteration.  The whole update step (value, grad, optimizer update) is one
    jitted program; iterations are a Python loop so the caller can stop early
    on the returned history.
    """
    import optax

    if optimizer is None:
        optimizer = optax.adam(learning_rate)
    if loss_fn is None:
        def loss_fn(pred, tgt):
            scale = jnp.max(jnp.abs(tgt))
            scale = jnp.where(scale > 0, scale, 1.0)
            return jnp.mean(((pred - tgt) / scale) ** 2)

    target = jax.tree_util.tree_map(jnp.asarray, target)
    log_params = {k: jnp.log(jnp.asarray(v, dtype=jnp.result_type(float)))
                  for k, v in params0.items()}
    opt_state = optimizer.init(log_params)

    def loss_of(log_p):
        p = {k: jnp.exp(v) for k, v in log_p.items()}
        return loss_fn(observable(sim(p, state0)), target)

    @jax.jit
    def update(log_p, opt_st):
        value, grads = jax.value_and_grad(loss_of)(log_p)
        updates, opt_st = optimizer.update(grads, opt_st, log_p)
        return optax.apply_updates(log_p, updates), opt_st, value

    history = []
    for _ in range(num_iterations):
        log_params, opt_state, value = update(log_params, opt_state)
        history.append(float(value))
    params = {k: float(jnp.exp(v)) for k, v in log_params.items()}
    return params, history
