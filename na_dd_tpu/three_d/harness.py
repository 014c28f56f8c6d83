"""3-D MMS trial driver: whole-run-as-one-scan error measurement.

The 3-D counterpart of the 2-D trial harness (:mod:`na_dd_tpu.harness.trial`,
reference ``MMSTrial``/``run_simulation_collect_data``): the full simulation
is ONE ``lax.scan`` program — per step, advance the state with the
integrator's jittable ``step_fn`` and evaluate the exact-solution error in
the same fused program (the SymPy→JAX closures trace into the scan).

The error reported is the reference's combined max-integral norm
(src/mms_trial_utils.py:15-53), accumulated INSIDE the scan:

    max_k sqrt( Σ_v ||e_v(t_k)||_H² + ∫₀^{t_k} Σ_{v∈integral} ||∇e_v||_p² dτ )

with trapezoidal time integration of the staggered-gradient terms (weights
``w_gx/w_gy/w_gz`` — the 3-D extension of the 2-D w_pk/w_hp) and the
reference's default integral set {T, cl, cd}.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp

from na_dd_tpu.core.state import State
from na_dd_tpu.three_d.fields import (
    FieldCsTriple3,
    FieldHCsTriple3,
    FieldRegHCsTriple3,
)
from na_dd_tpu.three_d.forcing import (
    MMSForcingCsTriple3,
    MMSForcingHCsTriple3,
    MMSForcingRegHCsTriple3,
)
from na_dd_tpu.three_d.grid import Grid3, make_uniform_grid3
from na_dd_tpu.three_d.integrator import (
    PCTrapezoidalCsTriple3,
    PCTrapezoidalHCsTriple3,
    PCTrapezoidalRegHCsTriple3,
)
from na_dd_tpu.three_d.mms import state_from_mms_when3
from na_dd_tpu.three_d.shifts import LOCAL_OPS3, Ops3

_VARIANTS = {
    "cs": (FieldCsTriple3, MMSForcingCsTriple3, PCTrapezoidalCsTriple3),
    "hcs": (FieldHCsTriple3, MMSForcingHCsTriple3, PCTrapezoidalHCsTriple3),
    "reghcs": (
        FieldRegHCsTriple3,
        MMSForcingRegHCsTriple3,
        PCTrapezoidalRegHCsTriple3,
    ),
}


def make_setup3(
    case_cls,
    *,
    model,
    N: int | None = None,
    variant: str = "reghcs",
    eta: float = 50.0,
    grid: Grid3 | None = None,
    case_params: Dict | None = None,
    integrator_params: Dict | None = None,
):
    """Assemble (grid, case, field, integrator) for a 3-D MMS trial.

    Exactly one of ``N`` (uniform N³ grid) or ``grid`` must be given."""
    if (N is None) == (grid is None):
        raise ValueError("pass exactly one of N (uniform grid) or grid")
    field_cls, forcing_cls, integ_cls = _VARIANTS[variant]
    g = grid if grid is not None else make_uniform_grid3(N, N, N)
    case = case_cls(g, model, **(case_params or {}))
    reg = dict(regularization_factor=eta) if variant == "reghcs" else {}
    forcing = forcing_cls(mms_case=case, model=model, **reg)
    field = field_cls(grid=g, model=model, forcing=forcing, **reg)
    integ = integ_cls(field, **reg, **(integrator_params or {}))
    return g, case, field, integ


def build_runner3(
    g: Grid3,
    case,
    integ,
    *,
    Tf: float,
    dt: float,
    ops: Ops3 = LOCAL_OPS3,
    t0: float = 0.0,
    integral_vars=("T", "cl", "cd"),
):
    """Build the whole-simulation-as-one-scan program.

    Returns ``(run, s0)`` where ``run`` is a jitted ``State -> (final State,
    worst combined err², converged flag, per-var final H-err²)`` — reuse it
    for honest warm-cache timings (each :func:`run_trial3` call builds a
    fresh closure, which re-traces)."""
    from na_dd_tpu.three_d.inner_products import inner_H3, inner_p3
    from na_dd_tpu.three_d.stencils import grad_H3

    # Tf is the ABSOLUTE final time, as in the 2-D harness and the reference
    # (harness/trial.py:132-133): integrate t0 -> Tf in equal steps.
    num_steps = max(1, int(math.ceil((Tf - t0) / dt)))
    dt_adj = (Tf - t0) / num_steps

    s0 = state_from_mms_when3(mms_case=case, t=t0, grid=g)

    def err_sq(s: State, t):
        """(Σ_v ||e_v||_H², Σ_{v∈integral} ||∇e_v||_p², per-var H²)."""
        ex = state_from_mms_when3(mms_case=case, t=t, grid=g)
        total = 0.0
        grad_total = 0.0
        per_var = {}
        for v in State._fields:
            e = getattr(s, v) - getattr(ex, v)
            sq = inner_H3(ops, g, e, e)
            per_var[v] = sq
            total = total + sq
            if v in integral_vars:
                gx, gy, gz = grad_H3(ops, g, e)
                grad_total = grad_total + inner_p3(ops, g, gx, gy, gz, gx, gy, gz)
        return total, grad_total, per_var

    def body(carry, k):
        s, worst, integral, prev_grad, ok, hcs_ok = carry
        t_k = t0 + k * dt_adj
        s1, diag = integ.step_fn(g, ops, s, t_k, dt_adj)
        tot, grad_sq, _ = err_sq(s1, t_k + dt_adj)
        # trapezoidal ∫||∇e||² (reference mms_trial_utils.py:40-49)
        integral = integral + 0.5 * dt_adj * (prev_grad + grad_sq)
        worst = jnp.maximum(worst, tot + integral)
        ok = jnp.logical_and(ok, diag.krylov_converged)
        hcs_ok = jnp.logical_and(hcs_ok, diag.hcs_denominator_ok)
        return (s1, worst, integral, grad_sq, ok, hcs_ok), None

    @jax.jit
    def run(s0):
        ks = jnp.arange(num_steps, dtype=jnp.result_type(float))
        # the initial state is the exact solution, so both the H error and
        # the gradient integrand start at exactly 0 (as in the reference)
        tot0, grad0, _ = err_sq(s0, t0)
        init = (
            s0, tot0, jnp.zeros_like(tot0), grad0,
            jnp.asarray(True), jnp.asarray(True),
        )
        (s_fin, worst, _intg, _pg, ok, hcs_ok), _ = jax.lax.scan(body, init, ks)
        _, _, per_var = err_sq(s_fin, Tf)
        return s_fin, worst, ok, hcs_ok, per_var

    return run, s0


def run_trial3(
    g: Grid3,
    case,
    integ,
    *,
    Tf: float,
    dt: float,
    ops: Ops3 = LOCAL_OPS3,
    t0: float = 0.0,
    integral_vars=("T", "cl", "cd"),
):
    """Run the whole simulation as one jitted scan and return
    ``{"error": the reference-style combined max-integral norm,
    "errors_final": per-var final H errors, "state": final State,
    "krylov_converged": all-solves flag}``."""
    run, s0 = build_runner3(
        g, case, integ, Tf=Tf, dt=dt, ops=ops, t0=t0, integral_vars=integral_vars
    )
    s_fin, worst, ok, hcs_ok, per_var = run(s0)
    if not bool(hcs_ok):
        # same hard failure as the 2-D harness (harness/trial.py:250-253)
        from na_dd_tpu.integrators.pc_trapezoidal import HCsCorrectorPositivityError

        raise HCsCorrectorPositivityError(
            "Denominator 2 - dt Kd (Sd - Cd1) (1 + Cl1) below positiveness threshold."
        )
    return {
        "error": float(jnp.sqrt(worst)),
        "errors_final": {v: float(jnp.sqrt(sq)) for v, sq in per_var.items()},
        "state": s_fin,
        "krylov_converged": bool(ok),
    }


def make_integrator3(
    grid: Grid3,
    model,
    *,
    variant: str = "reghcs",
    regularization_factor: float = 50.0,
    forcing=None,
    **integrator_params,
):
    """Field + 3-D PC integrator with physical forcing (defaults to none) —
    the 3-D twin of :func:`na_dd_tpu.harness.simulate.make_integrator`.

    The production drivers themselves (``harness.simulate.simulate``,
    ``simulate_adaptive``, ``released_drug_fraction``, checkpointing) are
    dimension-agnostic: pass the returned integrator with this grid and
    ``ops=LOCAL_OPS3`` (or a :class:`HaloOps3` inside shard_map) and they run
    unchanged (tests/test_three_d_model.py::test_production_drivers_in_3d).
    """
    from na_dd_tpu.three_d.forcing import NoForcing3

    field_cls, _forcing_cls, integ_cls = _VARIANTS[variant]
    forcing = forcing if forcing is not None else NoForcing3()
    field_kwargs = dict(grid=grid, model=model, forcing=forcing)
    integ_kwargs = dict(krylov_unroll=24)
    integ_kwargs.update(integrator_params)
    if variant == "reghcs":
        field_kwargs["regularization_factor"] = regularization_factor
        integ_kwargs["regularization_factor"] = regularization_factor
    field = field_cls(**field_kwargs)
    return integ_cls(field, track_residuals=False, **integ_kwargs)


def run_eta_sweep3(
    case_cls,
    *,
    model,
    N: int,
    Tf: float,
    dt: float,
    etas,
    krylov_unroll: int = 24,
    krylov_scanned: bool = True,
):
    """Batched regularization-factor sweep in 3-D: ONE vmapped program
    evaluates every η at once (the 3-D twin of the 2-D
    ``run_eta_study_batched``; η is traced through field + forcing +
    corrector — cross-checked against per-η runs in
    tests/test_three_d_model.py).  Raises
    :class:`~na_dd_tpu.integrators.pc_trapezoidal.HCsCorrectorPositivityError`
    if any η's corrector lost positivity.  Returns
    ``{"etas", "errors", "converged"}``."""
    from na_dd_tpu.three_d.fields import FieldRegHCsTriple3
    from na_dd_tpu.three_d.forcing import MMSForcingRegHCsTriple3
    from na_dd_tpu.three_d.integrator import PCTrapezoidalRegHCsTriple3

    g = make_uniform_grid3(N, N, N)
    case = case_cls(g, model)

    def run_eta(eta):
        forcing = MMSForcingRegHCsTriple3(
            mms_case=case, model=model, regularization_factor=eta
        )
        field = FieldRegHCsTriple3(
            grid=g, model=model, forcing=forcing, regularization_factor=eta
        )
        integ = PCTrapezoidalRegHCsTriple3(
            field,
            regularization_factor=eta,
            track_residuals=False,
            krylov_unroll=krylov_unroll,
            # scanned body: vmap of the unrolled solver blows up XLA compile
            krylov_scanned=krylov_scanned,
        )
        run, s0 = build_runner3(g, case, integ, Tf=Tf, dt=dt)
        _s, worst, ok, hcs, _pv = run(s0)
        return jnp.sqrt(worst), ok, hcs

    errs, oks, hcs = jax.vmap(run_eta)(
        jnp.asarray(etas, dtype=jnp.result_type(float))
    )
    if not bool(jnp.all(hcs)):
        from na_dd_tpu.integrators.pc_trapezoidal import (
            HCsCorrectorPositivityError,
        )

        bad = [float(e) for e, h in zip(etas, hcs) if not bool(h)]
        raise HCsCorrectorPositivityError(
            f"HCs corrector denominator lost positivity for eta in {bad}"
        )
    return {
        "etas": [float(e) for e in etas],
        "errors": [float(e) for e in errs],
        "converged": [bool(o) for o in oks],
    }


def mms_error3(
    case_cls,
    *,
    N: int,
    model,
    Tf: float,
    dt: float,
    variant: str = "reghcs",
    eta: float = 50.0,
    case_params: Dict | None = None,
    integrator_params: Dict | None = None,
) -> float:
    """Convenience: build the setup and return the combined H error."""
    g, case, _field, integ = make_setup3(
        case_cls,
        N=N,
        model=model,
        variant=variant,
        eta=eta,
        case_params=case_params,
        integrator_params=integrator_params,
    )
    return run_trial3(g, case, integ, Tf=Tf, dt=dt)["error"]
