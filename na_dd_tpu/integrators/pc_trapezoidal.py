"""Predictor–corrector trapezoidal integrator — the paper's main scheme.

Reference: ``P_ModifiedEuler_C_Trapezoidal_TimeIntegratorBase`` and its three
variants (src/prob1base.py:2906-3219, 3336-3430, 3596-3703).  Per step:

1. cp, cs predicted with modified Euler (Heun);
2. (T, cl, cd) advanced with the trapezoidal rule, solved by Newton sweeps
   that exploit the triangular coupling FT(T) → Fcl(T,cl) → Fcd(T,cl,cd):
   each sweep does three sequential interior linear solves, with the
   cross-coupling blocks entering the right-hand sides as Jacobian-vector
   products;
3. cp, cs corrected with closed-form / pointwise-Newton trapezoidal solves;
4. repeat (2-3) ``num_pc_steps`` times.

TPU-native mechanics:

* every linear operator is matrix-free — ``jax.linearize`` of the residual at
  the current iterate provides both the primal F(u) and the exact
  Jacobian-vector products in one trace, replacing the reference's
  hand-derived 5-diagonal stencil tables + CSR assembly + SuperLU;
* the interior solves use Jacobi-preconditioned BiCGStab
  (:func:`na_dd_tpu.ops.linsolve.bicgstab`) driven to near machine precision
  so Newton-residual parity (< 1e-9 H-norm) holds;
* cross-coupling JVPs are applied to interior-masked increments (the reference
  mixes interior-restricted and full-grid coupling matrices — see
  src/prob1base.py:2243-2293 — which coincide on the zero-boundary states used
  everywhere; we standardize on the interior subspace);
* the whole step is a pure function of (grid, ops, state, t0, dt) and jit/scan
  compatible; data-dependent failure conditions (HCs corrector positivity)
  surface as a boolean in the diagnostics instead of a Python raise, and the
  eager ``.step()`` wrapper raises to preserve the reference behavior.

Boundary semantics are reproduced exactly: the T solve re-zeros T's boundary
each Newton sweep (reference src/prob1base.py:3038-3039) while cl/cd keep
their boundary values (src/prob1base.py:2088-2106); cp/cs correctors zero the
boundary (src/prob1base.py:2993-2996, 3217-3219).
"""

from __future__ import annotations

import os
from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from na_dd_tpu.core.state import State, heaviside_regularized
from na_dd_tpu.ops import linsolve
from na_dd_tpu.ops.grid import Grid
from na_dd_tpu.ops.shifts import LOCAL_OPS, Ops


class HCsCorrectorPositivityError(ValueError):
    """Raised when 2 - dt·Kd(Sd - cd1)(1 + cl1) loses positivity
    (reference src/prob1base.py:3417-3421)."""


class StepDiagnostics(NamedTuple):
    residual_T: jax.Array
    residual_cl: jax.Array
    residual_cd: jax.Array
    krylov_iters: jax.Array  # total BiCGStab iterations in the step
    krylov_resnorm_sq: jax.Array  # worst linear-solve residual (2-norm²)
    krylov_converged: jax.Array  # False if any solve missed its tolerance
    hcs_denominator_ok: jax.Array  # False only for the HCs variant failure mode


_ESSENTIALLY_ZERO = float(jnp.finfo(jnp.float64).eps) * 100

#: Unrolled-BiCGStab budget used when ``krylov_unroll="auto"`` resolves on a
#: non-CPU backend.  Sized for the study protocols' stiffness regimes (see
#: :func:`na_dd_tpu.harness.studies.choose_krylov_unroll` for tighter,
#: per-protocol budgets); the harness warns when a solve misses tolerance.
AUTO_TPU_KRYLOV_UNROLL = 48


def default_krylov_tol(dtype=None) -> float:
    """Dtype-aware default for ``krylov_tol``.

    The relative residual target must be reachable by the working precision:
    1e-13 (a few hundred ulp) in f64 — the value the reference-parity goldens
    were certified against — and 1e-5 (~100·eps) in the f32 production mode.
    An f32 solve can never reach 1e-13, so a dtype-blind default would make
    every f32 solve report "missed tolerance" and train users to ignore the
    one Krylov-convergence warning that matters in f64 runs.
    """
    if dtype is None:
        dtype = jnp.result_type(float)
    return 1e-13 if jnp.finfo(dtype).bits >= 64 else 1e-5


#: Inner-solve relative tolerance for the mixed-precision refinement passes.
#: ~10·eps(f32): reliably reachable by an f32 BiCGStab on these well-
#: conditioned systems, so the masked early exit freezes each pass at a
#: per-pass residual contraction of ~1e-6 (two refinement passes then land
#: the f64 residual at the 1e-13 parity target).
MIXED_INNER_TOL = 1e-6


def default_krylov_unroll() -> int | None:
    """Platform-aware default for ``krylov_unroll``.

    On CPU the ``lax.while_loop`` BiCGStab is exact and cheapest, so return
    None (use it).  On every other backend (TPU in particular) return a
    straight-line unrolled budget: loop-carried 0-d scalars inside
    ``lax.while_loop`` bodies are computed at ~f32 precision by the TPU
    f64-emulation backend (measured 1.6e-7 study-error corruption vs 1.5e-11
    unrolled), so the unrolled solver is the only numerically safe default
    there — and it is also much faster per step (no while_loop latency).
    """
    return None if jax.default_backend() == "cpu" else AUTO_TPU_KRYLOV_UNROLL


class PCTrapezoidalBase:
    """Shared PC machinery; subclasses provide the cs predictor/corrector.

    Dimension-agnostic by design: the PC loop, the cp/cs predictors and
    correctors, the Krylov drivers and the mixed-precision refinement all see
    only pytrees, pointwise algebra, ``ops`` reductions and a stencil object
    with ``.apply``/``.c0`` — the 3-D integrators
    (:mod:`na_dd_tpu.three_d.integrator`) reuse everything here by overriding
    just :meth:`_newton_planes`, :meth:`_probe_stencil`, :meth:`_pallas_ops`
    and :attr:`_local_ops`."""

    #: Default single-device ops provider for the eager ``.step()`` API;
    #: the 3-D subclasses override with LOCAL_OPS3.
    _local_ops: Ops = LOCAL_OPS

    def __init__(
        self,
        semi_discrete_field,
        *,
        num_pc_steps: int = 1,
        num_newton_steps: int = 1,
        krylov_tol: float | None = None,
        krylov_maxiter: int = 300,
        krylov_unroll: int | None | str = "auto",
        krylov_scanned: bool | None = None,
        assemble_stencil: bool = True,
        stencil_source: str = "analytic",
        track_residuals: bool = True,
        stencil_backend: str | None = None,
        precision: str | None = None,
        mixed_refine: int | None = None,
        mixed_final_check: bool | None = None,
        mixed_df: bool | None = None,
        coupling_source: str | None = None,
        fused_triple: bool | None = None,
        linear_solver: str | None = None,
        differentiable: bool = False,
    ):
        """krylov_tol: relative linear-solve residual target.  None (default)
        resolves per-trace to the dtype-aware value (1e-13 in f64, 1e-5 in
        the f32 production mode — see :func:`default_krylov_tol`), so the
        convergence diagnostics stay meaningful in both modes.

        krylov_unroll: an int uses the fully-unrolled BiCGStab with that
        many straight-line iterations (early-exit masked) instead of the
        while_loop solver — much lower latency per step on TPU; requires the
        system to converge within that budget (all study protocols do).
        None forces the while_loop solver (exact on CPU; numerically UNSAFE
        on the TPU f64-emulation backend).  The default "auto" resolves
        per-backend via :func:`default_krylov_unroll`, so constructing an
        integrator with no solver args is safe on TPU.

        krylov_scanned: run the fixed-budget masked iteration under lax.scan
        instead of unrolling it (same update, ~1 ulp agreement, compile time
        independent of the budget — see linsolve.bicgstab_scanned).  None
        (default) reads the NA_DD_TPU_SCANNED env var ("1" enables), so the
        solver shape can be flipped globally for measurement.

        assemble_stencil: extract the 5 stencil coefficient planes of each
        Newton operator once per solve and run the Krylov iterations on the
        assembled stencil — the TPU-shaped analogue of the reference's
        5-diagonal CSR assembly, exact for these discretizations and much
        cheaper per iteration than re-applying the linearized graph.

        stencil_source: how the planes are obtained when assemble_stencil is
        on.  "analytic" (default) evaluates the fields' closed-form
        self-Jacobian planes (``Field01Base.stencil_dFT_dT`` etc. — FT, Fcl,
        Fcd are linear in their own variable) in one fused elementwise pass;
        the rhs cross-coupling terms come from ``jax.jvp`` of the residuals.
        "probe" extracts the same planes with 5 color-probing products of the
        ``jax.linearize`` graph — fully generic (works for any distance-1
        field), used to cross-validate the analytic path
        (tests/test_analytic_stencils.py); ~3x more linearized-graph
        applications per sweep.

        stencil_backend: "jnp" (default) or "pallas" — the f32 production
        path routes whole assembled-stencil solves through the fused
        VMEM-resident Pallas kernels (ops/pallas_kernels.py); Mosaic has no
        f64, so "pallas" requires NA_DD_TPU_X64=0 on real TPU.  Defaults from
        the NA_DD_TPU_STENCIL env var; silently used only on the local
        (single-device) ops path.  The fused solve kernel reports the same
        effective-iteration diagnostics as the jnp solvers (the in-kernel
        early-exit counter is read back through an SMEM scalar output).

        precision: "full" (default) runs the Newton linear solves at the
        ambient dtype.  "mixed" keeps the state, field evaluations and
        right-hand sides in f64 but runs every Krylov iteration in NATIVE
        f32, wrapped in classical iterative refinement: per solve,
        ``mixed_refine + 1`` passes of (f64 true residual → f32 inner
        BiCGStab on the downcast planes → f64 accumulate).  Each pass
        contracts the f64 residual by the inner tolerance
        (:data:`MIXED_INNER_TOL`), so two refinement passes reach the f64
        parity tolerance while the per-iteration work runs at f32 speed —
        on real TPU this also keeps the whole Krylov loop OUT of the f64-
        emulation path (the scan-fusion drift mechanism documented in
        studies/scan_fusion_synthetic_repro.py).  Composes with
        ``stencil_backend="pallas"``: the f32 inner solves route through the
        fused VMEM kernels even though the ambient dtype is f64 (Mosaic has
        no f64 — the refinement wrapper is exactly what makes the kernels
        usable at reference accuracy).  Requires x64 mode and
        ``assemble_stencil=True``.  Defaults from the NA_DD_TPU_PRECISION
        env var ("full"/"mixed").

        mixed_final_check: after the refinement passes, compute one more
        f64 true residual ``b - A·x`` purely to report an HONEST
        ``krylov_converged``/``resnorm_sq`` verdict (default True; env
        NA_DD_TPU_MIXED_CHECK=0 disables).  False skips that
        diagnostic-only plane apply — the returned solution is
        bit-identical, but the verdict degrades to the LAST inner f32
        solve's own convergence flag (inner residual ≤
        :data:`MIXED_INNER_TOL` on the last refinement residual, i.e. a
        contraction-theory proxy: true relative residual ≲
        MIXED_INNER_TOL^(mixed_refine+1)) and ``resnorm_sq`` is reported on
        the last PASS's rhs scale, not ‖b‖.  Purely a perf knob for
        production runs where the per-solve verdict is not consumed.

        mixed_df: compute the refinement's true residuals in DOUBLE-FLOAT
        (two-f32 error-free transformations, ops/doublefloat.py) instead of
        emulated f64.  The refinement iterate is carried as an (hi, lo) f32
        pair; each pass's ``b - A·x`` runs entirely in native f32 (Dekker
        two-prod / Knuth two-sum, absolute error ~2^-47·‖b‖ — below the
        pass's own contraction needs), so the ONLY per-sweep emulated-f64
        work left is the one-time hi/lo split of the coefficient planes and
        the final hi+lo reconstruction (~25 light ops vs ~50 heavy ones:
        the emulated plane-apply is compute-bound at ~50x native f32 when
        dispatched standalone, studies/mixed_perf_probe.json).  Solution
        differs from the emulated-f64 refinement only at the 2^-48-relative
        level (bench A/B on chip: error 4.38284325482074e-9 vs
        4.382843254823708e-9, 6e-13 relative).  MEASURED NEUTRAL on the
        headline bench (2026-08-19, TPU v5e, mixed_fast config: 0.0701 s
        DF vs 0.0697 s emulated; XLA cost model 1238 vs 1243 MB/step): the
        in-program emulated applies fuse into the surrounding graph and the
        whole mixed_fast program is BANDWIDTH-bound at ~89% of HBM peak —
        a DF (hi, lo) pair moves the same 8 bytes as an emulated f64, so
        swapping flops does not move the roofline.  Kept as a gated knob:
        it is the correct substrate for any future byte-reducing variant
        (e.g. f32-state + DF-only-where-cancelling) and for backends whose
        f64 emulation is compute-bound.  Default False; env
        NA_DD_TPU_MIXED_DF=1 enables.  Requires precision="mixed".

        coupling_source: how the Newton rhs cross-coupling terms
        (dFcl/dT·δT, dFcd/dT·δT + dFcd/dcl·δcl) are computed in the
        analytic-stencil path.  "jvp" (default) runs one fused ``jax.jvp``
        pass per solve — primal + tangent of the full field graph.
        "analytic" evaluates only the primal and applies the closed-form
        coupling planes (``Field01Base.stencil_dFcl_dT`` /
        ``stencil_dFcd_dT`` / ``diag_dFcd_dcl``) — the whole sweep becomes
        stencil algebra (same exact operator; agreement to rounding,
        tests/test_analytic_stencils.py).  Defaults from NA_DD_TPU_COUPLING.

        linear_solver: "krylov" (default) solves each Newton system with the
        preconditioned BiCGStab family above.  "direct" solves it EXACTLY by
        block cyclic reduction over dense row-blocks
        (:func:`na_dd_tpu.ops.direct_solve.stencil5_solve_direct`) — the
        TPU-shaped counterpart of the reference's SuperLU ``spsolve``:
        batched m×m inverses + matmuls on the MXU, accuracy independent of
        the stiffness number (no iteration budget to tier).  Far more FLOPs
        than a converged Krylov solve on the smooth small-dt protocols, so
        it is the robustness/verification backstop, not the default.  In
        ``precision="mixed"`` the inner f32 solves use the f32 BCR (each
        refinement pass then contracts the f64 residual by ~f32 eps).
        Requires ``assemble_stencil=True``; local (non-shard_map) ops only.
        Defaults from NA_DD_TPU_SOLVER ("krylov"/"direct").

        differentiable: make the whole step reverse-mode differentiable with
        implicit-function-theorem adjoints.  Every Newton linear solve is
        wrapped in ``jax.lax.custom_linear_solve``: the forward pass is
        bit-identical to the default path (the wrapper returns the solver's
        own output), while under ``jax.grad`` the cotangent solves the
        TRANSPOSED system with the same BiCGStab instead of backpropagating
        through the Krylov iterations — exact adjoints at one extra solve per
        solve, O(1) memory in the iteration count, and it works even with the
        (otherwise non-reverse-differentiable) ``lax.while_loop`` solver.
        Parameter gradients (model constants, regularization factor, initial
        state, dt-independent forcings) flow through the closed-form plane
        algebra automatically.  The reference has no adjoint capability at
        all (its solves are SuperLU calls on hand-assembled CSR); this is a
        TPU-framework-native extension enabling gradient-based calibration
        (see :mod:`na_dd_tpu.harness.gradients`).  Covers every production
        solver config on the jnp backend: full-precision Krylov (the
        transpose solve reuses BiCGStab on the auto-transposed matvec),
        ``linear_solver="direct"`` (the cotangent system is another
        block-tridiagonal solve — BCR on the explicitly transposed planes,
        :meth:`Stencil5.transpose`) and ``precision="mixed"`` (the
        refinement wrapper is linear in b, so the transposed-plane
        refinement is its exact adjoint solve).  Requires
        stencil_backend="jnp" (the Mosaic kernels define no VJP).

        Adjoint-convergence caveat: ``custom_linear_solve`` discards the
        transpose solve's diagnostics, so an unconverged adjoint BiCGStab
        (e.g. a small ``krylov_unroll`` budget on a stiff system) yields a
        silently inaccurate gradient — unlike the forward pass, which
        surfaces ``krylov_converged``.  The forward and transposed systems
        share the spectrum (Aᵀ has the same eigenvalues), so a budget that
        converges forward solves comfortably (check StepDiagnostics) is the
        practical guard; when in doubt, raise ``krylov_unroll`` or validate
        the gradient against the unrolled-backprop route
        (``differentiable=False`` with ``krylov_unroll`` set), as
        tests/test_gradients.py does."""
        self.semi_discrete_field = semi_discrete_field
        self._model = semi_discrete_field.model
        self._grid = semi_discrete_field.grid
        self.num_pc_steps = int(num_pc_steps)
        self.num_newton_steps = int(num_newton_steps)
        # None resolves LAZILY (first read, i.e. trace time) to the
        # dtype-aware default: jnp.result_type(float) is f64/f32 depending on
        # the x64 mode ACTIVE WHEN THE PROGRAM IS TRACED, which may be set
        # after construction (tests toggle jax.enable_x64 contexts).
        self._krylov_tol = None if krylov_tol is None else float(krylov_tol)
        self.krylov_maxiter = int(krylov_maxiter)
        if isinstance(krylov_unroll, str) and krylov_unroll != "auto":
            raise ValueError(f"krylov_unroll must be an int, None or 'auto'; got {krylov_unroll!r}")
        # "auto" resolves LAZILY (first .krylov_unroll read, i.e. trace time):
        # default_krylov_unroll() queries jax.default_backend(), and touching
        # the backend during construction would pin the platform before the
        # caller's own jax.config setup (CLAUDE.md: force the platform before
        # any jax call) — e.g. dryrun_multichip builds integrators before
        # device configuration is final.
        self._krylov_unroll = (
            krylov_unroll if krylov_unroll in (None, "auto") else int(krylov_unroll)
        )
        if krylov_scanned is None:
            krylov_scanned = os.environ.get("NA_DD_TPU_SCANNED", "") == "1"
        self.krylov_scanned = bool(krylov_scanned)
        self.assemble_stencil = bool(assemble_stencil)
        if stencil_source not in ("analytic", "probe"):
            raise ValueError(f"stencil_source must be 'analytic' or 'probe'; got {stencil_source!r}")
        self.stencil_source = stencil_source
        self.track_residuals = bool(track_residuals)
        if stencil_backend is None:
            stencil_backend = os.environ.get("NA_DD_TPU_STENCIL", "jnp")
        if stencil_backend not in ("jnp", "pallas"):
            raise ValueError(f"stencil_backend must be 'jnp' or 'pallas'; got {stencil_backend!r}")
        self.stencil_backend = stencil_backend
        if precision is None:
            precision = os.environ.get("NA_DD_TPU_PRECISION", "full")
        if precision not in ("full", "mixed", "df"):
            raise ValueError(
                f"precision must be 'full', 'mixed' or 'df'; got {precision!r}"
            )
        if precision == "mixed" and not self.assemble_stencil:
            raise ValueError("precision='mixed' requires assemble_stencil=True")
        if precision == "df":
            # the f32-state double-float step (round 5): every field
            # evaluation, plane assembly, rhs combination and corrector runs
            # in native-f32 DF via the jaxpr lift; it needs the closed-form
            # analytic planes (the probe path linearizes a graph the lift
            # never builds) and assembled stencils for the refinement.
            if not self.assemble_stencil or stencil_source != "analytic":
                raise ValueError(
                    "precision='df' requires assemble_stencil=True and "
                    "stencil_source='analytic'"
                )
            if differentiable:
                raise ValueError(
                    "precision='df' does not support differentiable=True "
                    "(the DF jaxpr interpreter defines no VJP); use "
                    "precision='mixed' for adjoint runs"
                )
        self.precision = precision
        if mixed_refine is None:
            mixed_refine = int(os.environ.get("NA_DD_TPU_MIXED_REFINE", "2"))
        self.mixed_refine = int(mixed_refine)
        if mixed_final_check is None:
            mixed_final_check = os.environ.get("NA_DD_TPU_MIXED_CHECK", "1") != "0"
        self.mixed_final_check = bool(mixed_final_check)
        if mixed_df is None:
            mixed_df = os.environ.get("NA_DD_TPU_MIXED_DF", "0") == "1"
        self.mixed_df = bool(mixed_df)
        if coupling_source is None:
            coupling_source = os.environ.get("NA_DD_TPU_COUPLING", "jvp")
        if coupling_source not in ("jvp", "analytic"):
            raise ValueError(
                f"coupling_source must be 'jvp' or 'analytic'; got {coupling_source!r}"
            )
        self.coupling_source = coupling_source
        if linear_solver is None:
            linear_solver = os.environ.get("NA_DD_TPU_SOLVER", "krylov")
        if linear_solver not in ("krylov", "direct"):
            raise ValueError(
                f"linear_solver must be 'krylov' or 'direct'; got {linear_solver!r}"
            )
        if linear_solver == "direct" and not self.assemble_stencil:
            raise ValueError("linear_solver='direct' requires assemble_stencil=True")
        self.linear_solver = linear_solver
        self.differentiable = bool(differentiable)
        if self.differentiable:
            # full-krylov wraps the matrix-free BiCGStab (auto-transposed
            # matvec); mixed and direct wrap their plane-based solvers with
            # explicitly transposed planes (Stencil5.transpose).  Only the
            # Mosaic kernel backend stays out: its solves would be fine
            # under the IFT wrapper (solve fns are never differentiated),
            # but the jnp path keeps the gradient test matrix exact.
            if self.stencil_backend != "jnp":
                raise ValueError(
                    "differentiable=True requires stencil_backend='jnp' "
                    f"(got {self.stencil_backend!r})"
                )
        # fused triple-solve kernel on the pallas+analytic path.  Default ON
        # (env NA_DD_TPU_TRIPLE=0 disables) — measured 0.034 s vs 0.031 s
        # for the per-solve fused path at N=256 (slightly slower there: 32
        # co-resident input planes pipeline worse than three small kernels
        # overlapped with XLA elementwise work), kept selectable for sizes/
        # budgets where one launch per sweep wins.
        if fused_triple is None:
            fused_triple = os.environ.get("NA_DD_TPU_TRIPLE", "1") != "0"
        self.fused_triple = bool(fused_triple)
        # measurement flag: probe the 5 stencil planes under one vmap instead
        # of 5 inlined applies (see linsolve.probe_stencil_vmapped)
        self.probe_vmapped = os.environ.get("NA_DD_TPU_PROBE", "") == "vmap"
        # Populated by the eager .step() wrapper for reference-API parity.
        self.last_residual: Dict[str, jax.Array] = {}
        self._jit_step = jax.jit(self.step_fn, static_argnums=1)

    @property
    def krylov_tol(self) -> float:
        """Resolved linear-solve tolerance; a None default materializes the
        dtype-aware value on every read (NOT cached — the x64 mode can be
        toggled between traces and each trace must see its own precision)."""
        if self._krylov_tol is None:
            return default_krylov_tol()
        return self._krylov_tol

    @krylov_tol.setter
    def krylov_tol(self, value: float | None) -> None:
        self._krylov_tol = None if value is None else float(value)

    @property
    def krylov_unroll(self) -> int | None:
        """Resolved unroll budget; materializes the platform-aware "auto"
        default on first read (trace time), not at construction."""
        if self._krylov_unroll == "auto":
            self._krylov_unroll = default_krylov_unroll()
        return self._krylov_unroll

    @krylov_unroll.setter
    def krylov_unroll(self, value: int | None) -> None:
        self._krylov_unroll = None if value is None else int(value)

    def _newton_planes(self, g, ops, L, dt):
        """Planes of the interior Newton operator 2·I − dt·L for a
        self-Jacobian stencil ``L`` — one of the two dimension-specific hooks
        in the sweep (the 3-D integrators override with the Stencil7 builder)."""
        return linsolve.newton_planes(g, ops, L, dt)

    def _probe_stencil(self, matvec, g):
        """Color-probing plane extraction for the generic (stencil_source=
        "probe") path — the other dimension-specific hook (5-color in 2-D;
        the 3-D integrators override with the 7-color prober)."""
        probe = (
            linsolve.probe_stencil_vmapped
            if self.probe_vmapped
            else linsolve.probe_stencil
        )
        return probe(matvec, g)

    def _pallas_ops(self):
        """Kernel entry points for ``stencil_backend="pallas"`` — the third
        dimension-specific hook.  Returns ``(apply_fits, apply, apply_tiled,
        fused_fits, fused_solve)``; ``apply_tiled`` may be None (no tiled
        kernel in that dimension — callers fall back to the jnp apply beyond
        the single-block VMEM budget)."""
        from na_dd_tpu.ops import pallas_kernels as pk

        return (
            pk.apply_fits,
            pk.stencil5_apply_pallas,
            pk.stencil5_apply_tiled,
            pk.fused_solve_fits,
            pk.bicgstab_solve_pallas,
        )

    def _direct_solve_ops(self):
        """The location-transparent exact direct solver for
        ``linear_solver="direct"`` — the fourth dimension-specific hook.
        Returns a callable ``(ops, stencil, b, mask) -> x`` (BCR over dense
        row-blocks in 2-D, x-plane-blocks in 3-D)."""
        from na_dd_tpu.ops.direct_solve import stencil5_solve_direct_ops

        return stencil5_solve_direct_ops

    # ------------------------------------------------------------------
    # cp predictor / corrector (shared across variants;
    # reference src/prob1base.py:2953-2996)
    # ------------------------------------------------------------------
    def initial_cp_pred(self, g: Grid, ops: Ops, at_t: State, t, *, dt):
        Fcp = self.semi_discrete_field.Fcp
        Fcp0 = Fcp(g, ops, at_t, t)
        s_star = at_t._replace(cp=at_t.cp + dt * Fcp0)
        Fcp_star = Fcp(g, ops, s_star, t + dt)
        return at_t.cp + 0.5 * dt * (Fcp0 + Fcp_star)

    def corrector_cp_step(self, g: Grid, ops: Ops, T1, cl1, _cd1, *, at_t0: State, t0, dt):
        m = self._model
        fcp = self.semi_discrete_field.forcing.fcp
        t1 = t0 + dt
        src0 = fcp(g, ops, t0)
        src1 = fcp(g, ops, t1)
        alpha0 = -m.K2 * at_t0.T - m.K1 * (at_t0.cl + 1.0)
        alpha1 = -m.K2 * T1 - m.K1 * (cl1 + 1.0)
        num = (1.0 + 0.5 * dt * alpha0) * at_t0.cp + 0.5 * dt * (src0 + src1)
        den = 1.0 - 0.5 * dt * alpha1
        return g.interior_mask * num / den

    # ------------------------------------------------------------------
    # cs predictor (shared by HCs/RegHCs; CsTriple omits the boundary mask —
    # reference src/prob1base.py:3174-3188 vs 3365-3379, 3631-3645)
    # ------------------------------------------------------------------
    def _heun_cs(self, g: Grid, ops: Ops, at_t: State, t, *, dt):
        Fcs = self.semi_discrete_field.Fcs
        Fcs0 = Fcs(g, ops, at_t, t)
        s_star = at_t._replace(cs=at_t.cs + dt * Fcs0)
        Fcs_star = Fcs(g, ops, s_star, t + dt)
        return at_t.cs + 0.5 * dt * (Fcs0 + Fcs_star)

    def initial_cs_pred(self, g, ops, at_t, t, *, dt):  # pragma: no cover - abstract
        raise NotImplementedError

    def corrector_cs_step(self, g, ops, T1, cl1, cd1, *, at_t0, t0, dt):  # pragma: no cover
        raise NotImplementedError

    # ------------------------------------------------------------------
    # Inner native-f32 solve shared by the mixed and df precision modes
    # ------------------------------------------------------------------
    def _inner_f32_solve(self, ops, st32, b32, inv32, mask32):
        """One inner f32 BiCGStab pass on f32 planes (mixed/df modes).

        Routes through the fused Pallas kernels when selected/possible —
        this is the path that makes the Mosaic (f32-only) kernels usable
        inside an f64-accurate run."""
        if self.linear_solver == "direct":
            # f32 BCR inner solve: each refinement pass contracts the f64
            # residual by ~f32 eps, independent of stiffness (no budget).
            x32 = self._direct_solve_ops()(ops, st32, b32, mask32)
            return x32, {
                "iters": jnp.asarray(1, dtype=jnp.int32),
                "resnorm_sq": jnp.asarray(0.0, dtype=b32.dtype),
                "converged": jnp.asarray(True),
            }
        dot32 = lambda u, v: ops.asum(u * v)  # noqa: E731
        if self.stencil_backend == "pallas" and ops is self._local_ops:
            afits, apply_k, apply_tiled, ffits, fsolve = self._pallas_ops()

            interp = jax.default_backend() == "cpu"
            if (
                self.krylov_unroll is not None
                and not self.krylov_scanned
                and ffits(b32.shape, b32.dtype)
            ):
                return fsolve(
                    st32, b32, inv32, mask32,
                    tol=MIXED_INNER_TOL, iters=self.krylov_unroll,
                    interpret=interp,
                )
            if afits(b32.shape, b32.dtype):
                matvec32 = lambda w: apply_k(st32, w, interpret=interp)  # noqa: E731
            elif apply_tiled is not None:
                # beyond the single-block budget: row-tiled grid kernel
                matvec32 = lambda w: apply_tiled(st32, w, interpret=interp)  # noqa: E731
            else:
                matvec32 = lambda w: st32.apply(ops, w)  # noqa: E731
        else:
            matvec32 = lambda w: st32.apply(ops, w)  # noqa: E731
        minv32 = lambda r: r * inv32  # noqa: E731
        if self.krylov_unroll is not None:
            solver = (
                linsolve.bicgstab_scanned
                if self.krylov_scanned
                else linsolve.bicgstab_unrolled
            )
            delta, info = solver(
                matvec32, b32, jnp.zeros_like(b32), dot=dot32, minv=minv32,
                tol=MIXED_INNER_TOL, iters=self.krylov_unroll,
            )
        else:
            delta, info = linsolve.bicgstab(
                matvec32, b32, jnp.zeros_like(b32), dot=dot32, minv=minv32,
                tol=MIXED_INNER_TOL, maxiter=self.krylov_maxiter,
            )
        return delta * mask32, info

    # ------------------------------------------------------------------
    # Newton sweep over the triangular (T, cl, cd) block
    # ------------------------------------------------------------------
    def _newton_sweep(self, g, ops, s: State, t1, dt, Y, red, black):
        """One Gauss-Seidel Newton sweep linearized at iterate ``s``.

        Returns (T_new, cl_new, cd_new, residuals, krylov_iters)."""
        field = self.semi_discrete_field
        YT0, Ycl0, Ycd0 = Y
        mask = g.interior_mask
        dot = lambda u, v: ops.asum(u * v)

        # Squared rhs-noise floors (see solve_assembled): each Newton rhs is
        # Y − (2s − dt·F), a near-cancellation of O(‖Y‖) quantities, so it
        # carries ~eps·‖Y‖ of absolute rounding noise.  Only the honest-
        # TRUE-residual paths consume these; the static guard keeps the
        # recursive-residual Krylov programs' jaxprs (and hence their
        # persistent-compilation-cache keys) bit-identical.
        if self.precision == "mixed" or self.linear_solver == "direct":
            eps_b = 10.0 * float(jnp.finfo(s.T.dtype).eps)
            noise_T = eps_b * eps_b * dot(YT0, YT0)
            noise_cl = eps_b * eps_b * dot(Ycl0, Ycl0)
            noise_cd = eps_b * eps_b * dot(Ycd0, Ycd0)
        else:
            noise_T = noise_cl = noise_cd = 0.0

        def krylov(matvec, rhs, inv_diag):
            minv = lambda r: r * inv_diag  # noqa: E731

            def run(mv, b):
                if self.krylov_unroll is not None:
                    solver = (
                        linsolve.bicgstab_scanned
                        if self.krylov_scanned
                        else linsolve.bicgstab_unrolled
                    )
                    return solver(
                        mv, b, jnp.zeros_like(b), dot=dot, minv=minv,
                        tol=self.krylov_tol, iters=self.krylov_unroll,
                    )
                return linsolve.bicgstab(
                    mv, b, jnp.zeros_like(b), dot=dot, minv=minv,
                    tol=self.krylov_tol, maxiter=self.krylov_maxiter,
                )

            b = rhs * mask
            if self.differentiable:
                # Implicit-function-theorem adjoint: forward output is run()'s
                # own (bit-identical); under reverse-mode AD the cotangent
                # solves Aᵀy = ḡ with the SAME solver (transpose_solve receives
                # the auto-transposed matvec) instead of backpropagating
                # through the Krylov iterations.  The Jacobi preconditioner is
                # reused as-is — diag(Aᵀ) = diag(A).
                delta, info = jax.lax.custom_linear_solve(
                    matvec, b, solve=run, transpose_solve=run, has_aux=True
                )
            else:
                delta, info = run(matvec, b)
            return delta * mask, info

        solve_f32 = lambda st32, b32, inv32, mask32: (  # noqa: E731
            self._inner_f32_solve(ops, st32, b32, inv32, mask32)
        )

        def solve_assembled_mixed(st, rhs, inv_diag, noise_sq=0.0):
            """Iterative refinement: f64 residuals around f32 inner solves.

            Classical mixed-precision refinement (Wilkinson; the standard
            low-precision-solver/high-precision-residual scheme): x ← x +
            E(b − A x) with E an approximate f32 inverse (one BiCGStab pass
            to :data:`MIXED_INNER_TOL`).  Each pass contracts ‖b − A x‖ by
            ~the inner tolerance, so ``mixed_refine`` passes after the first
            reach the f64 target while every Krylov iteration runs in native
            f32 (never touching the TPU f64-emulation path)."""
            if jnp.finfo(jnp.result_type(float)).bits < 64:
                raise ValueError(
                    "precision='mixed' requires x64 mode (the ambient dtype "
                    "must be f64 for the refinement residuals)"
                )
            f32 = jnp.float32
            # type(st) (not Stencil5 literally): the identical refinement
            # wrapper serves the 3-D integrators' Stencil7 planes.
            st32 = type(st)(*(p.astype(f32) for p in st))
            inv32 = inv_diag.astype(f32)
            mask32 = mask.astype(f32)
            b = rhs * mask
            total_iters = jnp.asarray(0)
            if self.mixed_df:
                # Double-float residuals (see the mixed_df docstring): the
                # iterate lives as an (hi, lo) f32 pair and each pass's
                # b - A·x runs in native-f32 EFT arithmetic; the emulated
                # f64 touches only the plane splits + final reconstruction.
                from na_dd_tpu.ops import doublefloat as dfm

                _, st_lo = dfm.df_split_stencil(st, st32)
                b_df = dfm.df_split(b)
                x_df = dfm.df_zeros_like(b_df.hi)
                for k in range(self.mixed_refine + 1):
                    if k == 0:
                        r32 = b_df.hi
                    else:
                        a_df = dfm.df_stencil_apply(st32, st_lo, ops, x_df)
                        r32 = dfm.df_sub(b_df, a_df).hi * mask32
                    e32, info = solve_f32(st32, r32, inv32, mask32)
                    x_df = dfm.df_add_f32(x_df, e32 * mask32)
                    total_iters = total_iters + info["iters"]
                x = dfm.df_to(x_df, b.dtype) * mask
            else:
                x = jnp.zeros_like(b)
                for k in range(self.mixed_refine + 1):
                    r = b if k == 0 else (b - st.apply(ops, x)) * mask
                    e32, info = solve_f32(st32, r.astype(f32), inv32, mask32)
                    x = x + e32.astype(b.dtype) * mask
                    total_iters = total_iters + info["iters"]
            if not self.mixed_final_check:
                # proxy verdict from the LAST inner f32 solve (see the
                # mixed_final_check docstring); saves one diagnostic-only
                # f64-emulated plane apply + two reductions per solve
                return x, {
                    "iters": total_iters,
                    "resnorm_sq": info["resnorm_sq"].astype(b.dtype),
                    "converged": info["converged"],
                }
            r_final = (b - st.apply(ops, x)) * mask
            rsq = dot(r_final, r_final)
            tol = self.krylov_tol
            return x, {
                "iters": total_iters,
                "resnorm_sq": rsq,
                "converged": rsq <= jnp.maximum(tol * tol * dot(b, b), noise_sq),
            }

        def solve_direct(st, rhs, noise_sq=0.0):
            """Exact BCR direct solve (linear_solver='direct'); see
            ops/direct_solve.py for the TPU rationale vs the reference's
            SuperLU spsolve (src/prob1base.py:2109-2130)."""
            b = rhs * mask
            x = self._direct_solve_ops()(ops, st, b, mask)
            r = (b - st.apply(ops, x)) * mask
            rsq = dot(r, r)
            tol = self.krylov_tol
            return x, {
                "iters": jnp.asarray(1, dtype=jnp.int32),
                "resnorm_sq": rsq,
                "converged": rsq <= jnp.maximum(tol * tol * dot(b, b), noise_sq),
            }

        def solve_assembled(st, rhs, noise_sq=0.0):
            """Krylov on assembled Newton planes (diag = st.c0 is exact).

            ``noise_sq`` is the squared absolute noise floor of the rhs
            itself: the Newton rhs is formed by near-cancellation of O(‖Y‖)
            quantities (Y − 2s + dt·F), so b carries ~eps·‖Y‖ of rounding
            noise and no solver can drive the TRUE residual below it.  The
            honest-residual paths (mixed refinement, direct) take their
            convergence target as max(tol²·‖b‖², noise_sq) — without the
            floor, any solve whose rhs has mostly cancelled (e.g. the second
            Newton sweep of an already-converged iterate) is flagged
            unconverged at a residual of ~1e-34.  The recursive-residual
            Krylov paths are unaffected (their internal residual contracts
            algebraically and never observes the floor)."""
            inv_diag = jnp.where(
                mask > 0, 1.0 / jnp.where(st.c0 == 0, 1.0, st.c0), 0.0
            )

            def ift_plane_solve(plane_solver):
                """IFT adjoints for the plane-based solvers (mixed
                refinement, BCR direct): the forward output is the solver's
                own; under reverse-mode AD the cotangent system Aᵀy = ḡ is
                solved by the SAME solver on the explicitly transposed
                planes (diag(Aᵀ) = diag(A), so preconditioners/verdicts
                carry over).  Like the Krylov wrapper, the transpose solve's
                aux diagnostics are discarded by custom_linear_solve — see
                the differentiable docstring caveat."""
                b = rhs * mask
                st_T = st.transpose(ops)
                matvec = lambda w: st.apply(ops, w)  # noqa: E731
                x, info = jax.lax.custom_linear_solve(
                    matvec,
                    b,
                    solve=lambda _mv, bb: plane_solver(st, bb),
                    transpose_solve=lambda _mv, bb: plane_solver(st_T, bb),
                    has_aux=True,
                )
                return x * mask, info

            if self.precision == "mixed":
                if self.differentiable:
                    # inv_diag is recomputed per operand: diag(Aᵀ) = diag(A)
                    # so the same expression serves both orientations
                    return ift_plane_solve(
                        lambda stx, b: solve_assembled_mixed(
                            stx,
                            b,
                            jnp.where(
                                mask > 0,
                                1.0 / jnp.where(stx.c0 == 0, 1.0, stx.c0),
                                0.0,
                            ),
                            noise_sq,
                        )
                    )
                return solve_assembled_mixed(st, rhs, inv_diag, noise_sq)
            if self.linear_solver == "direct":
                if self.differentiable:
                    return ift_plane_solve(
                        lambda stx, b: solve_direct(stx, b, noise_sq)
                    )
                return solve_direct(st, rhs, noise_sq)
            if self.stencil_backend == "pallas" and ops is self._local_ops:
                afits, apply_k, apply_tiled, ffits, fsolve = self._pallas_ops()

                # on CPU the kernels run in interpret mode, so the pallas
                # code path is exercisable (and tested) off-TPU (the axon
                # plugin's backend name is not "tpu", so test for cpu)
                interp = jax.default_backend() == "cpu"
                if (
                    self.krylov_unroll is not None
                    and not self.krylov_scanned
                    # grids too big for the single-block fused solve fall
                    # back to the apply-only kernel below (still VMEM-fused
                    # per apply)
                    and ffits(rhs.shape, rhs.dtype)
                ):
                    # whole solve in ONE VMEM-resident kernel (same masked
                    # early-exit update as bicgstab_unrolled)
                    delta, info = fsolve(
                        st,
                        rhs * mask,
                        inv_diag,
                        mask,
                        tol=self.krylov_tol,
                        iters=self.krylov_unroll,
                        interpret=interp,
                    )
                    return delta * mask, info
                if afits(rhs.shape, rhs.dtype):
                    matvec = lambda w: apply_k(st, w, interpret=interp)  # noqa: E731
                elif apply_tiled is not None:
                    # beyond the single-block VMEM budget: row-tiled grid
                    # kernel (N >= ~1024 f32 stays on the Pallas path)
                    matvec = lambda w: apply_tiled(st, w, interpret=interp)  # noqa: E731
                else:
                    matvec = lambda w: st.apply(ops, w)  # noqa: E731
            else:
                matvec = lambda w: st.apply(ops, w)  # noqa: E731
            return krylov(matvec, rhs, inv_diag)

        def inner_solve(matvec, rhs, noise_sq=0.0):
            """Probe/matrix-free path: planes (or just the diagonal) are
            extracted from the linearized-graph matvec."""
            if self.assemble_stencil:
                return solve_assembled(self._probe_stencil(matvec, g), rhs, noise_sq)
            diag = linsolve.probe_diag(matvec, red * mask, black * mask)
            inv_diag = jnp.where(mask > 0, 1.0 / jnp.where(diag == 0, 1.0, diag), 0.0)
            return krylov(matvec, rhs, inv_diag)

        analytic = self.assemble_stencil and self.stencil_source == "analytic"

        # --- fused triple-solve kernel (pallas + analytic couplings):
        # the whole triangular sweep's linear algebra in ONE VMEM-resident
        # kernel — no HBM round-trips between the T/cl/cd solves ---
        if (
            analytic
            and self.fused_triple
            and self.coupling_source == "analytic"
            and self.precision in ("full", "mixed")
            and self.linear_solver == "krylov"
            and self.stencil_backend == "pallas"
            # LOCAL_OPS (not self._local_ops): the triple kernel is 2-D-only
            # (25 co-resident planes would cap 3-D cubes at N~30; the 3-D
            # pallas path uses the per-solve fused kernel instead)
            and ops is LOCAL_OPS
            and self.krylov_unroll is not None
            and not self.krylov_scanned
        ):
            from na_dd_tpu.ops.pallas_kernels import (
                triple_solve_fits,
                triple_solve_pallas,
            )

            kernel_dtype = (
                jnp.float32 if self.precision == "mixed" else s.T.dtype
            )
            if triple_solve_fits(s.T.shape, kernel_dtype):
                interp = jax.default_backend() == "cpu"
                fT0 = field.FT(g, ops, s, t1)
                fcl0 = field.Fcl(g, ops, s, t1)
                fcd0 = field.Fcd(g, ops, s, t1)
                J_T = self._newton_planes(g, ops, field.stencil_dFT_dT(g, ops, s), dt)
                J_cl = self._newton_planes(g, ops, field.stencil_dFcl_dcl(g, ops, s), dt)
                J_cd = self._newton_planes(g, ops, field.stencil_dFcd_dcd(g, ops, s), dt)
                C_clT = field.stencil_dFcl_dT(g, ops, s)
                C_cdT = field.stencil_dFcd_dT(g, ops, s)
                d_cdcl = field.diag_dFcd_dcl(g, s)
                rhs_T = YT0 - (2.0 * s.T - dt * fT0)
                base_cl = Ycl0 - 2.0 * s.cl + dt * fcl0
                base_cd = Ycd0 - 2.0 * s.cd + dt * fcd0
                inv = lambda st: jnp.where(  # noqa: E731
                    mask > 0, 1.0 / jnp.where(st.c0 == 0, 1.0, st.c0), 0.0
                ).astype(st.c0.dtype)
                if self.precision == "full":
                    dT, dcl, dcd, info3 = triple_solve_pallas(
                        J_T, J_cl, J_cd, C_clT, C_cdT, d_cdcl,
                        rhs_T, base_cl, base_cd,
                        inv(J_T), inv(J_cl), inv(J_cd), mask, dt,
                        tol=self.krylov_tol,
                        iters=self.krylov_unroll,
                        interpret=interp,
                    )
                    unpack = lambda k: {  # noqa: E731
                        key: info3[key][k]
                        for key in ("iters", "resnorm_sq", "converged")
                    }
                    info_T, info_cl, info_cd = unpack(0), unpack(1), unpack(2)
                else:
                    # Mixed precision, whole-sweep form: block-triangular
                    # iterative refinement with the fused f32 triple kernel
                    # as the inner solver.  The sweep's linear algebra is the
                    # block lower-triangular system M z = w with
                    #   M = [[J_T, 0, 0],
                    #        [-dt C_clT,  J_cl, 0],
                    #        [-dt C_cdT, -dt diag(d_cdcl), J_cd]],
                    #   w = (rhs_T, base_cl, base_cd);
                    # the triple kernel applied to a residual r solves
                    # M e = r exactly in that triangular form, so classical
                    # refinement z <- z + kernel(w - M z) converges each row
                    # to the f64 target while EVERY Krylov iteration (all
                    # three solves, couplings included) stays inside one
                    # native-f32 VMEM kernel per pass — one launch per pass
                    # instead of three, and the f64 emulation touches only
                    # the residual plane-applies between passes.
                    f32 = jnp.float32
                    cast = lambda st: type(st)(  # noqa: E731
                        *(p.astype(f32) for p in st)
                    )
                    J_T32, J_cl32, J_cd32 = cast(J_T), cast(J_cl), cast(J_cd)
                    C_clT32, C_cdT32 = cast(C_clT), cast(C_cdT)
                    d32 = d_cdcl.astype(f32)
                    m32 = mask.astype(f32)
                    wT = rhs_T * mask
                    wcl = base_cl * mask
                    wcd = base_cd * mask
                    iters3 = jnp.zeros((3,), dtype=jnp.int32)
                    inv_T32, inv_cl32, inv_cd32 = (
                        inv(J_T32), inv(J_cl32), inv(J_cd32),
                    )
                    if self.mixed_df:
                        # Double-float block residuals (mixed_df docstring):
                        # all three refinement iterates live as (hi, lo) f32
                        # pairs and the whole block residual
                        #   r = w - M z  (M the block lower-triangular sweep
                        # operator) runs in native-f32 EFT arithmetic; the
                        # emulated f64 is reduced to the one-time hi/lo
                        # plane splits + the final z reconstruction.
                        from na_dd_tpu.ops import doublefloat as dfm

                        _, J_Tlo = dfm.df_split_stencil(J_T, J_T32)
                        _, J_cllo = dfm.df_split_stencil(J_cl, J_cl32)
                        _, J_cdlo = dfm.df_split_stencil(J_cd, J_cd32)
                        _, C_clTlo = dfm.df_split_stencil(C_clT, C_clT32)
                        _, C_cdTlo = dfm.df_split_stencil(C_cdT, C_cdT32)
                        d_df = dfm.df_split_with_hi(d_cdcl, d32)
                        dt_df = dfm.df_split(jnp.asarray(dt, wT.dtype))
                        wT_df = dfm.df_split(wT)
                        wcl_df = dfm.df_split(wcl)
                        wcd_df = dfm.df_split(wcd)
                        zT_df = dfm.df_zeros_like(wT_df.hi)
                        zcl_df = dfm.df_zeros_like(wcl_df.hi)
                        zcd_df = dfm.df_zeros_like(wcd_df.hi)
                        for k in range(self.mixed_refine + 1):
                            if k == 0:
                                rT32, rcl32, rcd32 = (
                                    wT_df.hi, wcl_df.hi, wcd_df.hi,
                                )
                            else:
                                aT = dfm.df_stencil_apply(
                                    J_T32, J_Tlo, ops, zT_df
                                )
                                rT32 = dfm.df_sub(wT_df, aT).hi * m32
                                c_cl = dfm.df_stencil_apply(
                                    C_clT32, C_clTlo, ops, zT_df
                                )
                                a_cl = dfm.df_stencil_apply(
                                    J_cl32, J_cllo, ops, zcl_df
                                )
                                rcl32 = dfm.df_sub(
                                    dfm.df_add(wcl_df, dfm.df_mul(dt_df, c_cl)),
                                    a_cl,
                                ).hi * m32
                                c_cd = dfm.df_add(
                                    dfm.df_stencil_apply(
                                        C_cdT32, C_cdTlo, ops, zT_df
                                    ),
                                    dfm.df_mul(d_df, zcl_df),
                                )
                                a_cd = dfm.df_stencil_apply(
                                    J_cd32, J_cdlo, ops, zcd_df
                                )
                                rcd32 = dfm.df_sub(
                                    dfm.df_add(wcd_df, dfm.df_mul(dt_df, c_cd)),
                                    a_cd,
                                ).hi * m32
                            eT, ecl, ecd, info3 = triple_solve_pallas(
                                J_T32, J_cl32, J_cd32, C_clT32, C_cdT32, d32,
                                rT32, rcl32, rcd32,
                                inv_T32, inv_cl32, inv_cd32, m32, dt,
                                tol=MIXED_INNER_TOL,
                                iters=self.krylov_unroll,
                                interpret=interp,
                            )
                            zT_df = dfm.df_add_f32(zT_df, eT * m32)
                            zcl_df = dfm.df_add_f32(zcl_df, ecl * m32)
                            zcd_df = dfm.df_add_f32(zcd_df, ecd * m32)
                            iters3 = iters3 + info3["iters"]
                        zT = dfm.df_to(zT_df, wT.dtype) * mask
                        zcl = dfm.df_to(zcl_df, wT.dtype) * mask
                        zcd = dfm.df_to(zcd_df, wT.dtype) * mask
                    else:
                        zT = jnp.zeros_like(wT)
                        zcl = jnp.zeros_like(wcl)
                        zcd = jnp.zeros_like(wcd)
                        for k in range(self.mixed_refine + 1):
                            if k == 0:
                                rT, rcl, rcd = wT, wcl, wcd
                            else:
                                rT = wT - J_T.apply(ops, zT)
                                rcl = (
                                    wcl + dt * C_clT.apply(ops, zT)
                                    - J_cl.apply(ops, zcl)
                                )
                                rcd = (
                                    wcd
                                    + dt * (C_cdT.apply(ops, zT) + d_cdcl * zcl)
                                    - J_cd.apply(ops, zcd)
                                )
                            eT, ecl, ecd, info3 = triple_solve_pallas(
                                J_T32, J_cl32, J_cd32, C_clT32, C_cdT32, d32,
                                (rT * mask).astype(f32),
                                (rcl * mask).astype(f32),
                                (rcd * mask).astype(f32),
                                inv_T32, inv_cl32, inv_cd32, m32, dt,
                                tol=MIXED_INNER_TOL,
                                iters=self.krylov_unroll,
                                interpret=interp,
                            )
                            zT = zT + eT.astype(wT.dtype) * mask
                            zcl = zcl + ecl.astype(wT.dtype) * mask
                            zcd = zcd + ecd.astype(wT.dtype) * mask
                            iters3 = iters3 + info3["iters"]
                    if self.mixed_final_check:
                        # Final f64 block residuals -> per-system verdicts
                        # with the same rhs-cancellation noise floor as the
                        # per-system mixed path (solve_assembled docstring).
                        tol = self.krylov_tol
                        def verdict(r, b, extra_iters, noise):
                            rsq = dot(r * mask, r * mask)
                            return {
                                "iters": extra_iters,
                                "resnorm_sq": rsq,
                                "converged": rsq
                                <= jnp.maximum(tol * tol * dot(b, b), noise),
                            }
                        bcl_eff = wcl + dt * C_clT.apply(ops, zT)
                        bcd_eff = wcd + dt * (
                            C_cdT.apply(ops, zT) + d_cdcl * zcl
                        )
                        info_T = verdict(
                            wT - J_T.apply(ops, zT), wT, iters3[0], noise_T
                        )
                        info_cl = verdict(
                            bcl_eff - J_cl.apply(ops, zcl), bcl_eff,
                            iters3[1], noise_cl,
                        )
                        info_cd = verdict(
                            bcd_eff - J_cd.apply(ops, zcd), bcd_eff,
                            iters3[2], noise_cd,
                        )
                    else:
                        # proxy verdicts from the last fused kernel pass
                        # (see the mixed_final_check docstring)
                        def proxy(k, extra_iters):
                            return {
                                "iters": extra_iters,
                                "resnorm_sq": info3["resnorm_sq"][k].astype(
                                    wT.dtype
                                ),
                                "converged": info3["converged"][k],
                            }
                        info_T = proxy(0, iters3[0])
                        info_cl = proxy(1, iters3[1])
                        info_cd = proxy(2, iters3[2])
                    dT, dcl, dcd = zT, zcl, zcd
                T1 = s.T * mask + dT  # boundary re-zeroed, as in the reference
                cl1 = s.cl + dcl  # boundary kept
                cd1 = s.cd + dcd
                return self._sweep_tail(
                    g, ops, s, t1, dt, Y, T1, cl1, cd1,
                    info_T, info_cl, info_cd,
                )

        # --- T (reference newton_step_T, src/prob1base.py:2998-3045) ---
        if analytic:
            # FT is linear in T: closed-form planes + direct primal eval.
            fT0 = field.FT(g, ops, s, t1)
            J_T = self._newton_planes(g, ops, field.stencil_dFT_dT(g, ops, s), dt)
            rhs_T = YT0 - (2.0 * s.T - dt * fT0)
            dT, info_T = solve_assembled(J_T, rhs_T, noise_T)
        else:
            fT0, linT = jax.linearize(
                lambda T: field.FT(g, ops, s._replace(T=T), t1), s.T
            )
            mv_T = lambda w: (2.0 * (w * mask) - dt * linT(w * mask)) * mask
            rhs_T = YT0 - (2.0 * s.T - dt * fT0)
            dT, info_T = inner_solve(mv_T, rhs_T, noise_T)
        T1 = s.T * mask + dT  # boundary re-zeroed, as in the reference

        # --- cl (reference newton_step_cl, src/prob1base.py:3047-3080) ---
        wT = (T1 - s.T) * mask
        if analytic:
            if self.coupling_source == "analytic":
                # primal only; the T-coupling is a closed-form plane apply
                fcl0 = field.Fcl(g, ops, s, t1)
                jvp_cl_T = field.stencil_dFcl_dT(g, ops, s).apply(ops, wT)
            else:
                # primal + the T-coupling JVP in one jvp pass
                fcl0, jvp_cl_T = jax.jvp(
                    lambda T: field.Fcl(g, ops, s._replace(T=T), t1), (s.T,), (wT,)
                )
            J_cl = self._newton_planes(g, ops, field.stencil_dFcl_dcl(g, ops, s), dt)
            rhs_cl = Ycl0 - 2.0 * s.cl + dt * fcl0 + dt * jvp_cl_T
            dcl, info_cl = solve_assembled(J_cl, rhs_cl, noise_cl)
        else:
            fcl0, lincl = jax.linearize(
                lambda T, cl: field.Fcl(g, ops, s._replace(T=T, cl=cl), t1), s.T, s.cl
            )
            zT = jnp.zeros_like(s.T)
            mv_cl = lambda w: (2.0 * (w * mask) - dt * lincl(zT, w * mask)) * mask
            rhs_cl = Ycl0 - 2.0 * s.cl + dt * fcl0 + dt * lincl(wT, jnp.zeros_like(s.cl))
            dcl, info_cl = inner_solve(mv_cl, rhs_cl, noise_cl)
        cl1 = s.cl + dcl  # boundary kept, as in the reference

        # --- cd (reference newton_step_cd, src/prob1base.py:3082-3115) ---
        wcl = (cl1 - s.cl) * mask
        if analytic:
            if self.coupling_source == "analytic":
                fcd0 = field.Fcd(g, ops, s, t1)
                jvp_cd_Tcl = field.stencil_dFcd_dT(g, ops, s).apply(
                    ops, wT
                ) + field.diag_dFcd_dcl(g, s) * wcl
            else:
                fcd0, jvp_cd_Tcl = jax.jvp(
                    lambda T, cl: field.Fcd(g, ops, s._replace(T=T, cl=cl), t1),
                    (s.T, s.cl),
                    (wT, wcl),
                )
            J_cd = self._newton_planes(g, ops, field.stencil_dFcd_dcd(g, ops, s), dt)
            rhs_cd = Ycd0 - 2.0 * s.cd + dt * fcd0 + dt * jvp_cd_Tcl
            dcd, info_cd = solve_assembled(J_cd, rhs_cd, noise_cd)
        else:
            lincd_in = jax.linearize(
                lambda T, cl, cd: field.Fcd(g, ops, s._replace(T=T, cl=cl, cd=cd), t1),
                s.T,
                s.cl,
                s.cd,
            )
            fcd0, lincd = lincd_in
            zT = jnp.zeros_like(s.T)
            zcl = jnp.zeros_like(s.cl)
            mv_cd = lambda w: (2.0 * (w * mask) - dt * lincd(zT, zcl, w * mask)) * mask
            rhs_cd = (
                Ycd0
                - 2.0 * s.cd
                + dt * fcd0
                + dt * lincd(wT, wcl, jnp.zeros_like(s.cd))
            )
            dcd, info_cd = inner_solve(mv_cd, rhs_cd, noise_cd)
        cd1 = s.cd + dcd

        return self._sweep_tail(
            g, ops, s, t1, dt, Y, T1, cl1, cd1, info_T, info_cl, info_cd
        )

    def _sweep_tail(self, g, ops, s, t1, dt, Y, T1, cl1, cd1, info_T, info_cl, info_cd):
        """Residual tracking + diagnostics packaging shared by the
        per-variable and fused-triple sweep paths."""
        field = self.semi_discrete_field
        YT0, Ycl0, Ycd0 = Y
        if self.track_residuals:
            s_T = s._replace(T=T1)
            res_T = 2.0 * T1 - dt * field.FT(g, ops, s_T, t1) - YT0
            s_cl = s._replace(T=T1, cl=cl1)
            res_cl = 2.0 * cl1 - dt * field.Fcl(g, ops, s_cl, t1) - Ycl0
            s_cd = s._replace(T=T1, cl=cl1, cd=cd1)
            res_cd = 2.0 * cd1 - dt * field.Fcd(g, ops, s_cd, t1) - Ycd0
        else:
            res_T = res_cl = res_cd = jnp.zeros_like(s.T)

        resnorm = jnp.maximum(
            jnp.maximum(info_T["resnorm_sq"], info_cl["resnorm_sq"]),
            info_cd["resnorm_sq"],
        )
        iters = info_T["iters"] + info_cl["iters"] + info_cd["iters"]
        converged = info_T["converged"] & info_cl["converged"] & info_cd["converged"]
        return T1, cl1, cd1, (res_T, res_cl, res_cd), iters, resnorm, converged

    # ------------------------------------------------------------------
    # precision="df": the f32-state double-float step (round 5)
    #
    # The round-4 byte audit (studies/results/mixed_byte_audit.json) showed
    # the mixed step's floor is NOT the solver: the zero-refinement program
    # is already 1041 MB/step of emulated-f64 field/rhs/corrector pipeline
    # vs 173 MB for the same step in pure f32.  This mode removes the
    # emulated-f64 pipeline entirely: the state is carried as double-float
    # (two-f32 EFT pairs, ops/doublefloat.py), every field evaluation,
    # Jacobian-plane assembly, rhs near-cancellation (Y − 2s + dt·F) and
    # corrector runs in native-f32 DF arithmetic through the jaxpr lift
    # (ops/df_lift.py — including native DF exp/logistic for the hot
    # Dl/Dd/H_η coefficients), and the Newton solves reuse the mixed-mode
    # iterative refinement with DF residuals.  Accuracy: ~2^-48 relative per
    # operation (vs emulated f64's 2^-53); the parity impact is gated by
    # tests/test_df_mode.py and the bench error guard.  Algorithm preserved
    # exactly: reference src/prob1base.py:3117-3149 (step), :2953-2996
    # (predictors/correctors) — same sweeps, same boundary semantics.
    # ------------------------------------------------------------------
    def _df_refine_solve(self, ops, J_df, b_df, mask32):
        """Iterative refinement with DF planes/rhs in and DF solution out —
        the df-mode analogue of ``solve_assembled_mixed``: zero emulated-f64
        work anywhere in the loop (the mixed mode's per-solve split of f64
        planes is gone because the sources are born as DF pairs)."""
        from na_dd_tpu.ops import doublefloat as dfm

        J32 = type(J_df)(*(p.hi for p in J_df))
        Jlo = type(J_df)(*(p.lo for p in J_df))
        inv32 = jnp.where(
            mask32 > 0, 1.0 / jnp.where(J32.c0 == 0, 1.0, J32.c0), 0.0
        )
        b_df = dfm.df_mask(b_df, mask32)
        x = dfm.df_zeros_like(b_df.hi)
        total_iters = jnp.asarray(0)
        info = None
        for k in range(self.mixed_refine + 1):
            if k == 0:
                r32 = b_df.hi
            else:
                a = dfm.df_stencil_apply(J32, Jlo, ops, x)
                r32 = dfm.df_sub(b_df, a).hi * mask32
            e32, info = self._inner_f32_solve(ops, J32, r32, inv32, mask32)
            x = dfm.df_add_f32(x, e32 * mask32)
            total_iters = total_iters + info["iters"]
        if self.mixed_final_check:
            r_df = dfm.df_sub(
                b_df, dfm.df_stencil_apply(J32, Jlo, ops, x)
            )
            f64 = jnp.float64
            r = dfm.df_to(dfm.df_mask(r_df, mask32), f64)
            b = dfm.df_to(b_df, f64)
            rsq = ops.asum(r * r)
            tol = self.krylov_tol
            # rhs noise floor at the DF unit roundoff (see solve_assembled)
            eps_b = 10.0 * 2.0 ** -48
            noise = eps_b * eps_b * ops.asum(b * b)
            return x, {
                "iters": total_iters,
                "resnorm_sq": rsq,
                "converged": rsq <= jnp.maximum(tol * tol * ops.asum(b * b), noise),
            }
        return x, {
            "iters": total_iters,
            "resnorm_sq": info["resnorm_sq"],
            "converged": info["converged"],
        }

    def _newton_sweep_df(self, g, ops, s: State, t1, dt, Y):
        """DF twin of :meth:`_newton_sweep` (analytic sources only): one
        lifted evaluation produces the three primal fields, the three Newton
        self-planes, both cross-coupling planes and the rhs combinations —
        all as DF pairs — then the triangular solves run the mixed-mode
        refinement on them.  ``s``/``Y`` are DF; returns DF iterates."""
        from na_dd_tpu.ops import doublefloat as dfm
        from na_dd_tpu.ops.df_lift import df_call_df

        field = self.semi_discrete_field
        mask = g.interior_mask
        YT0, Ycl0, Ycd0 = Y
        f32 = jnp.float32
        mask32 = mask.astype(f32)

        def sources(s_, t1_, dt_, YT_, Ycl_, Ycd_):
            fT0 = field.FT(g, ops, s_, t1_)
            fcl0 = field.Fcl(g, ops, s_, t1_)
            fcd0 = field.Fcd(g, ops, s_, t1_)
            J_T = self._newton_planes(g, ops, field.stencil_dFT_dT(g, ops, s_), dt_)
            J_cl = self._newton_planes(g, ops, field.stencil_dFcl_dcl(g, ops, s_), dt_)
            J_cd = self._newton_planes(g, ops, field.stencil_dFcd_dcd(g, ops, s_), dt_)
            C_clT = field.stencil_dFcl_dT(g, ops, s_)
            C_cdT = field.stencil_dFcd_dT(g, ops, s_)
            d_cdcl = field.diag_dFcd_dcl(g, s_)
            rhs_T = (YT_ - (2.0 * s_.T - dt_ * fT0)) * mask
            base_cl = (Ycl_ - 2.0 * s_.cl + dt_ * fcl0) * mask
            base_cd = (Ycd_ - 2.0 * s_.cd + dt_ * fcd0) * mask
            return rhs_T, base_cl, base_cd, J_T, J_cl, J_cd, C_clT, C_cdT, d_cdcl

        wT, wcl, wcd, J_T, J_cl, J_cd, C_clT, C_cdT, d_cdcl = df_call_df(
            sources, s, t1, dt, YT0, Ycl0, Ycd0
        )
        dt_df = dfm.df_split(jnp.asarray(dt, jnp.float64))

        st_hi = lambda st: type(st)(*(p.hi for p in st))  # noqa: E731
        st_lo = lambda st: type(st)(*(p.lo for p in st))  # noqa: E731

        use_fused = (
            self.fused_triple
            and self.linear_solver == "krylov"
            and self.stencil_backend == "pallas"
            and ops is LOCAL_OPS
            and self.krylov_unroll is not None
            and not self.krylov_scanned
        )
        if use_fused:
            from na_dd_tpu.ops.pallas_kernels import (
                triple_solve_fits,
                triple_solve_pallas,
            )

            use_fused = triple_solve_fits(s.T.hi.shape, f32)
        if use_fused:
            # whole-sweep block-triangular refinement around the fused f32
            # triple kernel — structurally identical to the mixed_df branch
            # of _newton_sweep, but every source is already a DF pair
            interp = jax.default_backend() == "cpu"
            J_T32, J_Tlo = st_hi(J_T), st_lo(J_T)
            J_cl32, J_cllo = st_hi(J_cl), st_lo(J_cl)
            J_cd32, J_cdlo = st_hi(J_cd), st_lo(J_cd)
            C_clT32, C_clTlo = st_hi(C_clT), st_lo(C_clT)
            C_cdT32, C_cdTlo = st_hi(C_cdT), st_lo(C_cdT)
            d32 = d_cdcl.hi
            inv = lambda st32: jnp.where(  # noqa: E731
                mask32 > 0, 1.0 / jnp.where(st32.c0 == 0, 1.0, st32.c0), 0.0
            )
            inv_T32, inv_cl32, inv_cd32 = inv(J_T32), inv(J_cl32), inv(J_cd32)
            zT = dfm.df_zeros_like(wT.hi)
            zcl = dfm.df_zeros_like(wcl.hi)
            zcd = dfm.df_zeros_like(wcd.hi)
            iters3 = jnp.zeros((3,), dtype=jnp.int32)
            for k in range(self.mixed_refine + 1):
                if k == 0:
                    rT32, rcl32, rcd32 = wT.hi, wcl.hi, wcd.hi
                else:
                    aT = dfm.df_stencil_apply(J_T32, J_Tlo, ops, zT)
                    rT32 = dfm.df_sub(wT, aT).hi * mask32
                    c_cl = dfm.df_stencil_apply(C_clT32, C_clTlo, ops, zT)
                    a_cl = dfm.df_stencil_apply(J_cl32, J_cllo, ops, zcl)
                    rcl32 = dfm.df_sub(
                        dfm.df_add(wcl, dfm.df_mul(dt_df, c_cl)), a_cl
                    ).hi * mask32
                    c_cd = dfm.df_add(
                        dfm.df_stencil_apply(C_cdT32, C_cdTlo, ops, zT),
                        dfm.df_mul(d_cdcl, zcl),
                    )
                    a_cd = dfm.df_stencil_apply(J_cd32, J_cdlo, ops, zcd)
                    rcd32 = dfm.df_sub(
                        dfm.df_add(wcd, dfm.df_mul(dt_df, c_cd)), a_cd
                    ).hi * mask32
                eT, ecl, ecd, info3 = triple_solve_pallas(
                    J_T32, J_cl32, J_cd32, C_clT32, C_cdT32, d32,
                    rT32, rcl32, rcd32,
                    inv_T32, inv_cl32, inv_cd32, mask32, dt,
                    tol=MIXED_INNER_TOL,
                    iters=self.krylov_unroll,
                    interpret=interp,
                )
                zT = dfm.df_add_f32(zT, eT * mask32)
                zcl = dfm.df_add_f32(zcl, ecl * mask32)
                zcd = dfm.df_add_f32(zcd, ecd * mask32)
                iters3 = iters3 + info3["iters"]

            def proxy(k, extra_iters):
                return {
                    "iters": extra_iters,
                    "resnorm_sq": info3["resnorm_sq"][k].astype(jnp.float64),
                    "converged": info3["converged"][k],
                }

            info_T, info_cl, info_cd = (
                proxy(0, iters3[0]), proxy(1, iters3[1]), proxy(2, iters3[2]),
            )
            if self.mixed_final_check:
                # honest verdicts from the DF block residuals, reconstructed
                # to f64 only for the scalar dots
                f64 = jnp.float64
                tol = self.krylov_tol
                eps_b = 10.0 * 2.0 ** -48

                def verdict(r_df, b_df, extra_iters):
                    r = dfm.df_to(dfm.df_mask(r_df, mask32), f64)
                    b = dfm.df_to(b_df, f64)
                    rsq = ops.asum(r * r)
                    bsq = ops.asum(b * b)
                    return {
                        "iters": extra_iters,
                        "resnorm_sq": rsq,
                        "converged": rsq
                        <= jnp.maximum(tol * tol * bsq, eps_b * eps_b * bsq),
                    }

                bcl_eff = dfm.df_add(
                    wcl,
                    dfm.df_mul(
                        dt_df, dfm.df_stencil_apply(C_clT32, C_clTlo, ops, zT)
                    ),
                )
                bcd_eff = dfm.df_add(
                    wcd,
                    dfm.df_mul(
                        dt_df,
                        dfm.df_add(
                            dfm.df_stencil_apply(C_cdT32, C_cdTlo, ops, zT),
                            dfm.df_mul(d_cdcl, zcl),
                        ),
                    ),
                )
                info_T = verdict(
                    dfm.df_sub(wT, dfm.df_stencil_apply(J_T32, J_Tlo, ops, zT)),
                    wT, iters3[0],
                )
                info_cl = verdict(
                    dfm.df_sub(
                        bcl_eff, dfm.df_stencil_apply(J_cl32, J_cllo, ops, zcl)
                    ),
                    bcl_eff, iters3[1],
                )
                info_cd = verdict(
                    dfm.df_sub(
                        bcd_eff, dfm.df_stencil_apply(J_cd32, J_cdlo, ops, zcd)
                    ),
                    bcd_eff, iters3[2],
                )
        else:
            # per-system triangular sweep: refinement solve for T, then the
            # cross-couplings applied (in DF) to the rhs of cl and cd —
            # mirrors the analytic/coupling_source="analytic" f64 path
            zT, info_T = self._df_refine_solve(ops, J_T, wT, mask32)
            c_cl = dfm.df_stencil_apply(st_hi(C_clT), st_lo(C_clT), ops, zT)
            b_cl = dfm.df_add(wcl, dfm.df_mask(dfm.df_mul(dt_df, c_cl), mask32))
            zcl, info_cl = self._df_refine_solve(ops, J_cl, b_cl, mask32)
            c_cd = dfm.df_add(
                dfm.df_stencil_apply(st_hi(C_cdT), st_lo(C_cdT), ops, zT),
                dfm.df_mul(d_cdcl, zcl),
            )
            b_cd = dfm.df_add(wcd, dfm.df_mask(dfm.df_mul(dt_df, c_cd), mask32))
            zcd, info_cd = self._df_refine_solve(ops, J_cd, b_cd, mask32)

        T1 = dfm.df_add(dfm.df_mask(s.T, mask32), zT)  # boundary re-zeroed
        cl1 = dfm.df_add(s.cl, zcl)  # boundary kept, as in the reference
        cd1 = dfm.df_add(s.cd, zcd)

        if self.track_residuals:
            def resid(s_, T1_, cl1_, cd1_, t1_, dt_, YT_, Ycl_, Ycd_):
                s_T = s_._replace(T=T1_)
                res_T = 2.0 * T1_ - dt_ * field.FT(g, ops, s_T, t1_) - YT_
                s_cl = s_._replace(T=T1_, cl=cl1_)
                res_cl = 2.0 * cl1_ - dt_ * field.Fcl(g, ops, s_cl, t1_) - Ycl_
                s_cd = s_._replace(T=T1_, cl=cl1_, cd=cd1_)
                res_cd = 2.0 * cd1_ - dt_ * field.Fcd(g, ops, s_cd, t1_) - Ycd_
                return res_T, res_cl, res_cd

            res = df_call_df(
                resid, s, T1, cl1, cd1, t1, dt, YT0, Ycl0, Ycd0, out="f64"
            )
        else:
            res = (jnp.zeros(s.T.hi.shape, jnp.float64),) * 3

        resnorm = jnp.maximum(
            jnp.maximum(
                jnp.asarray(info_T["resnorm_sq"], jnp.float64),
                jnp.asarray(info_cl["resnorm_sq"], jnp.float64),
            ),
            jnp.asarray(info_cd["resnorm_sq"], jnp.float64),
        )
        iters = info_T["iters"] + info_cl["iters"] + info_cd["iters"]
        converged = info_T["converged"] & info_cl["converged"] & info_cd["converged"]
        return T1, cl1, cd1, res, iters, resnorm, converged

    def _step_fn_df(self, g: Grid, ops: Ops, at_t0: State, t0, dt):
        """The df-mode step: DF state in/out internally, f64 State at the
        API boundary (one exact split per field on entry, one exact hi+lo
        reconstruction on exit — DF↔f64 round-trips are lossless)."""
        from na_dd_tpu.ops import doublefloat as dfm
        from na_dd_tpu.ops.df_lift import df_call_df

        if jnp.finfo(jnp.result_type(float)).bits < 64:
            raise ValueError(
                "precision='df' requires x64 mode (the DF pairs are split "
                "from / reconstructed to f64 at the step boundary)"
            )
        field = self.semi_discrete_field
        t1 = t0 + dt
        s0 = State(*(dfm.df_split(jnp.asarray(x)) for x in at_t0))

        def y_and_preds(s_, t0_, dt_):
            YT0 = dt_ * field.FT(g, ops, s_, t0_) + 2.0 * s_.T
            Ycl0 = dt_ * field.Fcl(g, ops, s_, t0_) + 2.0 * s_.cl
            Ycd0 = dt_ * field.Fcd(g, ops, s_, t0_) + 2.0 * s_.cd
            cp1 = self.initial_cp_pred(g, ops, s_, t0_, dt=dt_)
            cs1 = self.initial_cs_pred(g, ops, s_, t0_, dt=dt_)
            return YT0, Ycl0, Ycd0, cp1, cs1

        YT0, Ycl0, Ycd0, cp1, cs1 = df_call_df(y_and_preds, s0, t0, dt)
        Y = (YT0, Ycl0, Ycd0)
        T1, cl1, cd1 = s0.T, s0.cl, s0.cd

        ftype = at_t0.T.dtype
        res = (jnp.zeros(at_t0.T.shape, ftype),) * 3
        total_iters = jnp.asarray(0)
        worst_resnorm = jnp.asarray(0.0, dtype=ftype)
        all_converged = jnp.asarray(True)
        hcs_ok = jnp.asarray(True)

        for _pc in range(self.num_pc_steps):
            # plain Python loop over Newton sweeps (production runs 1; the
            # scan-over-sweeps compile optimization of the f64 path is not
            # worth carrying DF pytrees through scan here)
            for _n in range(self.num_newton_steps):
                s_df = State(cp=cp1, T=T1, cl=cl1, cd=cd1, cs=cs1)
                T1, cl1, cd1, res, iters, resnorm, converged = (
                    self._newton_sweep_df(g, ops, s_df, t1, dt, Y)
                )
                total_iters = total_iters + iters
                worst_resnorm = jnp.maximum(
                    worst_resnorm, resnorm.astype(ftype)
                )
                all_converged = jnp.logical_and(all_converged, converged)

            def correctors(T1_, cl1_, cd1_, s0_, t0_, dt_):
                cp_n = self.corrector_cp_step(
                    g, ops, T1_, cl1_, cd1_, at_t0=s0_, t0=t0_, dt=dt_
                )
                cs_n, ok = self.corrector_cs_step(
                    g, ops, T1_, cl1_, cd1_, at_t0=s0_, t0=t0_, dt=dt_
                )
                return cp_n, cs_n, ok

            cp1, cs1, ok = df_call_df(correctors, T1, cl1, cd1, s0, t0, dt)
            hcs_ok = jnp.logical_and(hcs_ok, ok)

        out = State(cp=cp1, T=T1, cl=cl1, cd=cd1, cs=cs1)
        new_state = State(*(dfm.df_to(x, ftype) for x in out))
        diag = StepDiagnostics(
            residual_T=res[0],
            residual_cl=res[1],
            residual_cd=res[2],
            krylov_iters=total_iters,
            krylov_resnorm_sq=worst_resnorm,
            krylov_converged=all_converged,
            hcs_denominator_ok=hcs_ok,
        )
        return new_state, diag

    # ------------------------------------------------------------------
    # Full step (reference step, src/prob1base.py:3117-3149)
    # ------------------------------------------------------------------
    def step_fn(self, g: Grid, ops: Ops, at_t0: State, t0, dt):
        if self.precision == "df":
            return self._step_fn_df(g, ops, at_t0, t0, dt)
        field = self.semi_discrete_field
        t1 = t0 + dt

        YT0 = dt * field.FT(g, ops, at_t0, t0) + 2.0 * at_t0.T
        Ycl0 = dt * field.Fcl(g, ops, at_t0, t0) + 2.0 * at_t0.cl
        Ycd0 = dt * field.Fcd(g, ops, at_t0, t0) + 2.0 * at_t0.cd
        Y = (YT0, Ycl0, Ycd0)

        red, black = linsolve.checkerboard_masks(g)

        cp1 = self.initial_cp_pred(g, ops, at_t0, t0, dt=dt)
        cs1 = self.initial_cs_pred(g, ops, at_t0, t0, dt=dt)
        T1, cl1, cd1 = at_t0.T, at_t0.cl, at_t0.cd

        res = (jnp.zeros_like(T1),) * 3
        total_iters = jnp.asarray(0)
        worst_resnorm = jnp.asarray(0.0, dtype=T1.dtype)
        all_converged = jnp.asarray(True)
        hcs_ok = jnp.asarray(True)

        def one_sweep(cp_k, cs_k, T_k, cl_k, cd_k, acc):
            it_acc, rn_acc, cv_acc = acc
            s = State(cp=cp_k, T=T_k, cl=cl_k, cd=cd_k, cs=cs_k)
            T_n, cl_n, cd_n, res_n, iters, resnorm, converged = self._newton_sweep(
                g, ops, s, t1, dt, Y, red, black
            )
            acc_n = (
                it_acc + iters,
                jnp.maximum(rn_acc, resnorm),
                jnp.logical_and(cv_acc, converged),
            )
            return T_n, cl_n, cd_n, res_n, acc_n

        for _pc in range(self.num_pc_steps):
            acc = (total_iters, worst_resnorm, all_converged)
            if self.num_newton_steps == 1:
                T1, cl1, cd1, res, acc = one_sweep(cp1, cs1, T1, cl1, cd1, acc)
            else:
                # scan over identical Newton sweeps: the sweep body (three
                # linearize+probe+Krylov solves) is traced/compiled ONCE
                # instead of num_newton_steps times — 3-5x faster compiles
                # for multi-sweep configurations, bit-identical results
                # (the loop is a plain fixed-trip-count iteration).
                def scan_body(carry, _):
                    T_k, cl_k, cd_k, _res_k, acc_k = carry
                    T_n, cl_n, cd_n, res_n, acc_n = one_sweep(cp1, cs1, T_k, cl_k, cd_k, acc_k)
                    return (T_n, cl_n, cd_n, res_n, acc_n), None

                init = (T1, cl1, cd1, res, acc)
                (T1, cl1, cd1, res, acc), _ = jax.lax.scan(
                    scan_body, init, None, length=self.num_newton_steps
                )
            total_iters, worst_resnorm, all_converged = acc
            cp1 = self.corrector_cp_step(g, ops, T1, cl1, cd1, at_t0=at_t0, t0=t0, dt=dt)
            cs1, ok = self.corrector_cs_step(g, ops, T1, cl1, cd1, at_t0=at_t0, t0=t0, dt=dt)
            hcs_ok = jnp.logical_and(hcs_ok, ok)

        new_state = State(cp=cp1, T=T1, cl=cl1, cd=cd1, cs=cs1)
        diag = StepDiagnostics(
            residual_T=res[0],
            residual_cl=res[1],
            residual_cd=res[2],
            krylov_iters=total_iters,
            krylov_resnorm_sq=worst_resnorm,
            krylov_converged=all_converged,
            hcs_denominator_ok=hcs_ok,
        )
        return new_state, diag

    def step(self, at_t0: State, *, t0, dt) -> State:
        """Eager single-step API mirroring the reference integrator, including
        ``last_residual`` bookkeeping and the HCs positivity ValueError."""
        new_state, diag = self._jit_step(self._grid, self._local_ops, at_t0, t0, dt)
        self.last_residual = {
            "T": diag.residual_T,
            "cl": diag.residual_cl,
            "cd": diag.residual_cd,
        }
        if not bool(diag.hcs_denominator_ok):
            raise HCsCorrectorPositivityError(
                "Denominator 2 - dt Kd (Sd - Cd1) (1 + Cl1) below positiveness threshold."
            )
        return new_state


class PCTrapezoidalCsTriple(PCTrapezoidalBase):
    """cs handled linearly: Heun predictor + closed-form trapezoidal corrector
    (reference src/prob1base.py:3152-3219)."""

    def initial_cs_pred(self, g, ops, at_t, t, *, dt):
        return self._heun_cs(g, ops, at_t, t, dt=dt)

    def corrector_cs_step(self, g, ops, _T1, cl1, cd1, *, at_t0, t0, dt):
        m = self._model
        fcs = self.semi_discrete_field.forcing.fcs
        t1 = t0 + dt
        src0 = fcs(g, ops, t0)
        src1 = fcs(g, ops, t1)
        alpha0 = -m.Kd * (m.Sd - at_t0.cd) * (1.0 + at_t0.cl)
        alpha1 = -m.Kd * (m.Sd - cd1) * (1.0 + cl1)
        num = (1.0 + 0.5 * dt * alpha0) * at_t0.cs + 0.5 * dt * (src0 + src1)
        den = 1.0 - 0.5 * dt * alpha1
        return g.interior_mask * num / den, jnp.asarray(True)


class PCTrapezoidalHCsTriple(PCTrapezoidalBase):
    """Sharp-Heaviside cs corrector: exact sign-based solve of
    2x - dt R1 H(x) = Y0 with R1 = Kd (Sd - cd1)(1 + cl1); valid only while
    2 - dt R1 stays positive (reference src/prob1base.py:3336-3430)."""

    def initial_cs_pred(self, g, ops, at_t, t, *, dt):
        return self._heun_cs(g, ops, at_t, t, dt=dt) * g.interior_mask

    def corrector_cs_step(self, g, ops, _T1, cl1, cd1, *, at_t0, t0, dt):
        m = self._model
        field = self.semi_discrete_field
        t1 = t0 + dt
        fcs1 = field.forcing.fcs(g, ops, t1)

        R1 = (m.Sd - cd1) * (1.0 + cl1) * m.Kd
        del_Y1 = 2.0 - dt * R1
        # all(del_Y1 >= thr) expressed through the ops reduction so the flag
        # is the GLOBAL verdict under shard_map (a local jnp.all would be
        # per-shard, silently missing a positivity failure on another shard).
        # stop_gradient: a boolean control verdict (pmax has no JVP rule, and
        # a failure flag must not carry cotangents).
        ok = ops.amax(jax.lax.stop_gradient(-del_Y1)) <= -_ESSENTIALLY_ZERO

        Y0 = 2.0 * at_t0.cs + dt * field.Fcs(g, ops, at_t0, t0) + dt * fcs1
        cs1 = jnp.where(
            Y0 > _ESSENTIALLY_ZERO,
            Y0 / del_Y1,
            jnp.where(Y0 < -_ESSENTIALLY_ZERO, Y0 / 2.0, 0.0),
        )
        return cs1 * g.interior_mask, ok


class PCTrapezoidalRegHCsTriple(PCTrapezoidalBase):
    """Regularized-Heaviside cs corrector: pointwise scalar Newton on
    2x + (2x - y) e^{-eta x} = y - a (reference src/prob1base.py:3596-3703).
    The paper's headline integrator."""

    def __init__(
        self,
        semi_discrete_field,
        *,
        num_pc_steps: int = 1,
        num_newton_steps: int = 1,
        regularization_factor: float,
        num_newton_iterations: int = 5,
        consec_xs_rtol: float = 1e-6,
        **kwargs,
    ):
        super().__init__(
            semi_discrete_field,
            num_pc_steps=num_pc_steps,
            num_newton_steps=num_newton_steps,
            **kwargs,
        )
        # May be a Python float or a traced scalar (vmapped eta studies).
        self._regularization_factor = regularization_factor
        self._num_newton_iterations = int(num_newton_iterations)
        self._consec_xs_rtol = float(consec_xs_rtol)
        if self.differentiable and self._num_newton_iterations > 16:
            raise ValueError(
                "differentiable=True needs the unrolled pointwise-Newton cs "
                "corrector (num_newton_iterations <= 16); the while_loop form "
                "used for larger budgets is not reverse-mode differentiable"
            )

    def initial_cs_pred(self, g, ops, at_t, t, *, dt):
        return self._heun_cs(g, ops, at_t, t, dt=dt) * g.interior_mask

    @staticmethod
    def _predictor_equation(x, y, a, eta):
        return 2.0 * x + (2.0 * x - y) * jnp.exp(-eta * x) - y + a

    @staticmethod
    def _predictor_jacobian(x, y, a, eta):
        e = jnp.exp(-eta * x)
        return 2.0 + 2.0 * e - eta * (2.0 * x - y) * e

    @staticmethod
    def _newton_delta(x, y, a, eta):
        """dx = -f/J for f = 2x + (2x-y)e^{-ηx} - y + a, overflow-free.

        For ηx >= -300 this is the plain form (bit-identical to the
        reference's iteration).  For ηx < -300 (reachable with violently
        decaying cs, e.g. the StiffExpDecay/Peaks-Fast1e8 stress cases, where
        e^{-ηx} would overflow to inf and poison the state with NaNs) both f
        and J are multiplied by e^{ηx} analytically — the ratio is unchanged
        but every intermediate stays finite.  Double-where keeps the inactive
        branch NaN-free under jit/vmap."""
        big = eta * x < -300.0
        x_o = jnp.where(big, 0.0, x)
        e = jnp.exp(-eta * x_o)
        f_o = 2.0 * x_o + (2.0 * x_o - y) * e - y + a
        J_o = 2.0 + 2.0 * e - eta * (2.0 * x_o - y) * e
        x_s = jnp.where(big, x, 0.0)
        ep = jnp.exp(eta * x_s)  # <= e^{-300} in the active branch
        f_s = (2.0 * x_s - y + a) * ep + (2.0 * x_s - y)
        J_s = 2.0 * ep + 2.0 - eta * (2.0 * x_s - y)
        f = jnp.where(big, f_s, f_o)
        J = jnp.where(big, J_s, J_o)
        return -f / J

    def _newton_iterations(self, ops, y, a, eta, x0):
        """Vectorized pointwise Newton with the reference's early-exit rule
        (max|dx| below rtol·|x| everywhere; src/prob1base.py:3654-3663).

        Unrolled straight-line when the iteration budget is small (default 5):
        the early exit becomes a `done` mask, which is bit-identical to
        breaking out of the loop and avoids while_loop latency on TPU.  Large
        budgets (tests use up to 1000) keep the while_loop."""
        rtol = self._consec_xs_rtol
        n = self._num_newton_iterations

        def newton_update(x):
            dx = self._newton_delta(x, y, a, eta)
            x_new = x + dx
            # all_ij(max|dx| < rtol·|x_ij|) ⇔ amax|dx| < rtol·min|x| — same
            # decision bit-for-bit (multiplication by rtol>0 is monotone),
            # but phrased as ops reductions so the early exit is GLOBALLY
            # agreed under shard_map (a per-shard jnp.all would let shards
            # freeze at different iterations)
            # stop_gradient: the early-exit decision is control flow (its
            # derivative is zero a.e., and pmax has no differentiation rule
            # under shard_map) — iterates keep full gradients, only the
            # done-mask comparison is detached.
            max_dx = ops.amax(jax.lax.stop_gradient(jnp.abs(dx)))
            min_abs_x = -ops.amax(jax.lax.stop_gradient(-jnp.abs(x_new)))
            done_new = max_dx < rtol * min_abs_x
            return x_new, done_new

        if n <= 16:
            x = x0
            done = jnp.asarray(False)
            for _ in range(n):
                x_new, done_new = newton_update(x)
                x = jnp.where(done, x, x_new)
                done = done | done_new
            return x

        def cond(carry):
            x, k, done = carry
            return jnp.logical_and(k < n, jnp.logical_not(done))

        def body(carry):
            x, k, _ = carry
            x_new, done_new = newton_update(x)
            return (x_new, k + 1, done_new)

        x, _, _ = jax.lax.while_loop(cond, body, (x0, jnp.asarray(0), jnp.asarray(False)))
        return x

    def corrector_cs_step(self, g, ops, _T1, cl1, cd1, *, at_t0, t0, dt):
        m = self._model
        field = self.semi_discrete_field
        eta = self._regularization_factor
        t1 = t0 + dt
        fcs0 = field.forcing.fcs(g, ops, t0)
        fcs1 = field.forcing.fcs(g, ops, t1)
        H0 = heaviside_regularized(at_t0.cs, eta)

        y = (
            2.0 * at_t0.cs
            - dt * m.Kd * (m.Sd - at_t0.cd) * (at_t0.cl + 1.0) * H0
            + dt * (fcs0 + fcs1)
        )
        a = dt * m.Kd * (m.Sd - cd1) * (cl1 + 1.0)
        cs1 = self._newton_iterations(ops, y, a, eta, at_t0.cs)
        return cs1 * g.interior_mask, jnp.asarray(True)
