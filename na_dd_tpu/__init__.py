"""na_dd_tpu — TPU-native framework for the nonlinear temperature-enhanced
diffusion drug-delivery model.

A from-scratch JAX/XLA re-design of the capabilities of the reference code
``phao/NA-nonlinear-temperature-enhanced-diffusion-model-DD`` (serial
NumPy/SciPy/SymPy).  The five-field reaction–diffusion system

    cp (polymer), T (temperature), cl (solvent), cd (dissolved drug),
    cs (solid drug)

is discretized with the same mimetic staggered finite-difference scheme and
predictor–corrector (modified-Euler / trapezoidal + Newton) time integration,
but engineered TPU-first:

* the whole time step — stencils, forcing, Newton, Krylov solves — is a single
  fused XLA program driven by ``lax.scan``;
* Jacobians are matrix-free (``jax.linearize`` of the discrete residual)
  solved with a Jacobi-preconditioned BiCGStab, replacing the reference's
  hand-derived 5-diagonal CSR matrices + SuperLU (`spsolve`);
* every stencil is built from four shift primitives plus a global-sum
  primitive, so the identical physics code runs single-chip or sharded over a
  ``jax.sharding.Mesh`` with `ppermute` halo exchange (see
  :mod:`na_dd_tpu.parallel`).

Layout (mirrors SURVEY.md §2's component inventory):

* :mod:`na_dd_tpu.models`       — physical constants + nonlinear coefficients
* :mod:`na_dd_tpu.ops`          — grid, stencils, inner products, quadrature,
                                  matrix-free linear solvers
* :mod:`na_dd_tpu.core`         — state pytree, semi-discrete fields, forcing
* :mod:`na_dd_tpu.mms`          — SymPy→JAX manufactured-solution engine + case library
* :mod:`na_dd_tpu.integrators`  — forward Euler + PC trapezoidal (3 variants)
* :mod:`na_dd_tpu.harness`      — MMS trials, error norms, convergence rates, studies
* :mod:`na_dd_tpu.parallel`     — mesh/sharding helpers, halo-exchange ops
"""

from na_dd_tpu.config import setup_x64

setup_x64()

__version__ = "0.1.0"
