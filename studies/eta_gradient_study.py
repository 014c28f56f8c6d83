#!/usr/bin/env python
"""Gradient-based regularization study: dObs/deta through the IFT adjoints.

The RegHCs variant replaces the sharp Heaviside dissolution switch with
H_eta(cs) = 1/(1+exp(-eta*cs)).  This study runs the PRODUCTION drug-release
scenario (no forcing; a Gaussian drug blob whose cs tails sit near zero, so
H_eta genuinely varies across the domain — MMS-error functionals are
degenerate here: the always-positive pol case measures dE/deta ~1e-21 and
the zero-crossing case's error is scheme-exact ~1e-19) and differentiates
the dissolved-drug fraction at Tf with respect to eta via the framework's
implicit-function-theorem adjoints (build_simulator -> differentiable=True;
a capability the reference does not have, its solves are SuperLU calls):
eta enters the field reaction, the cs corrector denominator and every
Newton solve.

This archives the gradient-based-study evidence for the adjoint surface
(VERDICT r3 task 6): Obs(eta) and dObs/deta across the standard eta ladder
(10..1000, the reference's regularization sweep range), with central-FD
cross-checks at two ladder points.  Runs on CPU x64 by default (the
parity-certified platform; the adjoint math is device-independent and the
FD agreement is the gate).

    python studies/eta_gradient_study.py            # CPU x64
    python studies/eta_gradient_study.py --tpu      # attached chip
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from na_dd_tpu.config import setup_x64

setup_x64()

import jax.numpy as jnp
import numpy as np

from na_dd_tpu.core.state import State
from na_dd_tpu.harness.gradients import build_simulator
from na_dd_tpu.harness.simulate import dissolved_drug_fraction
from na_dd_tpu.models import default_model_consts
from na_dd_tpu.ops import LOCAL_OPS, make_uniform_grid

N = int(os.environ.get("ETA_GRAD_N", "16"))
DT = 2e-3
NUM_STEPS = 40
#: Kd boosted (vs the physical 1e-8) so the dissolution pathway moves an
#: O(1) amount of mass within the run — same scaling rationale as
#: tests/test_gradients.py
MC = default_model_consts._replace(Kd=1e-2)


def make_loss():
    grid = make_uniform_grid(N, N)
    blob = jnp.exp(
        -60.0 * ((grid.xx - 0.5) ** 2 + (grid.yy - 0.5) ** 2)
    ) * grid.interior_mask
    s0 = State(
        cp=0.5 * blob, T=0.1 * blob, cl=0.2 * blob, cd=0.05 * blob, cs=blob
    )
    sim = build_simulator(
        grid, dt=DT, num_steps=NUM_STEPS, base_consts=MC, krylov_unroll=8
    )

    def loss(eta):
        s_fin = sim({"regularization_factor": eta}, s0)
        return dissolved_drug_fraction(LOCAL_OPS, grid, s_fin)

    return loss


def main():
    loss = make_loss()
    val_grad = jax.jit(jax.value_and_grad(loss))
    loss_j = jax.jit(loss)

    etas = [float(x) for x in np.logspace(1, 3, 7)]
    rows = []
    t0 = time.perf_counter()
    for eta in etas:
        E, dE = val_grad(jnp.asarray(eta))
        rows.append({"eta": eta, "obs": float(E), "dobs_deta": float(dE)})
        print(f"eta={eta:9.2f}  obs={float(E):.8e}  dObs/deta={float(dE):+.6e}",
              flush=True)

    # central-FD cross-checks at two ladder points
    checks = []
    for eta in (etas[2], etas[-1]):
        h = 1e-3 * eta
        fd = (float(loss_j(jnp.asarray(eta + h)))
              - float(loss_j(jnp.asarray(eta - h)))) / (2 * h)
        ad = next(r["dobs_deta"] for r in rows if r["eta"] == eta)
        rel = abs(ad - fd) / max(abs(fd), 1e-300)
        checks.append({"eta": eta, "adjoint": ad, "fd": fd, "rel_dev": rel})
        print(f"[check] eta={eta:.2f} adjoint={ad:+.6e} fd={fd:+.6e} "
              f"rel={rel:.2e}", flush=True)
    ok = all(c["rel_dev"] < 1e-4 for c in checks)
    print("[OK]" if ok else "[ADJOINT/FD MISMATCH]")

    out = {
        "N": N, "dt": DT, "num_steps": NUM_STEPS, "Kd": MC.Kd,
        "scenario": "gaussian-blob drug release (NoForcing)",
        "observable": "dissolved_drug_fraction(Tf)",
        "rows": rows, "fd_checks": checks,
        "backend": jax.default_backend(),
        "wallclock_s": round(time.perf_counter() - t0, 1),
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results",
        "eta_gradient_study.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("archived:", path)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
