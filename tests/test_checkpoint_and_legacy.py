"""Checkpoint/resume and legacy study-runner tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from na_dd_tpu.core import FieldRegHCsTriple, MMSForcingRegHCsTriple, State
from na_dd_tpu.harness.checkpoint import (
    latest_checkpoint,
    load_state,
    run_checkpointed,
    save_state,
)
from na_dd_tpu.harness.legacy import run_convergence_studies
from na_dd_tpu.integrators import ForwardEulerIntegrator, PCTrapezoidalRegHCsTriple
from na_dd_tpu.mms import state_from_mms_when
from na_dd_tpu.mms.cases import MMSCasePol
from na_dd_tpu.models import Model02, default_model_consts
from na_dd_tpu.ops import LOCAL_OPS, make_uniform_grid


def _setup():
    g = make_uniform_grid(6, 6)
    model = Model02(default_model_consts)
    mms = MMSCasePol(g, model=model)
    forcing = MMSForcingRegHCsTriple(mms_case=mms, model=model, regularization_factor=50.0)
    field = FieldRegHCsTriple(grid=g, model=model, forcing=forcing, regularization_factor=50.0)
    integ = ForwardEulerIntegrator(field)
    s0 = state_from_mms_when(mms_case=mms, t=0.0, grid=g)
    return g, integ, s0


def test_save_load_roundtrip(tmp_path):
    g, integ, s0 = _setup()
    path = save_state(str(tmp_path / "ck"), s0, t=0.25, step=7, extra={"note": "x"})
    state, t, step, meta = load_state(path)
    assert t == 0.25 and step == 7
    assert meta["extra"]["note"] == "x"
    for v in State._fields:
        np.testing.assert_array_equal(np.asarray(getattr(state, v)), np.asarray(getattr(s0, v)))


def test_run_checkpointed_resume_matches_straight_run(tmp_path):
    g, integ, s0 = _setup()
    dt = 1e-3
    step_fn = lambda s, t, dtv: integ.step(s, t0=t, dt=dtv)

    # straight run of 10 steps
    s_ref, t_ref = s0, 0.0
    for k in range(10):
        s_ref = step_fn(s_ref, t_ref, dt)
        t_ref += dt

    # checkpointed run interrupted after 6 steps, then resumed
    d = str(tmp_path / "ckpts")
    run_checkpointed(step_fn, s0, t0=0.0, dt=dt, num_steps=6, directory=d, every=3)
    assert latest_checkpoint(d) is not None
    s_fin, t_fin = run_checkpointed(
        step_fn, s0, t0=0.0, dt=dt, num_steps=10, directory=d, every=3, resume=True
    )
    assert t_fin == pytest.approx(t_ref)
    for v in State._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(s_fin, v)), np.asarray(getattr(s_ref, v)), rtol=1e-14, atol=1e-300
        )


def test_legacy_run_convergence_studies():
    model = Model02(default_model_consts)
    configs = [
        (
            FieldRegHCsTriple,
            MMSCasePol,
            MMSForcingRegHCsTriple,
            PCTrapezoidalRegHCsTriple,
            "pol_reg",
        )
    ]
    params = dict(
        Tf=0.005,
        model=model,
        N_base_spatial=4,
        num_spatial_refinements=3,
        dt_fixed_spatial=1e-3,
        N_fixed_temporal=8,
        dt_base_temporal=2e-3,
        num_temporal_refinements=3,
        forcing_terms_params=dict(regularization_factor=50.0),
        field_params=dict(regularization_factor=50.0),
        integrator_params=dict(regularization_factor=50.0, track_residuals=False),
    )
    out = run_convergence_studies(configs, params)
    rep = out["pol_reg"]
    assert len(rep["spatial"]["errors"]) == 3
    assert len(rep["temporal"]["errors"]) == 3
    assert len(rep["spatial"]["rates"]) == 1
    assert all(np.isfinite(rep["spatial"]["errors"]))
    # spatial errors decrease over the ladder
    assert rep["spatial"]["errors"][0] > rep["spatial"]["errors"][-1]
