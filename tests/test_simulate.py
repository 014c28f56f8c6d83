"""Production (non-MMS) simulation facade tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from na_dd_tpu.core import State
from na_dd_tpu.harness.simulate import make_integrator, released_drug_fraction, simulate
from na_dd_tpu.models import Model02, default_model_consts
from na_dd_tpu.ops import LOCAL_OPS, make_uniform_grid


@pytest.fixture(scope="module")
def setup():
    g = make_uniform_grid(12, 12)
    model = Model02(default_model_consts._replace(Kd=1e-2, Sd=1.0))
    xx, yy = np.asarray(g.xx), np.asarray(g.yy)
    bump = np.sin(np.pi * xx) * np.sin(np.pi * yy)
    s0 = State(
        cp=jnp.asarray(bump),
        T=jnp.asarray(0.5 * bump),
        cl=jnp.asarray(0.2 * bump),
        cd=jnp.asarray(0.0 * bump),
        cs=jnp.asarray(0.3 * bump),
    )
    return g, model, s0


@pytest.mark.parametrize("variant", ["cstriple", "reghcstriple"])
def test_simulate_runs_and_snapshots(setup, variant):
    g, model, s0 = setup
    integ = make_integrator(g, model, variant=variant)
    s_final, times, snaps = simulate(
        integ, g, s0, dt=1e-3, num_steps=8, snapshot_every=4
    )
    assert snaps is not None and snaps.cp.shape == (2,) + g.full_shape
    assert np.allclose(np.asarray(times), [4e-3, 8e-3])
    for v in State._fields:
        assert np.isfinite(np.asarray(getattr(s_final, v))).all()
    # last snapshot equals the final state
    for v in State._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(snaps, v)[-1]), np.asarray(getattr(s_final, v))
        )


def test_simulate_without_snapshots_matches(setup):
    g, model, s0 = setup
    integ = make_integrator(g, model)
    a, _, _ = simulate(integ, g, s0, dt=1e-3, num_steps=8)
    b, _, _ = simulate(integ, g, s0, dt=1e-3, num_steps=8, snapshot_every=2)
    for v in State._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(a, v)), np.asarray(getattr(b, v)), rtol=1e-15
        )


def test_released_drug_fraction_monotone(setup):
    """Dissolution (cs -> cd -> transport) should not create drug mass."""
    g, model, s0 = setup
    integ = make_integrator(g, model)
    s_final, _, snaps = simulate(integ, g, s0, dt=2e-3, num_steps=20, snapshot_every=10)
    f1 = float(released_drug_fraction(LOCAL_OPS, g, State(*[a[0] for a in snaps]), s0))
    f2 = float(released_drug_fraction(LOCAL_OPS, g, s_final, s0))
    assert np.isfinite(f1) and np.isfinite(f2)
    assert f2 >= f1 - 1e-12  # released fraction is non-decreasing
