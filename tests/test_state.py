"""State container tests (the reference's StateVars immutability contract,
tests/test_statevars.py, translated to the pytree State)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from na_dd_tpu.core import State
from na_dd_tpu.utils import solve_newton_step_Fx_eq_C

SEED = 20250503


def _state():
    rng = np.random.RandomState(SEED)
    return State(*(jnp.asarray(rng.rand(4, 4)) for _ in range(5)))


def test_state_is_immutable():
    s = _state()
    with pytest.raises(AttributeError):
        s.cp = jnp.zeros((4, 4))  # NamedTuple fields cannot be assigned
    with pytest.raises(AttributeError):
        del s.T


def test_with_changes_functional_update():
    s = _state()
    new_cp = jnp.ones((4, 4))
    s2 = s.with_changes(cp=new_cp)
    assert s2 is not s
    np.testing.assert_array_equal(np.asarray(s2.cp), 1.0)
    np.testing.assert_array_equal(np.asarray(s2.T), np.asarray(s.T))
    # original untouched
    assert float(jnp.max(jnp.abs(s.cp - 1.0))) > 0


def test_with_changes_rejects_unknown_field():
    s = _state()
    with pytest.raises(ValueError):
        s.with_changes(bogus=jnp.zeros((4, 4)))


def test_state_is_pytree():
    s = _state()
    doubled = jax.tree.map(lambda a: 2 * a, s)
    np.testing.assert_allclose(np.asarray(doubled.cl), 2 * np.asarray(s.cl))
    leaves = jax.tree.leaves(s)
    assert len(leaves) == 5


def test_dense_newton_helper():
    rng = np.random.RandomState(SEED)
    A = rng.rand(6, 6) + 6 * np.eye(6)
    x_true = rng.rand(6)
    C = A @ x_true
    x0 = np.zeros(6)
    # linear F: one Newton step is exact
    x1 = solve_newton_step_Fx_eq_C(x0=x0, Fx0=A @ x0, JacFx0=A, C=C)
    np.testing.assert_allclose(x1, x_true, rtol=1e-12)
    with pytest.raises(ValueError):
        solve_newton_step_Fx_eq_C(x0=np.zeros((2, 2)), Fx0=A @ x0, JacFx0=A, C=C)
    with pytest.raises(np.linalg.LinAlgError):
        solve_newton_step_Fx_eq_C(x0=x0, Fx0=x0, JacFx0=np.zeros((6, 6)), C=C)
