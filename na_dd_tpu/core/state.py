"""Five-field simulation state as a flat JAX pytree.

The reference wraps the state in ``StateVars`` (src/prob1base.py:1913-2085),
an immutable container with 24 lazily-cached derived stencil quantities.
Under XLA none of that machinery is needed: a jitted step traces every derived
quantity once and common-subexpression elimination plus fusion make
"recomputation" free, so the state is just a NamedTuple of the five grid
functions.  NamedTuples are immutable (functional updates via ``_replace`` /
``with_changes``), are pytrees (vmap/scan/shard-able), and keep the hot path
allocation-free.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class State(NamedTuple):
    cp: jax.Array  # polymer concentration
    T: jax.Array  # temperature
    cl: jax.Array  # solvent (liquid) concentration
    cd: jax.Array  # dissolved drug concentration
    cs: jax.Array  # solid drug concentration

    def with_changes(self, **kwargs) -> "State":
        allowed = set(self._fields)
        for key in kwargs:
            if key not in allowed:
                raise ValueError(f"{key}: invalid change; can only change {sorted(allowed)}")
        return self._replace(**kwargs)

    def copy(self) -> "State":
        return self


def heaviside_regularized(x, regularization_factor: float):
    """H_eta(x) = 1 / (1 + exp(-eta x)) (reference src/prob1base.py:3452-3466).

    Implemented with the numerically stable sigmoid so large |eta x| saturates
    to exactly 0/1 instead of overflowing ``exp`` (the reference's NumPy
    expression relies on IEEE inf semantics for the same result).
    """
    return jax.nn.sigmoid(regularization_factor * jnp.asarray(x))
