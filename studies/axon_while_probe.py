#!/usr/bin/env python
"""Minimal reproducer for the axon-TPU loop-carry precision hazards.

The framework works around two measured backend behaviors (see
harness/studies.py and mms/engine.py docstrings):

1. 0-d f64 scalars carried through ``lax.while_loop`` bodies lose ~7 digits
   (computed at ~f32 precision) on the f64-emulation backend;
2. transcendentals of 0-d/1-element f64 operands similarly degrade.

This probe isolates (1) with the smallest possible program: accumulate
``x += delta`` N times with delta = 1e-9 + 1e-17 (the 1e-17 part is below
f32 resolution of the running sum but well inside f64), once with a 0-d
carry, once with a (1,1)-array carry, and once under ``lax.scan``; exact
result is N*delta.  Run on any backend:

    python studies/axon_while_probe.py          # whatever jax.devices()[0] is
    JAX-on-CPU: relative errors ~1e-16 for all three forms.
    axon TPU (measured 2026-08): while/0-d shows the f32-level drift; the
    array-carry forms stay exact — which is why the framework's adaptive
    loop carries t/dt as (1,1) arrays and the solvers unroll.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from na_dd_tpu.config import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

N = 100_000
DELTA = 1e-9 + 1e-17
EXACT = N * DELTA


def while_scalar():
    def body(c):
        x, k = c
        return (x + DELTA, k + 1)

    x, _ = jax.lax.while_loop(lambda c: c[1] < N, body, (jnp.float64(0.0), 0))
    return x


def while_array():
    def body(c):
        x, k = c
        return (x + DELTA, k + 1)

    x, _ = jax.lax.while_loop(
        lambda c: c[1] < N, body, (jnp.zeros((1, 1), dtype=jnp.float64), 0)
    )
    return x[0, 0]


def scan_scalar():
    def body(x, _):
        return x + DELTA, None

    x, _ = jax.lax.scan(body, jnp.float64(0.0), None, length=N)
    return x


def main():
    print(f"device={jax.devices()[0]}  N={N}  exact={EXACT:.17e}")
    for name, fn in [
        ("while_loop 0-d carry", while_scalar),
        ("while_loop (1,1) carry", while_array),
        ("scan 0-d carry", scan_scalar),
    ]:
        got = float(jax.jit(fn)())
        rel = abs(got - EXACT) / EXACT
        print(f"  {name:24s} got={got:.17e}  rel_err={rel:.3e}")


if __name__ == "__main__":
    main()
