"""Checkpoint / resume for long simulations.

The reference has no checkpointing at all (SURVEY.md §5: simulations re-run
from t0 every time).  For production-scale runs this module saves/restores the
five-field state plus time/step metadata.  Two backends:

* ``save_state``/``load_state`` — dependency-light ``.npz`` + JSON sidecar
  (host round-trip; fine for these grid sizes);
* ``save_state_orbax``/``load_state_orbax`` — orbax-checkpoint for sharded
  arrays (multi-chip runs restore with their sharding).

``run_checkpointed`` wraps a step function into a segmented driver that
checkpoints every ``every`` steps and resumes from the latest checkpoint.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Optional

import jax
import numpy as np

from na_dd_tpu.core.state import State

_META_SUFFIX = ".meta.json"


def save_state(path: str, state: State, *, t: float, step: int, extra: Optional[dict] = None) -> str:
    """Save a State + (t, step) to ``path`` (.npz appended if missing)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arrays = {k: np.asarray(v) for k, v in state._asdict().items()}
    np.savez(path, **arrays)
    meta = {"t": float(t), "step": int(step), "fields": list(state._fields)}
    if extra:
        meta["extra"] = extra
    with open(path + _META_SUFFIX, "w") as f:
        json.dump(meta, f)
    return path


def load_state(path: str):
    """Load (state, t, step, meta) saved by :func:`save_state`."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    data = np.load(path)
    with open(path + _META_SUFFIX) as f:
        meta = json.load(f)
    state = State(**{k: jax.numpy.asarray(data[k]) for k in meta["fields"]})
    return state, meta["t"], meta["step"], meta


def latest_checkpoint(directory: str) -> Optional[str]:
    """Path of the highest-step checkpoint in ``directory`` (or None)."""
    if not os.path.isdir(directory):
        return None
    best, best_step = None, -1
    for name in os.listdir(directory):
        if not name.endswith(".npz"):
            continue
        meta_path = os.path.join(directory, name + _META_SUFFIX)
        if not os.path.exists(meta_path):
            continue
        with open(meta_path) as f:
            step = json.load(f).get("step", -1)
        if step > best_step:
            best, best_step = os.path.join(directory, name), step
    return best


def run_checkpointed(
    step_fn: Callable[[State, float, float], State],
    state0: State,
    *,
    t0: float,
    dt: float,
    num_steps: int,
    directory: str,
    every: int = 100,
    resume: bool = True,
) -> tuple[State, float]:
    """Drive ``num_steps`` steps with periodic checkpoints; resumes from the
    latest checkpoint in ``directory`` when ``resume`` is set.

    Each inter-checkpoint segment of ``every`` steps runs as ONE scanned,
    jitted XLA program — the host only sees the state at checkpoint
    boundaries (a per-step host loop would be ~1000x slower).  ``step_fn``
    must be traceable: ``step_fn(state, t, dt) -> state`` with ``t`` possibly
    a traced scalar (any ``Integrator.step_fn`` closed over grid/ops
    qualifies).  t0/dt are baked into the program as constants; only the
    integer segment offset is traced, so per-step times t0 + k*dt stay exact.
    Returns (final_state, final_t).
    """
    import jax.numpy as jnp

    segment_cache: dict = {}

    def segment_runner(n: int):
        run = segment_cache.get(n)
        if run is None:

            def body(s, k):
                return step_fn(s, t0 + k * dt, dt), None

            @jax.jit
            def run(s, start):
                ks = (start + jnp.arange(n)).astype(jnp.result_type(float))
                s, _ = jax.lax.scan(body, s, ks)
                return s

            segment_cache[n] = run
        return run

    state, start = state0, 0
    if resume:
        ckpt = latest_checkpoint(directory)
        if ckpt is not None:
            state, _t, start, _ = load_state(ckpt)
    while start < num_steps:
        n = min(every, num_steps - start)
        state = segment_runner(n)(state, start)
        start += n
        jax.block_until_ready(state)
        save_state(
            os.path.join(directory, f"ckpt_{start:08d}"),
            state,
            t=t0 + start * dt,
            step=start,
        )
    return state, t0 + start * dt


def save_state_orbax(path: str, state: State, *, t: float, step: int) -> str:
    """Orbax backend (preserves shardings for multi-chip states)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"state": state._asdict(), "t": float(t), "step": int(step)})
    ckptr.wait_until_finished()
    return path


def load_state_orbax(path: str, like: State):
    """Restore an orbax checkpoint written by :func:`save_state_orbax`."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    template = {
        "state": like._asdict(),
        "t": 0.0,
        "step": 0,
    }
    restored = ckptr.restore(os.path.abspath(path), target=template)
    state = State(**restored["state"])
    return state, restored["t"], restored["step"]
