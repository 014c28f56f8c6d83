"""Ensemble (parameter-screening) throughput benchmark — the serving story.

The reference runs one simulation per process (serial NumPy; its eta study
loops 7 values one after another, reference
MMSCasePol_reghcstriple_convergence_study.ipynb cell 13).  On TPU the same
workload is a *batch axis*: B independent full simulations — here a
regularization-factor screen, the production-shaped "many variants of one
device design" workload — integrate as ONE vmapped XLA program, so the MXU
sees batched stencil algebra and the per-simulation cost amortizes the
dispatch/latency overhead of the tunneled device.

Exactness: the unrolled BiCGStab and the pointwise cs-Newton use pure
where-masked early exits, so vmap batching is bit-identical to the serial
runs (same guarantee the batched eta study relies on,
harness/studies.run_eta_study_batched).

Measures, per batch size B: steady wall-clock of the whole batch (min over
repeats, compile excluded), simulations/second, and the scaling efficiency
vs B=1.  Archives ONE JSON to studies/results/ensemble_throughput*.json.

Usage (TPU; ~minutes, dominated by one compile per batch size):
    python studies/ensemble_throughput.py                 # f64
    NA_DD_TPU_X64=0 python studies/ensemble_throughput.py # f32 production
    python studies/ensemble_throughput.py --cpu --batches 1,4 --n 16
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--study", default="pol")
    ap.add_argument("--n", type=int, default=64, help="grid N (NxN)")
    ap.add_argument("--tf", type=float, default=0.01)
    ap.add_argument("--dt", type=float, default=5e-4)
    ap.add_argument("--batches", default="1,8,32,128",
                    help="comma-separated ensemble sizes")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--dp", type=int, default=0,
                    help="shard the ensemble batch axis over this many "
                         "devices (data-parallel serving; 0 = single device)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    from na_dd_tpu import config

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        if args.dp:
            jax.config.update("jax_num_cpu_devices", max(args.dp, 1))
    config.setup_x64()
    if not args.cpu:
        config.enable_persistent_compilation_cache()
    print("devices:", jax.devices(), flush=True)

    import jax.numpy as jnp
    import numpy as np

    from na_dd_tpu.core import FieldRegHCsTriple, MMSForcingRegHCsTriple
    from na_dd_tpu.harness.studies import (
        STUDIES,
        _study_unroll,
        study_consts,
    )
    from na_dd_tpu.integrators import PCTrapezoidalRegHCsTriple
    from na_dd_tpu.mms import state_from_mms_when
    from na_dd_tpu.models import Model02
    from na_dd_tpu.ops import make_uniform_grid
    from na_dd_tpu.ops.shifts import LOCAL_OPS

    cfg = STUDIES[args.study]
    mc = study_consts(args.study)
    grid = make_uniform_grid(args.n, args.n)
    model = Model02(mc)
    case = cfg["case_cls"](grid=grid, model=model)
    s0 = state_from_mms_when(mms_case=case, t=0.0, grid=grid)
    num_steps = math.ceil(args.tf / args.dt)
    dt = args.tf / num_steps
    unroll = _study_unroll(cfg, args.n, dt, mc)

    def simulate_one(eta):
        """One full production integration (no error collection — serving,
        not verification); eta is a traced scalar, so one compiled program
        serves every ensemble member."""
        forcing = MMSForcingRegHCsTriple(
            mms_case=case, model=model, regularization_factor=eta
        )
        field = FieldRegHCsTriple(
            grid=grid, model=model, forcing=forcing, regularization_factor=eta
        )
        integ = PCTrapezoidalRegHCsTriple(
            field,
            regularization_factor=eta,
            track_residuals=False,
            krylov_unroll=unroll,
        )

        def body(s, k):
            s1, _diag = integ.step_fn(grid, LOCAL_OPS, s, k * dt, dt)
            return s1, None

        ks = jnp.arange(num_steps, dtype=jnp.result_type(float))
        s_final, _ = jax.lax.scan(body, s0, ks)
        return s_final

    # Data-parallel serving: shard the BATCH axis over a 1-D device mesh.
    # Each ensemble member is independent (no cross-member reductions), so
    # pure sharding annotations suffice — XLA partitions the vmapped program
    # with zero collectives on the hot path; this is the dp axis of the
    # parallel story (the spatial halo decomposition in na_dd_tpu.parallel
    # is the tensor axis).
    shard_batch = None
    if args.dp:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec

        devs = jax.devices()[: args.dp]
        assert len(devs) == args.dp, (len(jax.devices()), args.dp)
        mesh = Mesh(np.asarray(devs), ("b",))
        sharding = NamedSharding(mesh, PartitionSpec("b"))
        shard_batch = lambda a: jax.device_put(a, sharding)  # noqa: E731
        print(f"data-parallel over {args.dp} devices", flush=True)

    batches = [int(b) for b in args.batches.split(",")]
    results = {}
    base_per_sim = None
    for B in batches:
        # an eta screen around the study's production value (50): distinct
        # parameters per member, same compiled program
        etas = jnp.asarray(np.linspace(20.0, 200.0, B))
        if shard_batch is not None and B % args.dp == 0:
            etas = shard_batch(etas)
        run = jax.jit(jax.vmap(simulate_one))
        t0 = time.perf_counter()
        out = jax.block_until_ready(run(etas))
        first = time.perf_counter() - t0
        assert bool(jnp.isfinite(out.T).all()), f"B={B}: non-finite state"
        steady = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(run(etas))
            steady = min(steady, time.perf_counter() - t0)
        per_sim = steady / B
        if base_per_sim is None:
            base_per_sim = per_sim
        results[B] = dict(
            batch_s=steady,
            first_s=first,
            sims_per_s=B / steady,
            per_sim_s=per_sim,
            efficiency_vs_B1=base_per_sim / per_sim,
        )
        print(
            f"[ensemble {args.study} N={args.n} steps={num_steps}] B={B:4d} "
            f"steady={steady:.4f}s  {B / steady:8.1f} sims/s  "
            f"per-sim {per_sim * 1e3:7.2f} ms  "
            f"eff x{base_per_sim / per_sim:.1f} vs B=1",
            flush=True,
        )

    x64 = os.environ.get("NA_DD_TPU_X64", "1") != "0"
    tag = "" if x64 else "_f32"
    out_path = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "results",
        f"ensemble_throughput{tag}.json",
    )
    payload = dict(
        study=args.study,
        N=args.n,
        Tf=args.tf,
        dt=dt,
        num_steps=num_steps,
        x64=x64,
        backend=jax.default_backend(),
        dp=args.dp,
        krylov_unroll=unroll,
        batches={str(b): r for b, r in results.items()},
        timestamp=time.strftime("%Y-%m-%d %H:%M:%S"),
    )
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print("archived:", out_path, flush=True)


if __name__ == "__main__":
    main()
