"""Hardware calibration of the fori_loop fused 3-D BiCGStab kernel.

The unrolled form OOM'd Mosaic's scoped-VMEM stack on real hardware
(63.96 MB at N=32, iters=48 — studies/tpu_queue_r3d.sh item 5, 2026-08-18);
:func:`na_dd_tpu.ops.pallas_kernels._bicgstab_inline` now runs the 3-D
kernel's iteration as an in-kernel ``fori_loop``.  This probe measures, on
the attached TPU, for a ladder of cube sizes:

* whether the fused kernel COMPILES (catching the compile-helper OOM), to
  calibrate ``fused_solve3_fits`` against reality rather than counting;
* solution parity + iteration counts vs ``bicgstab_unrolled`` (jnp);
* steady timing of fused kernel vs the jnp unrolled solve (jit'd, min-of-10).

Writes studies/results/stencil7_fused_probe.json incrementally.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def _t(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def main():
    from na_dd_tpu import config

    config.setup_x64()
    config.enable_persistent_compilation_cache()
    print("devices:", jax.devices(), flush=True)

    from na_dd_tpu.models import Model02, default_model_consts
    from na_dd_tpu.ops import linsolve
    from na_dd_tpu.ops.pallas_kernels import (
        bicgstab_solve3_pallas,
        fused_solve3_fits,
    )
    from na_dd_tpu.three_d import (
        MMSCaseExpSin3,
        make_setup3,
        newton_planes3,
        state_from_mms_when3,
    )
    from na_dd_tpu.three_d.shifts import LOCAL_OPS3

    import os
    import sys

    sizes = tuple(int(a) for a in sys.argv[1:]) or (16, 24, 32, 38)
    path = "studies/results/stencil7_fused_probe.json"
    out = json.load(open(path)) if os.path.exists(path) else {}
    for N in sizes:
        shape = (N + 1,) * 3
        g, case, field, _ = make_setup3(
            MMSCaseExpSin3, N=N, model=Model02(default_model_consts)
        )
        fits = fused_solve3_fits(shape, g.xx.dtype)
        out[N] = {"fits_predicate": bool(fits), "dtype": str(g.xx.dtype)}
        s = state_from_mms_when3(mms_case=case, t=0.1, grid=g)
        st = newton_planes3(
            g, LOCAL_OPS3, field.stencil_dFcd_dcd(g, LOCAL_OPS3, s), 1e-3
        )
        mask = g.interior_mask
        b = (
            jnp.asarray(
                np.random.RandomState(0).randn(*g.full_shape), dtype=g.xx.dtype
            )
            * mask
        )
        invd = jnp.where(mask > 0, 1.0 / jnp.where(st.c0 == 0, 1.0, st.c0), 0.0)
        try:
            ks = jax.jit(
                lambda st, b: bicgstab_solve3_pallas(
                    st, b, invd, mask, tol=1e-5, iters=48
                )[0]
            )
            xk = jax.block_until_ready(ks(st, b))
        except Exception as e:  # compile-helper OOM → record, keep probing
            msg = str(e).splitlines()[0][:200]
            out[N]["compiles"] = False
            out[N]["error"] = msg
            print(N, "FAILED:", msg, flush=True)
            json.dump(out, open(path, "w"), indent=1)
            continue
        out[N]["compiles"] = True
        xu, infou = linsolve.bicgstab_unrolled(
            lambda w: st.apply(LOCAL_OPS3, w),
            b,
            jnp.zeros_like(b),
            dot=lambda a, c: jnp.sum(a * c),
            minv=lambda r: r * invd,
            tol=1e-5,
            iters=48,
        )
        _, infok = bicgstab_solve3_pallas(st, b, invd, mask, tol=1e-5, iters=48)
        dsol = float(jnp.max(jnp.abs(xk * mask - xu * mask)))
        scale = float(jnp.max(jnp.abs(xu * mask)))
        ju = jax.jit(
            lambda st, b: linsolve.bicgstab_unrolled(
                lambda w: st.apply(LOCAL_OPS3, w),
                b,
                jnp.zeros_like(b),
                dot=lambda a, c: jnp.sum(a * c),
                minv=lambda r: r * invd,
                tol=1e-5,
                iters=48,
            )[0]
        )
        jax.block_until_ready(ju(st, b))
        out[N].update(
            max_abs_dev=dsol,
            scale=scale,
            iters=[int(infok["iters"]), int(infou["iters"])],
            pallas_s=min(_t(lambda: jax.block_until_ready(ks(st, b))) for _ in range(10)),
            jnp_s=min(_t(lambda: jax.block_until_ready(ju(st, b))) for _ in range(10)),
        )
        print(N, out[N], flush=True)
        assert dsol <= 1e-4 * scale, (dsol, scale)
        json.dump(out, open(path, "w"), indent=1)
    json.dump(out, open(path, "w"), indent=1)
    print("done", flush=True)


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
