"""Global numerical configuration.

The reference computes everything in float64 (NumPy default).  The parity gate
(BASELINE.md: ≤1e-8 relative error deviation, Newton residuals < 1e-9 in
H-norm) requires f64 accumulation, so x64 is enabled package-wide.  TPU has no
native f64 MXU, but this workload is VPU/stencil-bound on small grids, where
emulated f64 is acceptable; a f32 fast path can be selected per-simulation via
the ``dtype`` arguments where offered.
"""

import os
import sys

import jax

# Deeply composed programs (the mixed-precision path traces Pallas solve
# kernels inside refinement loops inside Newton sweeps inside the whole-run
# scan) exceed CPython's default 1000-frame recursion limit during JAX's
# jaxpr lowering (measured: RecursionError lowering mixed+pallas on TPU).
# Raising it is the standard JAX remedy; CPython frames are heap-allocated,
# so a generous bound only relaxes the runaway-recursion guard.
sys.setrecursionlimit(max(sys.getrecursionlimit(), 20_000))


def setup_x64() -> None:
    """Enable f64 unless NA_DD_TPU_X64=0 requests the f32 production mode.

    f64 is required for the reference-parity gate (<=1e-8 relative error
    deviation).  The f32 mode trades the last ~7 digits of the MMS error floor
    for native-speed TPU arithmetic and far faster compiles; use it for
    production forward runs, not for convergence verification.
    """
    if os.environ.get("NA_DD_TPU_X64", "1") != "0":
        jax.config.update("jax_enable_x64", True)


def enable_persistent_compilation_cache(path: str | None = None) -> None:
    """Enable the on-disk XLA compilation cache.

    The TPU backend here compiles f64-emulated programs slowly (minutes for
    the fused whole-simulation program); the persistent cache makes repeat
    runs (benchmarks, study ladders re-run across processes) start in seconds.
    """
    if path is None:
        path = os.environ.get(
            "NA_DD_TPU_CACHE", os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
        )
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    stabilize_pallas_cache_keys()


_MOSAIC_STRIP_INSTALLED = False


def stabilize_pallas_cache_keys() -> None:
    """Strip source-location debug info from Mosaic kernel payloads so the
    persistent compilation cache survives edits to kernel source files.

    ``jax._src.tpu_custom_call`` serializes each Pallas kernel's Mosaic MLIR
    module — WITH its ``loc(...)`` debug info (file names + line numbers of
    the kernel Python source) — into the ``tpu_custom_call`` backend_config
    of the outer StableHLO module.  The persistent-cache key hashes that
    module, so ANY line shift in ops/pallas_kernels.py (even a comment)
    changes the key and forces a full recompile of every pallas-mode program
    (measured: two byte-identical bench runs wrote distinct ~15 MB cache
    entries after an unrelated edit; cold compiles of 440-490 s repeated on
    every run).  Verified mechanism: lowering the same pallas program twice
    gives identical module text, but a 1-line shift in the kernel file
    changes only the serialized Mosaic ``body`` payload.

    This wraps ``_lower_mosaic_module_to_asm`` to round-trip the kernel
    module through MLIR bytecode emitted with ``enable_debug_info=False``
    (re-parsed in the same context; the temporary
    ``allow_unregistered_dialects`` toggle mirrors jax's own serialization
    helper).  Locations are metadata only — Mosaic compiles the stripped
    module identically; the cost is less precise source lines in Mosaic
    error messages.  Opt out with NA_DD_TPU_STRIP_KERNEL_DEBUG=0 (e.g. when
    debugging a kernel lowering failure)."""
    global _MOSAIC_STRIP_INSTALLED
    if _MOSAIC_STRIP_INSTALLED:
        return
    if os.environ.get("NA_DD_TPU_STRIP_KERNEL_DEBUG", "1") == "0":
        return
    try:
        from jax._src import tpu_custom_call as _tcc

        inner = _tcc._lower_mosaic_module_to_asm
    except (ImportError, AttributeError):  # pragma: no cover - jax refactors
        # private jax symbol moved/renamed: degrade to unstabilized keys
        # rather than crashing every TPU script at cache setup
        return

    def stripped(module, **kwargs):
        try:
            from jax._src.lib.mlir import ir

            ctx = module.context
            with ctx:
                # location-free round-trip: bytecode without debug info,
                # re-parsed in the same context (dialects already live there)
                asm = module.operation.get_asm(
                    binary=True, enable_debug_info=False
                )
                prev = ctx.allow_unregistered_dialects
                ctx.allow_unregistered_dialects = True
                try:
                    module = ir.Module.parse(asm)
                finally:
                    ctx.allow_unregistered_dialects = prev
        except Exception:  # pragma: no cover - never block lowering
            pass
        return inner(module, **kwargs)

    _tcc._lower_mosaic_module_to_asm = stripped
    _MOSAIC_STRIP_INSTALLED = True
