from na_dd_tpu.integrators.forward_euler import ForwardEulerIntegrator
from na_dd_tpu.integrators.pc_trapezoidal import (
    PCTrapezoidalBase,
    PCTrapezoidalCsTriple,
    PCTrapezoidalHCsTriple,
    PCTrapezoidalRegHCsTriple,
    HCsCorrectorPositivityError,
    default_krylov_unroll,
)

__all__ = [
    "ForwardEulerIntegrator",
    "PCTrapezoidalBase",
    "PCTrapezoidalCsTriple",
    "PCTrapezoidalHCsTriple",
    "PCTrapezoidalRegHCsTriple",
    "HCsCorrectorPositivityError",
    "default_krylov_unroll",
]
