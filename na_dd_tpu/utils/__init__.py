from na_dd_tpu.utils.timing import Timed, timed_block, time_compile_and_run, xla_trace
from na_dd_tpu.utils.testing import solve_newton_step_Fx_eq_C

__all__ = [
    "Timed",
    "timed_block",
    "time_compile_and_run",
    "xla_trace",
    "solve_newton_step_Fx_eq_C",
]
