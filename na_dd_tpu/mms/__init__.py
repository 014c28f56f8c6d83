from na_dd_tpu.mms.engine import (
    t_sym,
    x_sym,
    y_sym,
    pack_symbolic_txy_with_derivatives,
    pack_analytical_txy_with_o2fdm_derivatives,
    MMSCaseBase,
    MMSCaseSymbolic,
    MMSCaseFromAnalytic,
    state_from_mms_when,
)
from na_dd_tpu.mms import cases

__all__ = [
    "t_sym",
    "x_sym",
    "y_sym",
    "pack_symbolic_txy_with_derivatives",
    "pack_analytical_txy_with_o2fdm_derivatives",
    "MMSCaseBase",
    "MMSCaseSymbolic",
    "MMSCaseFromAnalytic",
    "state_from_mms_when",
    "cases",
]
