from na_dd_tpu.core.state import State, heaviside_regularized
from na_dd_tpu.core.fields import (
    Field01Base,
    FieldCsTriple,
    FieldHCsTriple,
    FieldRegHCsTriple,
)
from na_dd_tpu.core.forcing import (
    NoForcing,
    ForcingFromCallables,
    MMSForcingCsTriple,
    MMSForcingHCsTriple,
    MMSForcingRegHCsTriple,
)

__all__ = [
    "State",
    "heaviside_regularized",
    "Field01Base",
    "FieldCsTriple",
    "FieldHCsTriple",
    "FieldRegHCsTriple",
    "NoForcing",
    "ForcingFromCallables",
    "MMSForcingCsTriple",
    "MMSForcingHCsTriple",
    "MMSForcingRegHCsTriple",
]
