"""Physical model constants.

Mirror of the reference ``ModelConsts`` NamedTuple and its defaults
(src/prob1base.py:28-68).  Constants are plain Python floats and enter jitted
programs as compile-time constants (they never change within a simulation).
"""

from __future__ import annotations

from typing import NamedTuple


class ModelConsts(NamedTuple):
    R0: float
    Ea: float
    K1: float
    K2: float
    K3: float
    K4: float
    DT: float
    Dl_max: float
    phi_l: float
    gamma_T: float
    Kd: float
    Sd: float
    Dd_max: float
    phi_d: float
    phi_T: float
    r_sp: float
    T_ref: float = 300.0


R0 = 8.3144621
Ea = 1.60217662e-19

default_model_consts = ModelConsts(
    R0=R0,
    Ea=Ea,
    K1=1e-2,
    K2=1e-2,
    K3=1e-2,
    K4=1e-2,
    DT=1e-3,
    Dl_max=8.01e-4,
    phi_l=1e-5,
    gamma_T=1e-9,
    Kd=1e-8,
    Sd=10.0,
    Dd_max=2.46e-6,
    phi_d=1e-5,
    phi_T=Ea / R0,
    r_sp=5e-2,
    T_ref=300.0,
)
