"""3-D forcing terms: trivial + MMS-derived (residual insertion).

The 3-D twin of :mod:`na_dd_tpu.core.forcing` (reference
``ForcingTerms_CsTriple`` etc., src/prob1base.py:2296-2425, 3222-3297,
3468-3551 — all strictly 2-D; this module is part of the beyond-reference 3-D
extension).  For each field, ``f = d/dt u_exact − RHS_continuous(u_exact)``
with the continuous spatial operators now including the z terms and the
velocity V = (V1(T), V2(T), V3(T)); the cp forcing is projected onto dual-cell
averages via 3×3×3 Gauss–Legendre quadrature (:func:`avg_int3`).
"""

from __future__ import annotations

import jax.numpy as jnp

from na_dd_tpu.core.state import heaviside_regularized
from na_dd_tpu.models.coefficients import Model01
from na_dd_tpu.three_d.grid import Grid3
from na_dd_tpu.three_d.quadrature import avg_int3
from na_dd_tpu.three_d.shifts import Ops3


class Forcing3Base:
    def fcp(self, g: Grid3, ops: Ops3, t):  # pragma: no cover - interface
        raise NotImplementedError

    def fT(self, g: Grid3, ops: Ops3, t):  # pragma: no cover - interface
        raise NotImplementedError

    def fcl(self, g: Grid3, ops: Ops3, t):  # pragma: no cover - interface
        raise NotImplementedError

    def fcd(self, g: Grid3, ops: Ops3, t):  # pragma: no cover - interface
        raise NotImplementedError

    def fcs(self, g: Grid3, ops: Ops3, t):  # pragma: no cover - interface
        raise NotImplementedError


class NoForcing3(Forcing3Base):
    """All-zero forcing."""

    def fcp(self, g, ops, t):
        return g.make_full0()

    fT = fcp
    fcl = fcp
    fcd = fcp
    fcs = fcp


class MMSForcingCsTriple3(Forcing3Base):
    """Forcing derived from a 3-D MMS case for the CsTriple reaction (2-D
    counterpart: core/forcing.MMSForcingCsTriple)."""

    def __init__(self, *, mms_case, model: Model01):
        self.mms_case = mms_case
        self.model = model

    # fcp is the cell-average projection of this pointwise residual.
    def fcp_ptwise(self, t, xx, yy, zz):
        c = self.mms_case
        m = self.model
        cp = c.cp(t, xx, yy, zz)
        cl = c.cl(t, xx, yy, zz)
        T = c.T(t, xx, yy, zz)
        return c.dt_cp(t, xx, yy, zz) + cp * (m.K1 * (1.0 + cl) + m.K2 * T)

    def fcp(self, g, ops, t):
        return avg_int3(lambda p, q, r: self.fcp_ptwise(t, p, q, r), g, ops)

    def fT(self, g, ops, t):
        c = self.mms_case
        m = self.model
        xx, yy, zz = g.xx, g.yy, g.zz
        return c.dt_T(t, xx, yy, zz) - (
            m.DT * c.lap_T(t, xx, yy, zz)
            - m.K3 * c.cp(t, xx, yy, zz) * c.T(t, xx, yy, zz)
        )

    def fcl(self, g, ops, t):
        c = self.mms_case
        m = self.model
        xx, yy, zz = g.xx, g.yy, g.zz
        cp = c.cp(t, xx, yy, zz)
        T = c.T(t, xx, yy, zz)
        cl = c.cl(t, xx, yy, zz)
        dxCl = c.dx_cl(t, xx, yy, zz)
        dyCl = c.dy_cl(t, xx, yy, zz)
        dzCl = c.dz_cl(t, xx, yy, zz)
        V1 = m.V1(T)
        V2 = m.V2(T)
        V3 = m.V3(T)
        dV1 = m.V1(T, d=1)
        dV2 = m.V2(T, d=1)
        dV3 = m.V3(T, d=1)
        Dl = m.Dl(cp)
        dDl = m.Dl(cp, d=1)
        return c.dt_cl(t, xx, yy, zz) - (
            dDl
            * (
                c.dx_cp(t, xx, yy, zz) * dxCl
                + c.dy_cp(t, xx, yy, zz) * dyCl
                + c.dz_cp(t, xx, yy, zz) * dzCl
            )
            + Dl * c.lap_cl(t, xx, yy, zz)
            - V1 * dxCl
            - V2 * dyCl
            - V3 * dzCl
            - (cl + 1.0)
            * (
                dV1 * c.dx_T(t, xx, yy, zz)
                + dV2 * c.dy_T(t, xx, yy, zz)
                + dV3 * c.dz_T(t, xx, yy, zz)
            )
            - m.K4 * cp * (cl + 1.0)
        )

    def _cs_reaction_factor(self, cs):
        """F2(cs)/Kd in the exact (continuous) reaction; overridden by the
        Heaviside variants."""
        return cs

    def _fcd_fcs_core(self, g, t):
        c = self.mms_case
        m = self.model
        xx, yy, zz = g.xx, g.yy, g.zz
        cp = c.cp(t, xx, yy, zz)
        T = c.T(t, xx, yy, zz)
        cl = c.cl(t, xx, yy, zz)
        cd = c.cd(t, xx, yy, zz)
        cs = c.cs(t, xx, yy, zz)
        Dd = m.Dd(cp, T)
        dCp_Dd = m.Dd(cp, T, d=(1, 0))
        dT_Dd = m.Dd(cp, T, d=(0, 1))
        cs_factor = self._cs_reaction_factor(cs)
        reaction = m.Kd * (m.Sd - cd) * (cl + 1.0) * cs_factor
        diffusion = (
            (dCp_Dd * c.dx_cp(t, xx, yy, zz) + dT_Dd * c.dx_T(t, xx, yy, zz))
            * c.dx_cd(t, xx, yy, zz)
            + (dCp_Dd * c.dy_cp(t, xx, yy, zz) + dT_Dd * c.dy_T(t, xx, yy, zz))
            * c.dy_cd(t, xx, yy, zz)
            + (dCp_Dd * c.dz_cp(t, xx, yy, zz) + dT_Dd * c.dz_T(t, xx, yy, zz))
            * c.dz_cd(t, xx, yy, zz)
            + Dd * c.lap_cd(t, xx, yy, zz)
        )
        return diffusion, reaction

    def fcd(self, g, ops, t):
        diffusion, reaction = self._fcd_fcs_core(g, t)
        return self.mms_case.dt_cd(t, g.xx, g.yy, g.zz) - (diffusion + reaction)

    def fcs(self, g, ops, t):
        _, reaction = self._fcd_fcs_core(g, t)
        return self.mms_case.dt_cs(t, g.xx, g.yy, g.zz) + reaction


class MMSForcingHCsTriple3(MMSForcingCsTriple3):
    """Sharp-Heaviside reaction in fcd/fcs; fcp/fT/fcl identical to CsTriple."""

    def _cs_reaction_factor(self, cs):
        return (cs > 0).astype(jnp.asarray(cs).dtype)


class MMSForcingRegHCsTriple3(MMSForcingCsTriple3):
    """Regularized-Heaviside reaction (the paper's headline scheme, in 3-D)."""

    def __init__(self, *, mms_case, model: Model01, regularization_factor):
        super().__init__(mms_case=mms_case, model=model)
        # May be a Python float or a traced scalar (vmapped eta studies).
        self.regularization_factor = regularization_factor

    def _cs_reaction_factor(self, cs):
        return heaviside_regularized(cs, self.regularization_factor)
