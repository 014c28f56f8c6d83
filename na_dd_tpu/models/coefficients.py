"""Nonlinear model coefficient functions Dl, V1, V2, Dd and their derivatives.

Counterparts of ``DefaultModel01`` / ``DefaultModel02`` (reference
src/prob1base.py:71-217) with the same dual numeric/symbolic dispatch: numeric
inputs are JAX arrays (traced inside jitted step programs), SymPy expressions
are used by the MMS machinery to derive forcing terms and by operator
consistency tests.

The ``T = 0`` singular limit of ``exp(-phi_T / T)`` is taken as 0 and realized
with ``jnp.where`` double-masking so it is NaN-safe under jit *and* under
differentiation.
"""

from __future__ import annotations

import jax.numpy as jnp
import sympy

from na_dd_tpu.models.consts import ModelConsts


class Model01:
    """Base model: Dl(cp) = Dl_max e^{-φ_l cp}, V = (γ_T T, 0),
    Dd(cp,T) = Dd_max e^{-φ_d cp} e^{-φ_T/T}."""

    def __init__(self, mc: ModelConsts):
        for k, v in mc._asdict().items():
            setattr(self, k, v)

    # --- reference API: with_changes / copy (src/prob1base.py:76-85) ---
    def consts(self) -> ModelConsts:
        return ModelConsts(**{k: getattr(self, k) for k in ModelConsts._fields})

    def with_changes(self, **kwargs):
        out = type(self)(self.consts())
        for k, v in kwargs.items():
            setattr(out, k, v)
        return out

    def copy(self):
        return self.with_changes()

    # --- coefficients ---
    def Dl(self, cp, *, d: int = 0):
        """Dl = Dl_max exp(-phi_l cp); d-th derivative in cp."""
        if isinstance(cp, sympy.Expr):
            return sympy.diff(self.Dl_max * sympy.exp(-self.phi_l * cp), cp, d)
        return ((-self.phi_l) ** d) * self.Dl_max * jnp.exp(-self.phi_l * cp)

    def V1(self, T, *, d: int = 0):
        """V1 = gamma_T * T."""
        if isinstance(T, sympy.Expr):
            return sympy.diff(self.gamma_T * T, T, d)
        if d == 0:
            return self.gamma_T * T
        if d == 1:
            return self.gamma_T * jnp.ones_like(T)
        return jnp.zeros_like(T)

    def V2(self, T, *, d: int = 0):
        """V2 = 0."""
        if isinstance(T, sympy.Expr):
            return sympy.S(0)
        return jnp.zeros_like(T)

    def V3(self, T, *, d: int = 0):
        """V3 = 0 — the z velocity component of the 3-D extension
        (:mod:`na_dd_tpu.three_d`).  The reference model's velocity is along
        x only (V = (γ_T T, 0), src/prob1base.py:110-130), so both transverse
        components vanish; kept as a hook exactly like :meth:`V2`."""
        if isinstance(T, sympy.Expr):
            return sympy.S(0)
        return jnp.zeros_like(T)

    def Dd(self, cp, T, *, d=(0, 0)):
        """Dd = Dd_max exp(-phi_d cp) exp(-phi_T / T), with Dd(.,0) := 0.

        ``d = (d_cp, d_T)`` selects mixed partial orders; supported like the
        reference: (0,0), (1,0), (0,1).
        """
        sym_cp = isinstance(cp, sympy.Expr)
        sym_T = isinstance(T, sympy.Expr)
        assert sym_cp == sym_T, "cp and T must both be symbolic or both numeric"
        if sym_cp:
            expr = (
                self.Dd_max * sympy.exp(-self.phi_d * cp) * sympy.exp(-self.phi_T / T)
            )
            return sympy.diff(sympy.diff(expr, cp, d[0]), T, d[1])

        cp = jnp.asarray(cp)
        T = jnp.asarray(T)
        tnz = T != 0
        T_safe = jnp.where(tnz, T, 1.0)  # double-where: NaN-safe value and grad
        base = jnp.where(
            tnz,
            self.Dd_max * jnp.exp(-self.phi_d * cp) * jnp.exp(-self.phi_T / T_safe),
            0.0,
        )
        if d == (0, 0):
            return base
        if d == (1, 0):
            return -self.phi_d * base
        if d == (0, 1):
            return jnp.where(tnz, base * self.phi_T / (T_safe**2), 0.0)
        raise ValueError(f"unsupported derivative spec {d!r}")


class Model02(Model01):
    """Temperature-shifted Dd: Dd(cp, T) := Model01.Dd(cp, T + T_ref)
    (reference src/prob1base.py:205-217).  Used by all tests/notebooks."""

    def Dd(self, cp, T, *, d=(0, 0)):
        if isinstance(T, sympy.Expr):
            return super().Dd(cp, T + self.T_ref, d=d)
        return super().Dd(cp, T + self.T_ref, d=d)
