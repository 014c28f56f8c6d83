"""Derived-quantities tests: every entry checked against direct stencil/model
recomputation (the reference's tests/test_statevars.py strategy)."""

import numpy as np
import jax.numpy as jnp

from na_dd_tpu.core import State
from na_dd_tpu.core.derived import derived_quantities
from na_dd_tpu.models import Model02, default_model_consts
from na_dd_tpu.ops import LOCAL_OPS, make_uniform_grid

SEED = 20250503


def test_derived_quantities_match_direct():
    g = make_uniform_grid(7, 9)
    model = Model02(default_model_consts._replace(Dl_max=2.0, phi_l=0.3, gamma_T=0.7))
    rng = np.random.RandomState(SEED)
    s = State(*(jnp.asarray(rng.rand(*g.full_shape) + 0.2) for _ in range(5)))
    d = derived_quantities(g, LOCAL_OPS, model, s)
    assert len(d) == 29  # 5 fields + 24 derived

    h = 1.0 / g.N
    k = 1.0 / g.M
    cp = np.asarray(s.cp)
    T = np.asarray(s.T)
    cl = np.asarray(s.cl)

    mxcp = np.zeros_like(cp)
    mxcp[1:, :] = 0.5 * (cp[1:, :] + cp[:-1, :])
    np.testing.assert_allclose(np.asarray(d["Mxcp"]), mxcp, rtol=1e-14)

    dmxt = np.zeros_like(T)
    dmxt[1:, :] = (T[1:, :] - T[:-1, :]) / h
    np.testing.assert_allclose(np.asarray(d["DmxT"]), dmxt, rtol=1e-13)

    dmycl = np.zeros_like(cl)
    dmycl[:, 1:] = (cl[:, 1:] - cl[:, :-1]) / k
    np.testing.assert_allclose(np.asarray(d["Dmycl"]), dmycl, rtol=1e-13)

    np.testing.assert_allclose(
        np.asarray(d["Dl_Mxcp"]), 2.0 * np.exp(-0.3 * mxcp), rtol=1e-14
    )
    np.testing.assert_allclose(
        np.asarray(d["dDl_Mxcp"]), -0.3 * 2.0 * np.exp(-0.3 * mxcp), rtol=1e-14
    )
    np.testing.assert_allclose(np.asarray(d["V1T"]), 0.7 * T, rtol=1e-14)
    np.testing.assert_allclose(np.asarray(d["dV1T"]), 0.7, rtol=1e-14)
    assert np.all(np.asarray(d["V2T"]) == 0)

    mxT = np.zeros_like(T)
    mxT[1:, :] = 0.5 * (T[1:, :] + T[:-1, :])
    mc = model
    dd_direct = np.asarray(mc.Dd(jnp.asarray(mxcp), jnp.asarray(mxT)))
    np.testing.assert_allclose(np.asarray(d["Dd_MxcpT"]), dd_direct, rtol=1e-14)

    # subset selection
    sub = derived_quantities(g, LOCAL_OPS, model, s, which=["MxT", "cp"])
    assert set(sub) == {"MxT", "cp"}
