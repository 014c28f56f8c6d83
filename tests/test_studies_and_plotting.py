"""Studies driver and plotting-helper tests (small protocols for CI)."""

import os

import numpy as np
import pytest

from na_dd_tpu.harness.studies import (
    STUDIES,
    choose_krylov_unroll,
    run_eta_study,
    run_eta_study_batched,
    run_spatial_study,
)


def test_studies_registry_complete():
    """All six reference notebooks have a registered study."""
    assert set(STUDIES) == {
        "pol",
        "expsin",
        "nfsp_cpcsH2_TclcdH3",
        "nfsp_cpcsH2_TclcdH2",
        "nfsp_cpcsH1_TclcdH2",
        "peaks_fast1e1",
    }
    for cfg in STUDIES.values():
        assert "case_cls" in cfg and "spatial_Tf" in cfg and "temporal" in cfg


def test_choose_krylov_unroll_regimes():
    # benign bench regime (s ~ 0.05) -> minimal unrolled budget (measured
    # worst-case demand is ~2 iterations per solve; 8 is a 4x margin)
    assert choose_krylov_unroll(256, (1 / 256) ** 1.5, num_steps=10_000) == 8
    assert choose_krylov_unroll(256, (1 / 256) ** 1.5, num_steps=41) == 8
    # very stiff ladder -> budget grows ~sqrt(stiffness) (while_loop is
    # numerically unsafe on the TPU backend; see choose_krylov_unroll docstring)
    assert choose_krylov_unroll(200, 1.0, num_steps=10_000) == 96  # s = 160
    assert choose_krylov_unroll(200, 2.0) == 160  # s = 320: capped tier
    assert choose_krylov_unroll(256, 1e-2) == 32  # pol temporal base level


def test_krylov_unroll_platform_default(monkeypatch):
    """Constructing a PC integrator with no solver args must be safe on TPU:
    'auto' resolves to the unrolled solver there (the while_loop solver is
    numerically unsafe under TPU f64 emulation) and to the exact while_loop
    solver on CPU."""
    from types import SimpleNamespace

    import na_dd_tpu.integrators.pc_trapezoidal as pct

    # this suite runs on CPU: while_loop solver is the default
    assert pct.default_krylov_unroll() is None

    dummy_field = SimpleNamespace(model=None, grid=None)
    integ_cpu = pct.PCTrapezoidalBase(dummy_field)
    assert integ_cpu.krylov_unroll is None

    monkeypatch.setattr(pct.jax, "default_backend", lambda: "tpu")
    assert pct.default_krylov_unroll() == pct.AUTO_TPU_KRYLOV_UNROLL
    integ_tpu = pct.PCTrapezoidalBase(dummy_field)
    assert integ_tpu.krylov_unroll == pct.AUTO_TPU_KRYLOV_UNROLL
    # explicit overrides still win
    assert pct.PCTrapezoidalBase(dummy_field, krylov_unroll=16).krylov_unroll == 16
    assert pct.PCTrapezoidalBase(dummy_field, krylov_unroll=None).krylov_unroll is None
    with pytest.raises(ValueError):
        pct.PCTrapezoidalBase(dummy_field, krylov_unroll="bogus")


def test_spatial_study_small_ladder():
    res = run_spatial_study("pol", levels=3, base_N=4, verbose=False)
    assert len(res["errors"]) == 3
    assert res["errors"][0] > res["errors"][-1]
    assert len(res["rates"]) == 1


def test_eta_batched_matches_serial_small():
    etas = [10.0, 100.0]
    rb = run_eta_study_batched("pol", N=6, dt=2.5e-3, Tf=0.005, etas=etas, verbose=False)
    rs = run_eta_study("pol", N=6, dt=2.5e-3, Tf=0.005, etas=etas, verbose=False)
    np.testing.assert_allclose(rb["errors"], rs["errors"], rtol=1e-13)


def test_traced_dt_padded_scan_matches_baked():
    """The temporal-ladder compile-sharing mode (dt as a traced (1,1)
    argument + padded scan with host-side row discard) must reproduce the
    baked-constant-dt runs essentially exactly, while compiling ONE program
    for the whole ladder."""
    from na_dd_tpu.harness.studies import _make_trial, study_consts
    from na_dd_tpu.mms import cases as mms_cases

    mc = study_consts("pol")
    Tf, dts = 0.01, [2e-3, 1e-3, 5e-4]
    pad = 20  # ceil(Tf/min(dts))

    baked = _make_trial(mms_cases.MMSCasePol, 8, 50.0, mc=mc, krylov_unroll=8)
    traced = _make_trial(mms_cases.MMSCasePol, 8, 50.0, mc=mc, krylov_unroll=8)
    for dt in dts:
        eb = baked.run_for_errors(Tf=Tf, dt=dt).overall_combined_error
        et = traced.run_for_errors(
            Tf=Tf, dt=dt, traced_dt=True, pad_steps=pad
        ).overall_combined_error
        assert abs(et - eb) <= 1e-12 * abs(eb), (dt, eb, et)
    # one cached program served all three levels
    assert len(traced.integrator._sim_cache) == 1
    assert len(baked.integrator._sim_cache) == 3


def test_traced_grid_matches_baked():
    """traced_grid=True passes the Grid pytree as a jit argument instead of
    baking its ~16 metric planes into the module as N²-sized dense constants
    (which bloat compiles and overflow the remote-compile limit at N=2048).
    Same arithmetic, exactly the same result."""
    from na_dd_tpu.harness.studies import _make_trial, study_consts
    from na_dd_tpu.mms import cases as mms_cases

    mc = study_consts("pol")
    Tf, dt = 0.01, 2e-3
    baked = _make_trial(mms_cases.MMSCasePol, 8, 50.0, mc=mc, krylov_unroll=8)
    traced = _make_trial(mms_cases.MMSCasePol, 8, 50.0, mc=mc, krylov_unroll=8)
    eb = baked.run_for_errors(Tf=Tf, dt=dt).overall_combined_error
    et = traced.run_for_errors(
        Tf=Tf, dt=dt, traced_grid=True
    ).overall_combined_error
    assert abs(et - eb) <= 1e-12 * abs(eb), (eb, et)
    # composes with the temporal compile-sharing mode
    et2 = traced.run_for_errors(
        Tf=Tf, dt=dt, traced_dt=True, pad_steps=5, traced_grid=True
    ).overall_combined_error
    assert abs(et2 - eb) <= 1e-10 * abs(eb), (eb, et2)


def test_guide_exponent_sign_follows_ladder_direction():
    """Spatial ladders (x=N grows, error falls) get a NEGATIVE exponent;
    temporal ladders (x=dt shrinks level-to-level, error falls with dt) get a
    POSITIVE one — the dashed guide must run parallel to the data, not
    opposite to it."""
    from na_dd_tpu.harness.plotting import guide_exponent

    # spatial: refinement = growing N, decreasing error
    assert guide_exponent([4, 8, 16], [1e-3, 2.5e-4, 6e-5], 2.0) == -2.0
    # temporal: levels listed coarse->fine, x=dt decreasing, error decreasing
    assert guide_exponent([1e-2, 5e-3, 2.5e-3], [1e-4, 2.5e-5, 6e-6], 2.0) == 2.0
    # peaks temporal shape: leading exactly-zero levels (degenerate N=1
    # grids) must not flip the sign — infer from the last nonzero pair
    assert guide_exponent(
        [1.0, 0.5, 0.25, 0.125, 0.0625],
        [0.0, 0.0, 0.71, 0.32, 0.085],
        2.0,
    ) == 2.0


def test_plotting_helpers(tmp_path):
    matplotlib = pytest.importorskip("matplotlib")
    from na_dd_tpu.harness.plotting import plot_errors_and_rates, visualize_mms_solution
    from na_dd_tpu.mms.cases import MMSCasePol
    from na_dd_tpu.models import Model02, default_model_consts
    from na_dd_tpu.ops import make_uniform_grid

    p1 = plot_errors_and_rates(
        errors=[1e-3, 2.5e-4, 6e-5],
        rates=[2.0],
        x_values=[4, 8, 16],
        x_label="N",
        title="demo",
        expected_rate=2.0,
        save_path=str(tmp_path / "rates.png"),
    )
    assert os.path.exists(p1) and os.path.getsize(p1) > 0

    g = make_uniform_grid(8, 8)
    case = MMSCasePol(g, model=Model02(default_model_consts))
    p2 = visualize_mms_solution(case, time_point=0.1, save_path=str(tmp_path / "mms.png"))
    assert os.path.exists(p2) and os.path.getsize(p2) > 0


def test_reproduction_report_renders_adjudication_and_mode(tmp_path):
    """write_report must surface the round-4 integrity fields: the mode
    column (mixed/batched + f64 spot-check) and the CPU-x64 adjudication
    verdict, from synthetic archived study JSONs."""
    import json

    from studies.write_reproduction import write_report

    res_dir = tmp_path / "results"
    res_dir.mkdir()
    payload = {
        "study": "pol",
        "kind": "spatial",
        "errors": [4.93452e-05, 1.59616e-05, 4.38284e-09],
        "rates": [1.99],
        "steady_s": [0.1, 0.1, 0.5],
        "wallclock_s": [1.0, 1.0, 2.0],
        "max_rel_dev_vs_reference": 1.9e-6,
        "precision": "mixed",
        "batched": True,
        "f64_spotcheck": {
            "level": 2, "N": 256, "f64_error": 4.38284e-09,
            "mixed_error": 4.38284e-09, "mixed_vs_f64_rel": 3.2e-12,
            "wallclock_s": 12.0,
        },
        "adjudication": {
            "status": "ok", "level": 1, "cpu_error": 1.59616e-05,
            "reference": 1.59616e-05, "cpu_rel_dev": 2.1e-09,
            "passed": True, "tpu_rel_dev": 1.9e-6,
        },
    }
    with open(res_dir / "pol_spatial.json", "w") as f:
        json.dump(payload, f)

    out = tmp_path / "REPRO.md"
    path = write_report(
        device="test", results_dir=str(res_dir), out_path=str(out)
    )
    text = open(path).read()
    row = next(line for line in text.splitlines() if line.startswith("| pol | spatial"))
    assert "mixed batched" in row
    assert "f64 spot 3e-12" in row
    assert "L1 cpu-x64 2.1e-09 PASS" in row
    # studies without archives render as MISSING, not crash
    assert "| expsin | spatial | MISSING" in text
