from na_dd_tpu.harness.trial import (
    ErrorTimeSeries,
    run_simulation_collect_data,
    calculate_combined_error_norm,
    NumericalErrorSummary,
    MMSTrial,
)
from na_dd_tpu.harness.rates import (
    RateStatus,
    calculate_observed_rates,
    observed_rates_report,
    report_on_rates,
)
from na_dd_tpu.harness.simulate import (
    dissolved_drug_fraction,
    make_integrator,
    released_drug_fraction,
    simulate,
    simulate_adaptive,
)
from na_dd_tpu.harness.gradients import build_simulator, fit_parameters

__all__ = [
    "ErrorTimeSeries",
    "run_simulation_collect_data",
    "calculate_combined_error_norm",
    "NumericalErrorSummary",
    "MMSTrial",
    "RateStatus",
    "calculate_observed_rates",
    "observed_rates_report",
    "report_on_rates",
    "make_integrator",
    "dissolved_drug_fraction",
    "released_drug_fraction",
    "simulate",
    "simulate_adaptive",
    "build_simulator",
    "fit_parameters",
]
