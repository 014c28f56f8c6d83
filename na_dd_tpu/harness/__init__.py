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
]
