from pymgrid_tpu.forecast.forecaster import (
    Forecaster,
    GaussianNoiseForecaster,
    NoForecaster,
    OracleForecaster,
    UserDefinedForecaster,
    get_forecaster,
)

__all__ = [
    "Forecaster",
    "GaussianNoiseForecaster",
    "NoForecaster",
    "OracleForecaster",
    "UserDefinedForecaster",
    "get_forecaster",
]
