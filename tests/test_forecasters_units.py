"""Forecaster unit tests mirroring the reference
(``tests/microgrid/forecaster_tests/test_forecaster.py``)."""
import numpy as np
import pytest

from pymgrid_tpu.forecast import (
    GaussianNoiseForecaster,
    NoForecaster,
    OracleForecaster,
    UserDefinedForecaster,
    get_forecaster,
)
from pymgrid_tpu.modules import RenewableModule, LoadModule


def _module(horizon=5, forecaster="oracle", n=60, **kwargs):
    ts = np.arange(1.0, n + 1)
    return RenewableModule(
        time_series=ts, forecaster=forecaster, forecast_horizon=horizon, **kwargs
    )


def test_factory_dispatch():
    mod = _module()
    space = mod.observation_space
    assert isinstance(get_forecaster(None, space, (0, 1)), NoForecaster)
    assert isinstance(get_forecaster("oracle", space, (5, 1)), OracleForecaster)
    g = get_forecaster(1.5, space, (5, 1), time_series=mod.time_series)
    assert isinstance(g, GaussianNoiseForecaster)
    with pytest.raises(ValueError):
        get_forecaster("bogus", space, (5, 1))


def test_oracle_forecast_values():
    mod = _module(horizon=4)
    np.testing.assert_array_equal(
        mod.forecast().reshape(-1), mod.time_series[1:5].reshape(-1)
    )
    mod.step(0.0, normalized=False)
    np.testing.assert_array_equal(
        mod.forecast().reshape(-1), mod.time_series[2:6].reshape(-1)
    )


def test_off_end_padding_is_midpoint():
    mod = _module(horizon=5, n=10)
    for _ in range(7):
        mod.step(0.0, normalized=False)
    fc = mod.forecast().reshape(-1)
    fill = (mod.observation_space.low[0] + mod.observation_space.high[0]) / 2
    np.testing.assert_array_equal(fc[:2], mod.time_series[8:10].reshape(-1))
    np.testing.assert_array_equal(fc[2:], [fill] * 3)


def test_gaussian_statistics_and_clipping():
    np.random.seed(0)
    mod = _module(horizon=8, forecaster=0.5)
    fcs = []
    for _ in range(30):
        fcs.append(mod.forecast().reshape(-1))
    fcs = np.stack(fcs)
    true = mod.time_series[1:9].reshape(-1)
    assert np.abs(fcs.mean(axis=0) - true).max() < 0.5
    # clipped to obs bounds
    assert fcs.min() >= mod.observation_space.low[0]
    assert fcs.max() <= mod.observation_space.high[0]


def test_gaussian_increasing_uncertainty():
    np.random.seed(1)
    mod = _module(horizon=10, forecaster=1.0,
                  forecaster_increase_uncertainty=True)
    std = mod.forecaster.noise_std
    assert std.shape == (10, 1)
    assert (np.diff(std[:, 0]) > 0).all()
    np.testing.assert_allclose(
        std[:, 0], 1.0 * (1 + np.log(1 + np.arange(10)))
    )


def test_gaussian_relative_noise():
    mod = _module(horizon=3, forecaster=0.1, forecaster_relative_noise=True)
    expected = 0.1 * np.abs(mod.time_series[: mod.final_step].mean())
    assert mod.forecaster.noise_std == pytest.approx(expected)


def test_user_defined_vectorized():
    mod = _module(horizon=4, forecaster=lambda val_c, val_c_n, n: val_c_n * 1.0)
    assert isinstance(mod.forecaster, UserDefinedForecaster)
    assert mod.forecaster.is_vectorized_forecaster
    np.testing.assert_array_equal(
        mod.forecast().reshape(-1), mod.time_series[1:5].reshape(-1)
    )


def test_user_defined_scalar_is_vectorized():
    def scalar_forecaster(val_c, val_c_n, n):
        if hasattr(val_c_n, "__len__") and np.size(val_c_n) > 1:
            raise TypeError("scalar only")
        return float(val_c_n)

    mod = _module(horizon=4, forecaster=scalar_forecaster)
    assert not mod.forecaster.is_vectorized_forecaster
    np.testing.assert_array_equal(
        mod.forecast().reshape(-1), mod.time_series[1:5].reshape(-1)
    )


def test_user_defined_sign_validation():
    with pytest.raises(ValueError):
        _module(horizon=4, forecaster=lambda val_c, val_c_n, n: -np.abs(val_c_n))


def test_set_forecaster_and_horizon():
    mod = _module(horizon=0, forecaster=None)
    assert mod.forecast() is None
    mod.set_forecaster("oracle", forecast_horizon=6)
    assert mod.forecast_horizon == 6
    assert mod.observation_space.shape == (7,)
    assert mod.forecast().shape == (6, 1)


def test_load_negative_forecasts():
    ts = 10 * np.random.RandomState(2).rand(40)
    load = LoadModule(time_series=ts, forecaster="oracle", forecast_horizon=3)
    fc = load.forecast()
    assert (fc <= 0).all()
    np.testing.assert_allclose(fc.reshape(-1), -ts[1:4])
