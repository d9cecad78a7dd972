"""Forecasting subsystem.

API mirror of the reference forecasters (``src/pymgrid/forecast/forecaster.py``):

* ``None``            -> :class:`NoForecaster`
* ``"oracle"``        -> :class:`OracleForecaster` (true future values)
* a number            -> :class:`GaussianNoiseForecaster` (truth + N(0, std)),
  optionally with per-step increasing std ``std*(1+log(1+arange(n)))`` and/or
  std relative to the time-series mean
* a callable          -> :class:`UserDefinedForecaster` (validated, and
  auto-vectorized if scalar)

Forecast windows that run off the end of the data are padded with the
observation-space midpoint and clipped to the observation bounds
(``forecaster.py:92-149``).

In the compiled engine (:mod:`pymgrid_tpu.core`) the oracle forecast is a
dynamic slice of the HBM-resident series and gaussian noise is drawn from a
threaded ``jax.random`` key; these host classes remain the behavioral spec.
"""
import numbers

import numpy as np

from pymgrid_tpu.utils.space import ModuleSpace

__all__ = [
    "get_forecaster",
    "Forecaster",
    "NoForecaster",
    "OracleForecaster",
    "GaussianNoiseForecaster",
    "UserDefinedForecaster",
]


def get_forecaster(
    forecaster,
    observation_space,
    forecast_shape,
    time_series=None,
    increase_uncertainty=False,
    relative_noise=False,
):
    """Resolve a forecaster spec (None / "oracle" / number / callable)."""
    if forecaster is None:
        return NoForecaster(observation_space, forecast_shape)
    if isinstance(forecaster, (UserDefinedForecaster, OracleForecaster, GaussianNoiseForecaster)):
        return forecaster
    if callable(forecaster):
        return UserDefinedForecaster(forecaster, observation_space, forecast_shape, time_series)
    if forecaster == "oracle":
        return OracleForecaster(observation_space, forecast_shape)
    if isinstance(forecaster, numbers.Number) or (
        hasattr(forecaster, "dtype") and np.issubdtype(np.asarray(forecaster).dtype, np.number)
    ):
        return GaussianNoiseForecaster(
            forecaster,
            observation_space,
            forecast_shape,
            time_series=time_series,
            increase_uncertainty=increase_uncertainty,
            relative_noise=relative_noise,
        )
    raise ValueError(f"Unable to parse forecaster of type {type(forecaster)}")


class Forecaster:
    def __init__(self, observation_space, forecast_shape):
        self._observation_space = observation_space
        self._forecast_shaped_space = self._get_forecast_shaped_space(forecast_shape)
        self._fill_arr = (
            self._observation_space.unnormalized.high
            + self._observation_space.unnormalized.low
        ) / 2

    def _get_forecast_shaped_space(self, shape):
        if len(shape) == 1:
            shape = (*shape, 1)
        elif len(shape) > 2:
            raise ValueError("shape must be one- or two-dimensional.")

        n_in_forecast = shape[0] * shape[1]
        if n_in_forecast:
            low = self._observation_space.unnormalized.low[-n_in_forecast:]
            high = self._observation_space.unnormalized.high[-n_in_forecast:]
        else:
            low, high = np.array([]), np.array([])

        return ModuleSpace(
            unnormalized_low=low.reshape(shape),
            unnormalized_high=high.reshape(shape),
            shape=shape,
        )

    def _forecast(self, val_c, val_c_n, n):
        raise NotImplementedError

    def _pad(self, forecast, n):
        """Pad an off-end forecast with the obs-space midpoint rows."""
        if forecast.shape[0] == n:
            return forecast
        pad_amount = n - forecast.shape[0]
        pad = self._fill_arr.reshape((-1, forecast.shape[1]))[-pad_amount:]
        if pad.shape[0] < pad_amount:
            raise RuntimeError(
                "Attempting to pad a forecast to a value larger than the "
                "module's observation space implies."
            )
        return np.concatenate((forecast, pad))

    def full_pad(self, shape, forecast_horizon):
        if forecast_horizon is None:
            return None
        empty = np.array([]).reshape((0, shape[1]))
        return self._pad(empty, forecast_horizon)

    def _clip(self, forecast):
        lb = self._forecast_shaped_space.unnormalized.low[-forecast.shape[0]:]
        ub = self._forecast_shaped_space.unnormalized.high[-forecast.shape[0]:]
        forecast = np.array(forecast)
        lt, gt = forecast < lb, forecast > ub
        forecast[lt] = lb[lt]
        forecast[gt] = ub[gt]
        return forecast

    @property
    def observation_space(self):
        return self._observation_space

    @observation_space.setter
    def observation_space(self, value):
        self._observation_space = value
        self._fill_arr = (
            self._observation_space.unnormalized.high
            + self._observation_space.unnormalized.low
        ) / 2
        n_components = self._forecast_shaped_space.shape[1]
        new_shape = (
            int((value.shape[0] - n_components) / n_components),
            n_components,
        )
        self._forecast_shaped_space = self._get_forecast_shaped_space(new_shape)

    def __call__(self, val_c, val_c_n, n):
        if len(val_c_n.shape) == 1:
            val_c_n = val_c_n.reshape((-1, 1))
        if val_c_n.shape[0] > self._forecast_shaped_space.shape[0]:
            raise RuntimeError(
                f"val_c_n shape {val_c_n.shape} is too large for space "
                f"{self._forecast_shaped_space.shape}"
            )
        forecast = self._forecast(val_c, val_c_n, n)
        if forecast is None:
            return None
        forecast = self._pad(forecast, n)
        forecast = self._clip(forecast)
        assert forecast.shape == (n, val_c_n.shape[1])
        return forecast

    def __eq__(self, other):
        if type(self) != type(other):
            return NotImplemented
        return (np.asarray(self._fill_arr) == np.asarray(other._fill_arr)).all() and all(
            v == other.__dict__[k] for k, v in self.__dict__.items() if k != "_fill_arr"
        )

    def __repr__(self):
        return self.__class__.__name__


class NoForecaster(Forecaster):
    def _forecast(self, val_c, val_c_n, n):
        return None


class OracleForecaster(Forecaster):
    def _forecast(self, val_c, val_c_n, n):
        return val_c_n


class GaussianNoiseForecaster(Forecaster):
    """Truth plus gaussian noise drawn from the *global numpy RNG* (matching
    the reference's seeding semantics, ``forecaster.py:252-263``)."""

    def __init__(
        self,
        noise_std,
        observation_space,
        forecast_shape,
        time_series=None,
        increase_uncertainty=False,
        relative_noise=False,
    ):
        super().__init__(observation_space, forecast_shape)
        self.input_noise_std = noise_std
        self.increase_uncertainty = increase_uncertainty
        self.relative_noise = relative_noise
        self._noise_size = self._forecast_shaped_space.shape
        self._noise_std = self._get_noise_std(time_series)

    def _get_noise_std(self, time_series):
        scalar_val = self.input_noise_std
        if self.relative_noise:
            if time_series is None:
                raise ValueError("Must pass time_series if relative_noise is True.")
            scalar_val = scalar_val * np.abs(time_series.mean())
        if self.increase_uncertainty:
            return scalar_val * np.outer(
                1 + np.log(1 + np.arange(self._noise_size[0])),
                np.ones(self._noise_size[-1]),
            )
        return scalar_val

    def _get_noise(self, size):
        try:
            return np.random.normal(scale=self._noise_std, size=size)
        except ValueError:
            noise_std = self._noise_std[: size[0], :]
            if noise_std.shape != size:
                raise RuntimeError(
                    f"Cannot broadcast shapes {self._noise_std.shape} and {size}."
                )
            return np.random.normal(scale=noise_std, size=size)

    def _forecast(self, val_c, val_c_n, n):
        return val_c_n + self._get_noise(val_c_n.shape).reshape(val_c_n.shape)

    @property
    def noise_std(self):
        return self._noise_std

    def __repr__(self):
        return (
            f"GaussianNoiseForecaster(noise_std={self.input_noise_std}, "
            f"increase_uncertainty={self.increase_uncertainty})"
        )


class UserDefinedForecaster(Forecaster):
    """Wrap a user callable ``f(val_c, val_c_n, n)``; validated on a sample of
    the series for output shape/sign, and vectorized if it is scalar-only."""

    def __init__(self, forecaster_function, observation_space, forecast_shape, time_series):
        self.is_vectorized_forecaster, self.cast_to_arr = _validate_callable_forecaster(
            forecaster_function, time_series
        )
        if not self.is_vectorized_forecaster:
            forecaster_function = vectorize_scalar_forecaster(forecaster_function)
        self._forecaster = forecaster_function
        super().__init__(observation_space, forecast_shape)

    def _cast(self, forecast, val_c_n):
        if self.cast_to_arr:
            return np.array(forecast).reshape(val_c_n.shape)
        return forecast

    def _forecast(self, val_c, val_c_n, n):
        return self._cast(self._forecaster(val_c, val_c_n, n), val_c_n)


def _validate_callable_forecaster(forecaster, time_series):
    val_c = time_series[0]
    n = np.random.randint(2, len(time_series))
    vector_true_forecast = time_series[:n]
    try:
        cast_to_arr = _validate_vectorized_forecaster(
            forecaster, val_c, vector_true_forecast, n
        )
        return True, cast_to_arr
    except NotImplementedError:
        scalar_true_forecast = vector_true_forecast[-1]
        _validate_scalar_forecaster(forecaster, val_c, scalar_true_forecast, n)
        return False, False


def _validate_vectorized_forecaster(forecaster, val_c, vector_true_forecast, n):
    try:
        vectorized_forecast = forecaster(val_c, vector_true_forecast, n)
    except Exception as e:
        raise NotImplementedError(
            "Unable to call forecaster with vector inputs. "
            f"\nFunc call forecaster(val_c={val_c}, val_c_n={vector_true_forecast}, n={n})"
            f"\nraised {type(e).__name__}: {e}"
        ) from e

    if not hasattr(vectorized_forecast, "size"):
        vectorized_forecast = np.array(vectorized_forecast)
        cast_to_arr = True
    else:
        cast_to_arr = False

    try:
        vectorized_forecast = vectorized_forecast.reshape(vector_true_forecast.shape)
    except ValueError:
        raise ValueError(
            f"Forecaster output of shape {vectorized_forecast.shape} cannot be "
            f"casted to necessary forecast shape {vector_true_forecast.shape}"
        )

    for i, (forecast, true_forecast) in enumerate(
        zip(vectorized_forecast, vector_true_forecast)
    ):
        try:
            _validate_forecasted_value(forecast, true_forecast, val_c, n)
        except Exception as e:
            raise type(e)(f"Failed validating forecast at position {i} due to exception {e}") from e

    return cast_to_arr


def _validate_scalar_forecaster(forecaster, val_c, scalar_true_forecast, n):
    try:
        scalar_forecast = forecaster(val_c, scalar_true_forecast, n)
    except Exception as e_scalar:
        raise ValueError(
            "Unable to call forecaster with scalar inputs. "
            f"\nFunc call forecaster(val_c={val_c}, val_c_plus_n={scalar_true_forecast}, n={n})"
            f"\nraised {type(e_scalar).__name__}: {e_scalar}"
        ) from e_scalar

    if isinstance(scalar_forecast, numbers.Number):
        scalar_forecast_item = scalar_forecast
    else:
        try:
            scalar_forecast_item = scalar_forecast.item()
        except (ValueError, AttributeError):
            raise ValueError(
                "Unable to validate forecaster. Forecaster must return scalar "
                f"output with scalar input but returned {scalar_forecast}"
            )
    _validate_forecasted_value(scalar_forecast_item, scalar_true_forecast, val_c, n)


def _validate_forecasted_value(forecaster_output, true_forecast, val_c, n):
    if not np.issubdtype(np.array(forecaster_output).dtype, np.number):
        raise TypeError(
            "Unable to validate forecaster. Forecaster must return numeric "
            f"np.ndarray or number but returned output of type "
            f"{np.array(forecaster_output).dtype}: {forecaster_output}"
        )
    if not (forecaster_output * true_forecast >= 0):
        raise ValueError(
            "Unable to validate forecaster. Forecaster must return output of "
            f"same sign (or zero) as input but returned output {forecaster_output} "
            f"with inputs val_c={val_c}, val_c_plus_n={true_forecast}, n={n}"
        )


def vectorize_scalar_forecaster(forecaster):
    def vectorized(val_c, val_c_n, n):
        if n != len(val_c_n):
            raise ValueError(
                f"Incompatible true values length ({val_c_n}) to forecast {n}-steps ahead."
            )
        out = np.array(
            [forecaster(val_c, v, n_i) for n_i, v in enumerate(val_c_n)]
        )
        try:
            shape = (-1, out.shape[1])
        except IndexError:
            shape = (-1, 1)
        return out.reshape(shape)

    return vectorized
