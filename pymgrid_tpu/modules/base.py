"""Base microgrid module classes (host layer).

API mirror of the reference's module base classes
(``src/pymgrid/modules/base/base_module.py:17`` and
``modules/base/timeseries/base_timeseries_module.py:8``), re-implemented on
top of :mod:`pymgrid_tpu.core.physics`.  These classes hold per-module scalar
state in numpy float64 and implement the exact step semantics of the
reference; the compiled engine (:mod:`pymgrid_tpu.core`) extracts their
parameters into struct-of-arrays pytrees for batched TPU execution.
"""
import inspect
from warnings import warn

import numpy as np
import yaml

from pymgrid_tpu.core import physics
from pymgrid_tpu.utils.logger import ModularLogger
from pymgrid_tpu.utils.space import ModuleSpace
from pymgrid_tpu.utils.serialize import (
    PymgridDumper,
    PymgridLoader,
    yaml_dump,
    yaml_load,
    add_numpy_pandas_representers,
    add_numpy_pandas_constructors,
    dump_data,
)

__all__ = ["BaseMicrogridModule", "BaseTimeSeriesMicrogridModule"]

DEFAULT_HORIZON = 23
"""Default forecast horizon in steps (reference: ``microgrid/__init__.py:1``)."""


class BaseMicrogridModule(yaml.YAMLObject):
    """Abstract microgrid module.

    A module is a small state machine stepped once per time tick.  A positive
    unnormalized action makes the module act as an energy *source*; a negative
    action as a *sink*; zero dispatches to the source path when the module is
    a source (``base_module.py:161-171``).
    """

    module_type = None
    yaml_tag = None
    yaml_dumper = PymgridDumper
    yaml_loader = PymgridLoader

    _energy_pos = 0

    def __init__(
        self,
        raise_errors,
        initial_step=0,
        provided_energy_name="provided_energy",
        absorbed_energy_name="absorbed_energy",
    ):
        self.raise_errors = raise_errors
        self.initial_step = initial_step
        self._current_step = initial_step
        self._action_space = self._get_action_spaces()
        self._observation_space = self._get_observation_spaces()
        self.provided_energy_name = provided_energy_name
        self.absorbed_energy_name = absorbed_energy_name
        self._logger = ModularLogger()
        self.name = (None, None)  # assigned by the module container

    # ------------------------------------------------------------------ spaces
    def _get_action_spaces(self):
        low = self.min_act if isinstance(self.min_act, np.ndarray) else np.array([self.min_act])
        high = self.max_act if isinstance(self.max_act, np.ndarray) else np.array([self.max_act])
        return ModuleSpace(unnormalized_low=low, unnormalized_high=high)

    def _get_observation_spaces(self):
        low = self.min_obs if isinstance(self.min_obs, np.ndarray) else np.array([self.min_obs])
        high = self.max_obs if isinstance(self.max_obs, np.ndarray) else np.array([self.max_obs])
        return ModuleSpace(unnormalized_low=low, unnormalized_high=high)

    # ------------------------------------------------------------------ stepping
    def reset(self):
        """Rewind to the initial step, flush the log, return normalized obs."""
        self._update_step(reset=True)
        self._logger.flush()
        return self.to_normalized(self.state, obs=True)

    def step(self, action, normalized=True):
        """Advance the module one tick with an energy request.

        Returns the 4-tuple ``(normalized_obs, reward, done, info)``;
        ``info`` carries ``provided_energy`` or ``absorbed_energy``
        (``base_module.py:95-159``).
        """
        denormalized_action = (
            self._action_space.denormalize(action) if normalized else action
        )

        try:
            denormalized_action = denormalized_action[self._energy_pos]
        except (IndexError, TypeError):
            if not isinstance(denormalized_action, (float, int)):
                try:
                    flat_dim = np.prod(denormalized_action.shape)
                    assert flat_dim == 0
                except (AttributeError, AssertionError):
                    raise ValueError(f"Bad action {denormalized_action}")
                else:
                    denormalized_action = 0.0

        state_dict = self.state_dict()
        reward, done, info = self._unnormalized_step(denormalized_action)
        self._log(state_dict, reward=reward, **info)
        self._update_step()

        obs = self.to_normalized(self.state, obs=True)
        return obs, reward, done, info

    def _unnormalized_step(self, unnormalized_action):
        if unnormalized_action > 0:
            return self.as_source(unnormalized_action)
        elif unnormalized_action < 0:
            return self.as_sink(-1.0 * unnormalized_action)
        if self.is_source:
            return self.as_source(unnormalized_action)
        assert self.is_sink
        return self.as_sink(-1.0 * unnormalized_action)

    def as_source(self, energy_demand):
        """Provide ``energy_demand`` to the microgrid, clipped to the module's
        current production bounds unless ``raise_errors``."""
        assert energy_demand >= 0
        assert self.is_source, (
            f"step() was called with positive energy (source) for module {self} "
            f"but module is not a source and can only be called with negative energy."
        )

        if self.module_type[-1] == "fixed":
            return self.update(None, as_source=True)

        if energy_demand > self.max_production:
            if self.raise_errors:
                self._raise_error(energy_demand, self.max_production, as_source=True)
            provided_energy = self.max_production
        elif energy_demand < self.min_production:
            if self.raise_errors:
                self._raise_error(
                    energy_demand, self.min_production, as_source=True, lower_bound=True
                )
            provided_energy = self.min_production
        else:
            provided_energy = energy_demand

        return self.update(provided_energy, as_source=True)

    def as_sink(self, energy_excess):
        """Absorb ``energy_excess`` from the microgrid, clipped to
        ``max_consumption`` unless ``raise_errors``."""
        assert energy_excess >= 0

        if self.module_type[-1] == "fixed":
            return self.update(None, as_sink=True)

        if energy_excess > self.max_consumption:
            if self.raise_errors:
                self._raise_error(energy_excess, self.max_consumption, as_sink=True)
            absorbed_energy = self.max_consumption
        else:
            absorbed_energy = energy_excess

        assert absorbed_energy >= 0
        return self.update(absorbed_energy, as_sink=True)

    def _raise_error(self, ask_value, available_value, as_source=False, as_sink=False, lower_bound=False):
        assert as_source + as_sink == 1
        name = self.__class__.__name__
        ask_v, available_v = round(ask_value, 2), round(available_value, 2)
        if as_source:
            if lower_bound:
                raise ValueError(
                    f"Module {name} unable to supply requested value {ask_v} as a "
                    f"source. Must supply at least: {available_v}."
                )
            raise ValueError(
                f"Module {name} unable to supply requested value {ask_v} as a "
                f"source. Max currently available: {available_v}."
            )
        raise ValueError(
            f"Module {name} unable to absorb requested value {ask_v} as a sink. "
            f"Max currently capable of absorbing: {available_v}."
        )

    def update(self, external_energy_change, as_source=False, as_sink=False):
        """Apply the (clipped) energy exchange; return (reward, done, info)."""
        raise NotImplementedError

    def _log(self, state_dict_pre_step, provided_energy=None, absorbed_energy=None, **info):
        _info = info.copy()
        if self.provided_energy_name is not None:
            _info[self.provided_energy_name] = (
                provided_energy if provided_energy is not None else 0.0
            )
        else:
            assert provided_energy is None, (
                "Cannot log provided_energy with NoneType provided_energy_name."
            )
        if self.absorbed_energy_name is not None:
            _info[self.absorbed_energy_name] = (
                absorbed_energy if absorbed_energy is not None else 0.0
            )
        else:
            assert absorbed_energy is None, (
                "Cannot log absorbed_energy with NoneType absorbed_energy_name."
            )
        _info.update(state_dict_pre_step)
        self._logger.log(**_info)

    def _update_step(self, reset=False):
        if reset:
            self._current_step = self.initial_step
        else:
            self._current_step += 1

    def sample_action(self, strict_bound=False):
        """Sample a normalized action uniformly; with ``strict_bound``, bound
        it by current instantaneous production/consumption limits."""
        min_bound, max_bound = 0, 1
        if strict_bound:
            if self.is_sink:
                min_bound = self._action_space.normalize(-1 * self.max_consumption)
                if np.isnan(min_bound):
                    min_bound = 0
            if self.is_source:
                max_bound = self._action_space.normalize(self.max_production)
                if np.isnan(max_bound):
                    max_bound = 0
        return np.random.rand() * (max_bound - min_bound) + min_bound

    # ------------------------------------------------------------------ state
    def to_normalized(self, value, act=False, obs=False):
        assert act + obs == 1
        space = self._action_space if act else self._observation_space
        return space.normalize(value)

    def from_normalized(self, value, act=False, obs=False):
        assert act + obs == 1
        space = self._action_space if act else self._observation_space
        return space.denormalize(value)

    def state_dict(self, normalized=False):
        if normalized:
            return dict(
                zip(
                    self.state_dict().keys(),
                    np.atleast_1d(self._observation_space.normalize(self.state)),
                )
            )
        return self._state_dict()

    def _state_dict(self):
        raise NotImplementedError

    @property
    def state(self):
        return np.array([*self.state_dict().values()])

    @property
    def current_step(self):
        return self._current_step

    @current_step.setter
    def current_step(self, value):
        self._current_step = value

    # ------------------------------------------------------------------ logging
    def log_dict(self):
        return self._logger.to_dict()

    def log_frame(self):
        return self._logger.to_frame()

    @property
    def log(self):
        return self.log_frame()

    @property
    def logger(self):
        return self._logger

    @logger.setter
    def logger(self, logger):
        assert isinstance(logger, ModularLogger)
        self._logger = logger

    @property
    def logger_last(self):
        return {k: v[-1] for k, v in self._logger}

    # ------------------------------------------------------------------ bounds
    @property
    def min_obs(self):
        raise NotImplementedError

    @property
    def max_obs(self):
        raise NotImplementedError

    @property
    def min_act(self):
        raise NotImplementedError

    @property
    def max_act(self):
        raise NotImplementedError

    @property
    def min_production(self):
        return 0

    @property
    def max_production(self):
        return NotImplemented

    @property
    def max_consumption(self):
        return NotImplemented

    @property
    def marginal_cost(self):
        return self.production_marginal_cost

    @property
    def production_marginal_cost(self):
        return 0.0

    @property
    def absorption_marginal_cost(self):
        return 0.0

    @property
    def action_space(self):
        return self._action_space

    @property
    def observation_space(self):
        return self._observation_space

    @property
    def is_source(self):
        return False

    @property
    def is_sink(self):
        return False

    # ------------------------------------------------------------------ yaml
    def dump(self, stream=None):
        """Serialize to YAML; sidecar ``.csv.gz`` files are used when dumping
        to a named file stream (see :mod:`pymgrid_tpu.utils.serialize`)."""
        return yaml_dump(self, stream=stream)

    @classmethod
    def load(cls, stream):
        return yaml_load(stream)

    @classmethod
    def to_yaml(cls, dumper, data):
        add_numpy_pandas_representers()
        return dumper.represent_mapping(
            cls.yaml_tag, data.serialize(dumper.stream), flow_style=cls.yaml_flow_style
        )

    @classmethod
    def from_yaml(cls, loader, node):
        add_numpy_pandas_constructors()
        mapping = loader.construct_mapping(node, deep=True)
        instance = cls.deserialize_instance(mapping["cls_params"])
        instance.logger = instance.logger.from_raw(mapping.get("log"))
        instance.name = tuple(mapping["name"])
        return instance.deserialize(mapping["state"])

    def serialize(self, dumper_stream):
        data = {
            "name": self.name,
            "cls_params": self._serialize_cls_params(),
            "state": self._serialize_state_attributes(),
            **self._logger.serialize("log"),
        }
        return dump_data(data, dumper_stream, self.yaml_tag)

    def serializable_state_attributes(self):
        return ["_current_step", *self.state_dict().keys()]

    def _serialize_state_attributes(self):
        return {attr: getattr(self, attr) for attr in self.serializable_state_attributes()}

    def _serialize_cls_params(self):
        serialized = {}
        for p_name in inspect.signature(self.__init__).parameters:
            try:
                serialized[p_name] = getattr(self, p_name)
            except AttributeError:
                raise AttributeError(
                    f"Module {self.__class__.__name__} must have attribute/property "
                    f"'{p_name}' corresponding to class parameter of the same name."
                )
        return serialized

    @classmethod
    def deserialize_instance(cls, param_dict):
        param_dict = param_dict.copy()
        cls_kwargs, missing, defaults = {}, [], []
        for p_name, p_value in inspect.signature(cls).parameters.items():
            try:
                cls_kwargs[p_name] = param_dict.pop(p_name)
            except KeyError:
                if p_value.default is p_value.empty:
                    missing.append(p_name)
                else:
                    cls_kwargs[p_name] = p_value.default
                    defaults.append(p_name)
        if defaults:
            warn(f"Missing parameter values {defaults} for {cls}. Using available default values.")
        if missing:
            raise KeyError(
                f"Missing parameter values {missing} for {cls} with no default values available."
            )
        return cls(**cls_kwargs)

    def deserialize(self, serialized_dict):
        serialized_dict = serialized_dict.copy()
        for attr_name in self.serializable_state_attributes():
            if not hasattr(self, attr_name):
                raise ValueError(
                    f"Key {attr_name} is not an attribute of module {self} and cannot be set."
                )
            try:
                setattr(self, attr_name, serialized_dict.pop(attr_name))
            except KeyError:
                raise KeyError(f"Missing key {attr_name} in deserialized dict.")
        if serialized_dict:
            warn(f"Unused keys in serialized_dict: {list(serialized_dict.keys())}")
        return self

    def __eq__(self, other):
        if type(self) != type(other):
            return NotImplemented
        diff = [
            (k1, v1, v2)
            for (k1, v1), (k2, v2) in zip(self.__dict__.items(), other.__dict__.items())
            if (
                (hasattr(v1, "any") and not np.allclose(v1, v2))
                or (not hasattr(v1, "any") and v1 != v2)
            )
        ]
        return len(diff) == 0

    def __repr__(self):
        params = {p: getattr(self, p, None) for p in inspect.signature(self.__init__).parameters}
        param_repr = ", ".join(
            f"{p}={type(v) if hasattr(v, '__len__') and not isinstance(v, str) else v}"
            for p, v in params.items()
        )
        return f"{self.__class__.__name__}({param_repr})"


class BaseTimeSeriesMicrogridModule(BaseMicrogridModule):
    """Module driven by a ``(T, n_features)`` time series.

    Sinks store their series negative, sources positive
    (``base_timeseries_module.py:68-79``); observations are the current row
    plus the forecast window flattened row-major.
    """

    state_components = None

    def __init__(
        self,
        time_series,
        raise_errors,
        forecaster=None,
        forecast_horizon=DEFAULT_HORIZON,
        forecaster_increase_uncertainty=False,
        forecaster_relative_noise=False,
        initial_step=0,
        final_step=-1,
        provided_energy_name="provided_energy",
        absorbed_energy_name="absorbed_energy",
    ):
        from pymgrid_tpu.forecast.forecaster import get_forecaster

        self._time_series = self._set_time_series(time_series)
        self._min_obs, self._max_obs, self._min_act, self._max_act = self._get_bounds()

        self.final_step = final_step

        self._forecast_param = forecaster
        self._forecast_horizon = forecast_horizon * (forecaster is not None)
        self._forecaster = get_forecaster(
            forecaster,
            self._get_observation_spaces(),
            forecast_shape=(self.forecast_horizon, len(self.state_components)),
            time_series=self.time_series[initial_step : self.final_step, :],
            increase_uncertainty=forecaster_increase_uncertainty,
            relative_noise=forecaster_relative_noise,
        )

        self._state_dict_keys = self._set_state_dict_keys()

        super().__init__(
            raise_errors,
            initial_step=initial_step,
            provided_energy_name=provided_energy_name,
            absorbed_energy_name=absorbed_energy_name,
        )

        self._current_forecast = self.forecast()

    def _set_time_series(self, time_series):
        _time_series = np.array(time_series, dtype=np.float64)
        try:
            shape = (-1, _time_series.shape[1])
        except IndexError:
            shape = (-1, 1)
        _time_series = _time_series.reshape(shape)
        assert len(_time_series) == len(time_series)
        return self._sign_check(_time_series)

    def _sign_check(self, time_series):
        if self.is_source and self.is_sink:
            return time_series
        if not ((np.sign(time_series) <= 0).all() or (np.sign(time_series) >= 0).all()):
            raise ValueError(
                "time_series cannot contain both positive and negative values "
                "unless it is both a source and a sink."
            )
        return np.abs(time_series) if self.is_source else -np.abs(time_series)

    def _get_bounds(self):
        _min, _max = np.min(self._time_series), np.max(self._time_series)
        if _min > 0:
            _min = 0
        elif _max < 0:
            _max = 0
        return _min, _max, _min, _max

    def _set_state_dict_keys(self):
        return {
            "current": [f"{c}_current" for c in self.state_components],
            "forecast": [
                f"{c}_forecast_{j}"
                for j in range(self._forecast_horizon)
                for c in self.state_components
            ],
        }

    def _update_step(self, reset=False):
        super()._update_step(reset=reset)
        self._current_forecast = self.forecast()

    def forecast(self):
        """Forecast window starting one step ahead (or None without a
        forecaster); off-end windows are midpoint-padded by the forecaster."""
        val_c_n = self.time_series[
            1 + self.current_step : 1 + self.current_step + self.forecast_horizon, :
        ]
        try:
            val_c = self.time_series[self.current_step, :]
        except IndexError:
            forecast = self._forecaster.full_pad(
                self.time_series.shape, self._forecast_horizon
            )
        else:
            forecast = self._forecaster(val_c=val_c, val_c_n=val_c_n, n=self.forecast_horizon)
        return None if forecast is None else forecast

    def _done(self):
        return self._current_step >= self._final_step - 1

    @property
    def current_obs(self):
        try:
            return self.time_series[self.current_step, :]
        except IndexError:
            return self._forecaster.full_pad(self.time_series.shape, 1).reshape(-1)

    @property
    def time_series(self):
        return self._time_series

    @time_series.setter
    def time_series(self, value):
        self._time_series = self._set_time_series(value)
        self._min_obs, self._max_obs, self._min_act, self._max_act = self._get_bounds()
        self._action_space = self._get_action_spaces()
        self._observation_space = self._get_observation_spaces()

    @property
    def min_obs(self):
        return np.repeat(
            np.array(self._min_obs).reshape((-1, 1)), 1 + self._forecast_horizon, axis=1
        ).T.reshape(-1)

    @property
    def max_obs(self):
        return np.repeat(
            np.array(self._max_obs).reshape((-1, 1)), 1 + self._forecast_horizon, axis=1
        ).T.reshape(-1)

    @property
    def min_act(self):
        return self._min_act

    @property
    def max_act(self):
        return self._max_act

    @property
    def forecaster(self):
        return self._forecaster

    def set_forecaster(
        self,
        forecaster,
        forecast_horizon=DEFAULT_HORIZON,
        forecaster_increase_uncertainty=False,
        forecaster_relative_noise=False,
    ):
        from pymgrid_tpu.forecast.forecaster import get_forecaster

        self.forecast_horizon = forecast_horizon * (forecaster is not None)
        self._forecaster = get_forecaster(
            forecaster,
            self._observation_space,
            (self.forecast_horizon, len(self.state_components)),
            self.time_series[self.initial_step : self._final_step, :],
            increase_uncertainty=forecaster_increase_uncertainty,
            relative_noise=forecaster_relative_noise,
        )

    @property
    def forecast_horizon(self):
        return self._forecast_horizon

    @forecast_horizon.setter
    def forecast_horizon(self, value):
        from pymgrid_tpu.forecast.forecaster import NoForecaster, OracleForecaster

        self._forecast_horizon = value
        self._state_dict_keys = self._set_state_dict_keys()
        self._observation_space = self._get_observation_spaces()

        if value > 0 and isinstance(self._forecaster, NoForecaster):
            warn(
                "Setting forecast_horizon requires a non-null forecaster. "
                "Implementing OracleForecaster."
            )
            self._forecaster = OracleForecaster(
                self._observation_space,
                forecast_shape=(value, len(self.state_components)),
            )
        self._forecaster.observation_space = self._observation_space

    @property
    def forecaster_increase_uncertainty(self):
        return getattr(self._forecaster, "increase_uncertainty", False)

    @property
    def forecaster_relative_noise(self):
        return getattr(self._forecaster, "relative_noise", False)

    @property
    def final_step(self):
        return self._final_step

    @final_step.setter
    def final_step(self, value):
        if not value // 1 == value:
            raise ValueError("final_step value must be an integer.")
        if value <= 0:
            self._final_step = len(self)
        else:
            self._final_step = value
        try:
            if self._final_step <= self.initial_step:
                raise ValueError("final_step value must be greater than initial_step")
        except AttributeError:
            pass

    def _state_dict(self):
        state_dict = dict(zip(self._state_dict_keys["current"], self.current_obs))
        if self._current_forecast is not None:
            state_dict.update(
                zip(self._state_dict_keys["forecast"], self._current_forecast.reshape(-1))
            )
        return state_dict

    def serialize(self, dumper_stream):
        data = super().serialize(dumper_stream)
        data["cls_params"]["forecaster"] = self._forecast_param
        return data

    def serializable_state_attributes(self):
        return ["_current_step"]

    def deserialize(self, serialized_dict):
        # refresh the realized forecast for the restored step (the reference
        # leaves the construction-time forecast in place, so a module
        # serialized mid-episode would observe a stale window)
        out = super().deserialize(serialized_dict)
        self._current_forecast = self.forecast()
        return out

    def __len__(self):
        return self._time_series.shape[0]
