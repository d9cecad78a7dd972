"""Sample generators for stochastic MPC (SAA).

Mirror of ``src/pymgrid/utils/DataGenerator.py``:

* :class:`NoisyPVData` — fits seasonal upper/lower quantile curves to daily
  PV maxima (cos/sin features), rebuilds each day as a quadratic
  dawn-peak-dusk curve with a randomized peak, plus optional gaussian noise.
  Quantile regression is solved exactly as an LP with scipy/HiGHS (the
  reference uses statsmodels' IRLS ``QuantReg``, not available here).
* :class:`NoisyLoadData` — gaussian noise around day-of-week hourly means.
* :class:`NoisyGridData` — naive or 2-state Markov-chain outage resampling.
* :class:`SampleGenerator` — forecast creation, MAPE validation and batched
  sampling on a legacy (nonmodular) microgrid.
"""
import numpy as np
import pandas as pd
from scipy.interpolate import interp1d

__all__ = [
    "return_underlying_data",
    "quantile_regression_fit",
    "NoisyPVData",
    "NoisyLoadData",
    "NoisyGridData",
    "SampleGenerator",
    "ForecastArgSet",
    "ForecastArgs",
]


def return_underlying_data(microgrid):
    """(pv, load, grid) frame from a legacy microgrid
    (``DataGenerator.py:30-59``)."""
    pv_data = microgrid._pv_ts
    load_data = microgrid._load_ts

    pv_data = pv_data[pv_data.columns[0]]
    load_data = load_data[load_data.columns[0]]
    pv_data.name = "pv"
    load_data.name = "load"

    if microgrid.architecture["grid"] != 0:
        grid_data = microgrid._grid_status_ts
        if isinstance(grid_data, pd.DataFrame):
            grid_data = grid_data[grid_data.columns[0]]
        grid_data.name = "grid"
    else:
        grid_data = pd.Series(
            data=[0] * len(microgrid._load_ts), index=pv_data.index, name="grid"
        )

    return pd.concat([pv_data, load_data, grid_data], axis=1)


def quantile_regression_fit(y, X, q):
    """Exact quantile regression via its LP formulation (HiGHS).

    minimize  q*1'u+ + (1-q)*1'u-   s.t.  X beta + u+ - u- = y,  u+/- >= 0
    """
    from scipy.optimize import linprog
    from scipy import sparse

    y = np.asarray(y, dtype=float)
    X = np.asarray(X, dtype=float)
    n, p = X.shape

    c = np.concatenate([np.zeros(p), q * np.ones(n), (1 - q) * np.ones(n)])
    A_eq = sparse.hstack([sparse.csr_matrix(X), sparse.eye(n), -sparse.eye(n)])
    bounds = [(None, None)] * p + [(0, None)] * (2 * n)
    res = linprog(c, A_eq=A_eq, b_eq=y, bounds=bounds, method="highs")
    if not res.success:
        raise RuntimeError(f"Quantile regression LP failed: {res.message}")
    return res.x[:p]


class NoisyPVData:
    def __init__(self, pv_data=None, file_name=None):
        if pv_data is not None:
            if isinstance(pv_data, pd.Series):
                self.unmunged_data = pv_data.to_frame()
                self.data = pv_data.to_frame()
            elif not isinstance(pv_data, pd.DataFrame):
                raise TypeError(
                    f"known_data must be of type pd.DataFrame or pd.Series, is ({type(pv_data)})"
                )
            else:
                self.unmunged_data = pv_data.copy()
                self.data = pv_data.copy()
        elif file_name is not None:
            self.data, self.unmunged_data = pd.read_csv(file_name), pd.read_csv(file_name)
        else:
            raise RuntimeError("Unable to initialize data")

        self.num_hours = len(self.data)
        self.munged = False
        self.interpolated = False
        self.daily_maxes = None
        self.feature_functions = None
        self.feature_names = None
        self.interpolated_coef = None
        self.parabolic_baseline = None
        self.distribution_bounds = None

    def data_munge(self, verbose=False):
        if len(self.data.columns.values) != 1:
            print(
                "Warning multiple columns in pv_data, attempting to use "
                "'GH illum (lx)' as column name"
            )
            col_name = "GH illum (lx)"
        else:
            col_name = self.data.columns[0]

        hours = [j % 24 for j in range(self.num_hours)]
        day = [int(np.floor(j / 24)) for j in range(self.num_hours)]
        self.data = self.data.copy()
        self.data["hour"] = pd.Series(data=hours)
        self.data["day"] = pd.Series(data=day)
        self.data = self.data.pivot(index="hour", columns="day", values=col_name)

        indices_of_max = self.data.idxmax(axis=0)
        maxes = self.data.max(axis=0)
        indices_of_max.name = "time_of_max"
        maxes.name = "max_GHI"
        self.daily_maxes = pd.concat([indices_of_max, maxes], axis=1)
        self.daily_maxes["cumulative_hr"] = (
            self.daily_maxes["time_of_max"] + self.daily_maxes.index.values * 24
        )
        self.munged = True

    def _add_feature_columns(self, num_feature_functions=1, period_scale=1.0):
        feature_names, feature_funcs = [], {}
        if not self.munged:
            raise RuntimeError(
                "Data must be munged before adding feature columns or curve "
                "interpolation. Call data_munge first"
            )

        name = "ones"
        self.daily_maxes[name] = pd.Series(
            data=[1.0] * len(self.daily_maxes["cumulative_hr"]),
            index=self.daily_maxes.index,
        )

        def ones_f(x):
            if isinstance(x, (int, float)):
                return 1.0
            return pd.Series(data=[1.0] * len(x))

        feature_names.append(name)
        feature_funcs[name] = ones_f

        def make_trig(num, fn):
            def f(x):
                return fn(2 * num * np.pi / 8760.0 * period_scale * (x - 173 * 24))

            return f

        for k in range(num_feature_functions):
            if k % 2 == 0:
                num = int(np.floor((k + 2) / 2))
                name = f"cos{num}x"
                f = make_trig(num, np.cos)
            else:
                num = int(np.floor((k + 1) / 2))
                name = f"sin{num}x"
                f = make_trig(num, np.sin)
            self.daily_maxes[name] = f(self.daily_maxes["cumulative_hr"])
            feature_funcs[name] = f
            feature_names.append(name)

        self.feature_functions = feature_funcs
        self.feature_names = feature_names

    def max_min_curve_interpolate(
        self, num_feature_functions=1, percentile=0.8, plot_curve=False,
        use_preset_params=True, params="sf",
    ):
        """Fit seasonal upper/lower quantile curves over the daily maxima."""
        presets = {
            "sf": {"period_scale": 0.8, "q_max": 0.9, "q_min": 0.25},
            "houston": {"period_scale": 0.8, "q_max": 0.9, "q_min": 0.05},
        }
        if use_preset_params:
            if params not in presets:
                raise NameError(
                    "If use_preset_params is True, params must be one of "
                    "{'sf','houston'} denoting preset parameters"
                )
            parameters = presets[params]
            period_scale = parameters["period_scale"]
            q_max, q_min = parameters["q_max"], parameters["q_min"]
        else:
            if not isinstance(params, dict):
                raise TypeError(f"params must be a dict of parameters, not ({params})")
            period_scale = params["period_scale"]
            q_max, q_min = params["q_max"], params["q_min"]

        if not 0.0 <= percentile <= 1.0:
            raise ValueError(f"percentile must be in [0,1], is ({percentile})")

        self._add_feature_columns(
            num_feature_functions=num_feature_functions, period_scale=period_scale
        )

        x_vars = self.daily_maxes[self.feature_names]
        y = self.daily_maxes["max_GHI"]

        max_beta = quantile_regression_fit(y, x_vars.values, q_max)
        min_beta = quantile_regression_fit(y, x_vars.values, q_min)

        self.interpolated_coef = {
            "max": pd.Series(max_beta, index=self.feature_names),
            "min": pd.Series(min_beta, index=self.feature_names),
        }
        self.interpolated = True

    def most_light_curve_eval(self, max_min, cumulative_hours=None, day_hour_pairs=None):
        if max_min not in ("max", "min"):
            raise ValueError(f"max_min must be one of 'max' or 'min', is {max_min}")
        interpolated_coef = self.interpolated_coef[max_min]

        to_return = []
        if cumulative_hours is not None:
            cumul_times = pd.Series(data=cumulative_hours)
            y = pd.Series(data=[0.0] * len(cumul_times), name="Upper Bound Values")
            for name in self.feature_names:
                y += interpolated_coef[name] * self.feature_functions[name](cumul_times)
            if len(y) == 1:
                y = y[0]
            to_return.append(y)

        if day_hour_pairs is not None:
            cumul_times = []
            for pair in day_hour_pairs:
                if len(pair) != 2:
                    raise ValueError(
                        "pairs must be array-like of length two, containing days and hours"
                    )
                if pair[1] < 0 or pair[1] >= 24:
                    raise ValueError(f"hour must be in [0,23], is ({pair[1]})")
                cumul_times.append(pair[0] * 24 + pair[1])
            x = pd.Series(data=cumul_times)
            y_pairs = pd.Series(data=[0.0] * len(cumul_times), name="Upper Bound Values")
            for name in self.feature_names:
                y_pairs += interpolated_coef[name] * self.feature_functions[name](x)
            if len(y_pairs) == 1:
                y_pairs = y_pairs[0]
            to_return.append(y_pairs)

        if len(to_return) == 1:
            return to_return[0]
        return to_return

    def _sample_parabola(self, noise_type, noise_parameters, verbose,
                         push_peak_val=False, push_peak_ratio=0.5):
        noisy_data = self.data.copy()
        lower_distribution_bounds, upper_distribution_bounds = [], []

        for day in noisy_data.columns:
            if noisy_data[day][0] != 0:
                raise RuntimeError(
                    f"It appears that it is sunny at midnight of day ({day}). No good."
                )
            if noisy_data[day][23] != 0:
                raise RuntimeError(
                    f"It appears that it is sunny at 11PM of day ({day}). No good."
                )

            night_hours = np.where(noisy_data[day] == 0)[0]
            next_night_hours = np.roll(night_hours, -1)
            index_of_dawn = np.where(night_hours + 1 != next_night_hours)[0][0]
            dawn_time = night_hours[index_of_dawn]
            dusk_time = night_hours[index_of_dawn + 1]

            time_of_most_light = (dawn_time + dusk_time) / 2.0
            interpolated_least_light = self.most_light_curve_eval(
                max_min="min", day_hour_pairs=((day, time_of_most_light),)
            )
            interpolated_most_light = self.most_light_curve_eval(
                max_min="max", day_hour_pairs=((day, time_of_most_light),)
            )

            if interpolated_least_light < 0:
                if interpolated_most_light < 0:
                    most_light = -min(interpolated_least_light, interpolated_most_light)
                    least_light = -max(interpolated_least_light, interpolated_most_light)
                    interpolated_most_light = most_light
                    interpolated_least_light = least_light
                else:
                    interpolated_least_light = 0

            lower_b, upper_b = interpolated_least_light, interpolated_most_light
            spread = upper_b - lower_b

            if noise_type == "uniform":
                low = lower_b + noise_parameters["lower"] * spread
                high = upper_b + (noise_parameters["upper"] - 1) * spread
                lower_distribution_bounds.append(low)
                upper_distribution_bounds.append(high)
                peak_val = np.random.uniform(low=low, high=high)
            elif noise_type == "triangular":
                low = lower_b + noise_parameters["lower"] * spread
                high = upper_b + (noise_parameters["upper"] - 1) * spread
                if "mode" in noise_parameters:
                    mode_param = noise_parameters["mode"]
                    if not 0 <= mode_param <= 1:
                        raise ValueError(
                            f"mode parameter ({mode_param}) invalid, must be scale "
                            f"value in [0,1]"
                        )
                    mode = spread * mode_param + lower_b
                else:
                    mode = 0.5 * (lower_b + upper_b)
                lower_distribution_bounds.append(low)
                upper_distribution_bounds.append(high)
                peak_val = np.random.triangular(left=low, mode=mode, right=high)
            else:
                raise RuntimeError(
                    f"Fell through in noise_types, unable to recognize ({noise_type})"
                )

            if push_peak_val:
                peak_val = peak_val + push_peak_ratio * (
                    self.daily_maxes.loc[day, "max_GHI"] - peak_val
                )

            daytime_x = np.array([dawn_time, time_of_most_light, dusk_time])
            daytime_y = np.array([0, peak_val, 0])
            if any(np.diff(daytime_x) <= 0):
                raise RuntimeError(
                    "Something is wrong in interpolating daily curves, have "
                    f"dawn/peak/dusk times as ({daytime_x}), not in order"
                )

            f = interp1d(
                daytime_x, daytime_y, kind="quadratic", bounds_error=False, fill_value=0
            )
            noisy_data[day] = f(noisy_data.index)

        self.parabolic_baseline = noisy_data.copy()
        self.distribution_bounds = (lower_distribution_bounds, upper_distribution_bounds)
        return noisy_data, lower_distribution_bounds, upper_distribution_bounds

    def sample(
        self,
        noise_types=("uniform", "gaussian"),
        noise_params=({"lower": 0, "upper": 1}, {"std_ratio": 0.05}),
        return_stacked_data=True,
        verbose=False,
        push_peak_val=False,
        push_peak_ratio=0.5,
        push_individual_vals=False,
        push_individual_ratio=0.5,
        **kwargs,
    ):
        potential_noises = {0: (None, "uniform", "triangular"), 1: (None, "gaussian")}
        noise_parameters = ({"lower": 0, "upper": 1, "mode": 0.5}, {"std_ratio": 0.05})

        for j, noise in enumerate(noise_types):
            if noise not in potential_noises[j]:
                raise ValueError(
                    f"Noise ({noise}) not recognized in position ({j}), must be one "
                    f"of {potential_noises[j]}"
                )

        if not self.munged:
            self.data_munge()
        if not self.interpolated:
            self.max_min_curve_interpolate()

        if len(noise_params) != 2:
            raise TypeError("Unable to parse noise_params, must be array-like length 2")
        for j, v in enumerate(noise_params):
            if v is not None and not isinstance(v, dict):
                raise TypeError(
                    f"Element ({j}) in noise_params must be None or dict, is {type(v)}"
                )
            elif v is not None:
                for key in noise_parameters[j].keys():
                    if key in v.keys():
                        noise_parameters[j][key] = v[key]

        if noise_types[0] is None:
            if self.parabolic_baseline is None:
                raise ValueError("noise_types[0] is None, but there is no stored baseline")
            noisy_data = self.parabolic_baseline.copy()
        else:
            noisy_data, _, _ = self._sample_parabola(
                noise_types[0], noise_parameters[0], verbose,
                push_peak_val=push_peak_val, push_peak_ratio=push_peak_ratio,
            )

        if noise_types[1] == "gaussian":
            noisy_data += np.random.normal(
                scale=noise_parameters[1]["std_ratio"] * noisy_data
            )

        if return_stacked_data:
            stacked_data = noisy_data.transpose().stack().reset_index()
            stacked_data = stacked_data.drop(columns=["hour", "day"])
            assert len(stacked_data.columns) == 1
            stacked_data.columns = ["pv"]

            stacked_data = self._check_sample(stacked_data, verbose=verbose)
            if push_individual_vals:
                underlying = self.unmunged_data[self.unmunged_data.columns[0]]
                stacked_data["pv"] += push_individual_ratio * (
                    underlying - stacked_data["pv"]
                )
            return stacked_data

        return noisy_data

    def _check_sample(self, stacked_data, verbose=False):
        temp_data = stacked_data.copy().squeeze()
        if not isinstance(temp_data, pd.Series):
            raise ValueError(
                "stacked_data needs to be a series or a single column DataFrame, "
                f"has shape {stacked_data.shape}"
            )
        negative = temp_data < 0
        if negative.sum() > 0 and verbose:
            print(f"Found {negative.sum()} negative values in pv_data sample, forcing to 0")
        temp_data.loc[negative] = 0
        if isinstance(stacked_data, pd.Series):
            return temp_data
        new_stacked = stacked_data.copy()
        new_stacked[new_stacked.columns[0]] = temp_data
        return new_stacked


class NoisyLoadData:
    def __init__(self, load_data=None, file_name=None):
        if load_data is not None:
            if isinstance(load_data, pd.Series):
                self.unmunged_data = load_data.to_frame()
                self.data = load_data.to_frame()
            elif not isinstance(load_data, pd.DataFrame):
                raise TypeError(
                    f"known_data must be of type pd.DataFrame or pd.Series, is "
                    f"({type(load_data)})"
                )
            else:
                self.unmunged_data = load_data.copy()
                self.data = load_data.copy()
        elif file_name is not None:
            self.data = pd.read_csv(file_name)
            self.unmunged_data = pd.read_csv(file_name)
        else:
            raise RuntimeError(
                "Unable to initialize data, either load_data or file_name must not be None"
            )

        self.data = self.data.iloc[:8760]
        self.unmunged_data = self.unmunged_data.iloc[:8760]
        self.num_hours = len(load_data) if load_data is not None else len(self.data)
        self.munged = False

    def data_munge(self, verbose=False):
        if len(self.data.columns.values) != 1:
            print(
                "Warning multiple columns in load_data, attempting to use "
                "'Electricity:Facility [kW](Hourly)' as column name"
            )
            col_name = "Electricity:Facility [kW](Hourly)"
        else:
            col_name = self.data.columns[0]

        hours = [j % 24 for j in range(self.num_hours)]
        day = [int(np.floor(j / 24)) for j in range(self.num_hours)]
        self.data = self.data.copy()
        self.data["hour"] = pd.Series(data=hours)
        self.data["day"] = pd.Series(data=day)
        self.data = self.data.pivot(index="day", columns="hour", values=col_name)
        self.data["day_of_week"] = self.data.index % 7

        self.load_mean = self.data.groupby(["day_of_week"]).mean()
        self.load_std = self.data.groupby(["day_of_week"]).std().fillna(value=0)
        self.munged = True

    def sample(self, distribution="gaussian", load_variance_scale=1.0,
               return_stacked=True, verbose=False, **kwargs):
        if not self.munged:
            self.data_munge()

        if distribution != "gaussian":
            raise ValueError(
                f"distribution {distribution} not recognized, must be one of ('gaussian',)"
            )

        day_of_week = self.data["day_of_week"]
        hour_cols = self.data.columns[:-1]
        copied_mean = self.load_mean.loc[day_of_week, hour_cols].to_numpy()
        copied_std = self.load_std.loc[day_of_week, hour_cols].to_numpy()

        data_sample = pd.DataFrame(
            data=np.random.normal(loc=copied_mean, scale=load_variance_scale * copied_std),
            index=self.data.index,
            columns=hour_cols,
        )
        if return_stacked:
            stacked_data = data_sample.stack().reset_index()
            stacked_data = stacked_data.drop(columns=["day", "hour"])
            assert len(stacked_data.columns) == 1
            stacked_data.columns = ["load"]
            return self._check_sample(stacked_data, verbose=verbose)
        return data_sample

    def _check_sample(self, stacked_data, verbose=False):
        temp_data = stacked_data.copy().squeeze()
        if not isinstance(temp_data, pd.Series):
            raise ValueError(
                "stacked_data needs to be a series or a single column DataFrame, "
                f"has shape {stacked_data.shape}"
            )
        negative = temp_data < 0
        if negative.sum() > 0 and verbose:
            print(
                f"Found {negative.sum()} negative values in load_data, forcing them "
                f"to be min of underlying data"
            )
        temp_data.loc[negative] = self.unmunged_data.min().squeeze()
        if isinstance(stacked_data, pd.Series):
            return temp_data
        new_stacked = stacked_data.copy()
        new_stacked[new_stacked.columns[0]] = temp_data
        return new_stacked


class NoisyGridData:
    def __init__(self, grid_data, dist_type="markov"):
        if not isinstance(grid_data, (pd.DataFrame, pd.Series)):
            raise TypeError(f"grid_data must be of type pd.DataFrame, is {type(grid_data)}")
        binary = (grid_data == 1) | (grid_data == 0)
        if not np.asarray(binary).all():
            raise ValueError("Non-binary values found in grid_data")
        if dist_type not in ("naive", "markov"):
            raise TypeError(
                f"dist type ({dist_type}) not recognized, must be one of ('naive', 'markov')"
            )

        self.dist_type = dist_type
        self.data = grid_data.copy()
        self.unmunged_data = grid_data.copy()
        self.has_distribution = False
        self.transition_prob_matrix = None
        self.occurrences = None

    def learn_distribution(self):
        if self.dist_type == "naive":
            transition_prob_matrix = np.zeros(2)
            probability_of_one = float(np.asarray(self.data.mean()).squeeze())
            transition_prob_matrix[0] = 1 - probability_of_one
            transition_prob_matrix[1] = probability_of_one
        else:  # markov
            grid_vals = np.asarray(self.data).reshape(-1)
            transition_prob_matrix = np.zeros((2, 2))
            occurrences = np.zeros(2)
            for j, val in enumerate(grid_vals[:-1]):
                transition_prob_matrix[int(val), int(grid_vals[j + 1])] += 1
                occurrences[int(val)] += 1

            for s in (0, 1):
                if occurrences[s] > 0:
                    transition_prob_matrix[s, :] /= occurrences[s]
                else:
                    transition_prob_matrix[s, s] = 1
            self.occurrences = occurrences

        self.transition_prob_matrix = transition_prob_matrix
        self.has_distribution = True

    def sample(self):
        if not self.has_distribution:
            self.learn_distribution()

        if self.dist_type == "naive":
            generated = np.random.choice(
                [0, 1], size=len(self.data), p=self.transition_prob_matrix
            )
        else:
            generated = np.zeros(len(self.data))
            probs = self.occurrences / np.sum(self.occurrences)
            generated[0] = np.random.choice([0, 1], p=probs)
            for j in range(1, len(self.data)):
                probs = self.transition_prob_matrix[int(generated[j - 1]), :]
                generated[j] = np.random.choice([0, 1], p=probs)

        return pd.Series(data=generated, name="grid")


class SampleGenerator:
    def __init__(self, microgrid, **forecast_args):
        self.microgrid = microgrid
        self.NPV = NoisyPVData(pv_data=self.microgrid._pv_ts)
        self.NL = NoisyLoadData(load_data=self.microgrid._load_ts)
        if self.microgrid.architecture["grid"] != 0:
            self.NG = NoisyGridData(grid_data=self.microgrid._grid_status_ts)
        else:
            self.NG = None
        self.underlying_data = return_underlying_data(self.microgrid)
        self.forecasts = self.create_forecasts(**forecast_args)
        self.samples = None

    def create_forecasts(self, pv_args=None, load_args=None, preset_to_use=None,
                         print_mape=False, **forecast_args):
        if pv_args is None and load_args is None and preset_to_use is not None:
            args = ForecastArgSet(preset_to_use=preset_to_use)
            pv_args = args["pv_args"]
            load_args = args["load_args"]
        else:
            pv_args = pv_args or dict()
            load_args = load_args or dict()

        pv_forecast = self.NPV.sample(**pv_args)
        load_forecast = self.NL.sample(**load_args)

        if self.microgrid.architecture["grid"] != 0:
            grid_forecast = self.NG.sample()
        else:
            grid_forecast = pd.Series(
                data=[0] * len(self.microgrid._load_ts), name="grid"
            )

        forecast = pd.concat([pv_forecast, load_forecast, grid_forecast], axis=1)

        if print_mape:
            print(f"MAPE: {self.validate_forecasts(forecasts=forecast, aggregate=True)}")

        if hasattr(self, "forecasts"):
            self.forecasts = forecast
        else:
            return forecast

    def validate_forecasts(self, forecasts=None, aggregate=False):
        if forecasts is None:
            forecasts = self.forecasts
        mape_vals = {
            col: self.mape(self.underlying_data[col], forecasts[col])
            for col in ("pv", "load")
        }
        if aggregate:
            return np.sqrt(np.mean(np.array(list(mape_vals.values())) ** 2))
        return mape_vals

    def mape(self, actual_vals, forecast_vals):
        actual_vals = np.asarray(actual_vals).reshape(-1)
        forecast_vals = np.asarray(forecast_vals).reshape(-1)
        ratios = np.abs((actual_vals - forecast_vals) / actual_vals)
        return np.mean(ratios[~np.isnan(ratios)])

    def sample_from_forecasts(self, n_samples=10, verbose=False, **sampling_args):
        NPV = self.NPV
        NL = NoisyLoadData(load_data=self.forecasts["load"])
        NG = NoisyGridData(grid_data=self.forecasts["grid"])

        samples = []
        if "noise_types" not in sampling_args:
            sampling_args["noise_types"] = (None, "gaussian")

        for j in range(n_samples):
            if verbose:
                print(f"Creating sample {j}")
            pv_forecast = NPV.sample(**sampling_args)
            load_forecast = NL.sample(**sampling_args)
            grid_forecast = NG.sample()
            sample = pd.concat([pv_forecast, load_forecast, grid_forecast], axis=1)
            truncated = min(
                len(NPV.unmunged_data), len(NL.unmunged_data), len(NG.unmunged_data)
            )
            samples.append(sample.iloc[:truncated])

        self.samples = samples
        return samples


class ForecastArgSet(dict):
    def __init__(self, pv_param_set=None, load_param_set=None, preset_to_use=None):
        if pv_param_set is None and load_param_set is None and preset_to_use is not None:
            super().__init__(self.get_preset(preset_to_use))
        elif pv_param_set is not None and load_param_set is not None and preset_to_use is None:
            super().__init__(pv_args=pv_param_set, load_args=load_param_set)
        else:
            raise KeyError("Unable to parse inputs")
        self.mape_vals = []
        self.mape_mean = None
        self.mape_std = None

    def update_with_mape(self, mape):
        self.mape_vals.append(mape)
        self.mape_mean = np.mean(self.mape_vals)
        self.mape_std = np.std(self.mape_vals)

    def get_preset(self, forecast_accuracy=50):
        presets = {
            50: 0.5,
            70: 0.65,
            85: 1.0,
        }
        if forecast_accuracy not in presets:
            raise ValueError(
                f"do not have relevant sampling parameters for forecast accuracy "
                f"{forecast_accuracy}, must be one of (50, 70, 85)"
            )
        return {
            "pv_args": {
                "noise_params": ({"lower": 0.0, "upper": 0.5}, {"std_ratio": 0.25}),
                "push_peak_val": True,
                "push_peak_ratio": 0.0,
                "push_individual_vals": True,
                "push_individual_ratio": presets[forecast_accuracy],
            },
            "load_args": {"load_variance_scale": 2.0},
        }

    def __eq__(self, other):
        if type(self) != type(other):
            return NotImplemented
        return self.mape_mean == other.mape_mean

    def __lt__(self, other):
        if type(self) != type(other):
            return NotImplemented
        return self.mape_mean < other.mape_mean

    def __gt__(self, other):
        if type(self) != type(other):
            return NotImplemented
        return self.mape_mean > other.mape_mean


class ForecastArgs:
    def __init__(self, num_pv_noise_params_0, num_pv_std_ratio, num_load_variance_scale,
                 num_push_peak_ratio, num_push_individual_ratio,
                 max_load_var_scale=2.0, max_pv_std_ratio=0.5):
        pv_params = self.pv_parameters(
            num_pv_noise_params_0, num_pv_std_ratio, num_push_peak_ratio,
            num_push_individual_ratio, max_std_ratio=max_pv_std_ratio,
        )
        load_params = self.load_parameters(
            num_load_variance_scale, max_load_var_scale=max_load_var_scale
        )
        self.param_sets = self.combine_sets(pv_params, load_params)

    def pv_parameters(self, num_noise_params_0, num_std_ratio, num_push_peak_ratio,
                      num_push_individual_ratio, max_std_ratio=0.5):
        pv_params = []
        for individual_ratio in np.linspace(0, 1, num_push_individual_ratio):
            for peak_ratio in np.linspace(0, 1, num_push_peak_ratio):
                for std_ratio in np.linspace(0, max_std_ratio, num_std_ratio):
                    for lower in np.linspace(0, 1, num_noise_params_0):
                        for upper in np.linspace(1, lower, num_noise_params_0):
                            if upper >= lower:
                                pv_params.append(
                                    dict(
                                        noise_params=(
                                            dict(lower=lower, upper=upper),
                                            dict(std_ratio=std_ratio),
                                        ),
                                        push_peak_val=True,
                                        push_peak_ratio=peak_ratio,
                                        push_individual_vals=True,
                                        push_individual_ratio=individual_ratio,
                                    )
                                )
        return pv_params

    def load_parameters(self, num_load_variance_scale, max_load_var_scale=2.0):
        return [
            dict(load_variance_scale=v)
            for v in np.linspace(0, max_load_var_scale, num_load_variance_scale)
        ]

    def combine_sets(self, pv_params, load_params):
        return [
            ForecastArgSet(pv_param_set=pv, load_param_set=ld)
            for pv in pv_params
            for ld in load_params
        ]
