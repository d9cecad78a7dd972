"""Legacy non-modular microgrid.

Mirror of the reference's DataFrame-record monolith
(``src/pymgrid/_deprecated/non_modular_microgrid.py:220``): the substrate the
pymgrid25 suite was generated on, consumed by the legacy MPC/SAA paths, the
sample generators, and the conversion layer.  Simulation is a per-step record
pipeline — record action, clip to constraints, dispatch PV/loss-load/
curtailment, record CO2 and cost, advance state.

Kept semantically faithful (including quirks like the ``p_genset > 1`` guard
in the genset constraint check) since the conversion tests fuzz it against
the generator.
"""
from copy import copy

import numpy as np

__all__ = ["NonModularMicrogrid", "Battery", "Genset", "Grid", "in_ipynb"]


def in_ipynb():
    """True when running inside an IPython notebook kernel (reference
    ``non_modular_microgrid.py:31-40``); degrades to False without IPython."""
    try:
        from IPython import get_ipython

        cfg = get_ipython().config
        return cfg["IPKernelApp"]["parent_appname"] == "ipython-notebook"
    except Exception:
        return False

DEFAULT_HORIZON = 24  # hours
DEFAULT_TIMESTEP = 1  # hours
ZERO = 10**-5


class Battery:
    """Parameter holder for notebook-style access (reference lines 57-123)."""

    def __init__(self, param_battery, capa_to_charge, capa_to_discharge):
        self.soc = param_battery["battery_soc_0"].values[0]
        self.capacity = param_battery["battery_capacity"].values[0]
        self.soc_max = param_battery["battery_soc_max"].values[0]
        self.soc_min = param_battery["battery_soc_min"].values[0]
        self.p_charge_max = param_battery["battery_power_charge"].values[0]
        self.p_discharge_max = param_battery["battery_power_discharge"].values[0]
        self.efficiency = param_battery["battery_efficiency"].values[0]
        self.cost_cycle = param_battery["battery_cost_cycle"].values[0]
        self.capa_to_charge = capa_to_charge
        self.capa_to_discharge = capa_to_discharge


class Genset:
    def __init__(self, param):
        self.rated_power = param["genset_rated_power"].values[0]
        self.p_min = param["genset_pmin"].values[0]
        self.p_max = param["genset_pmax"].values[0]
        self.fuel_cost = param["fuel_cost"].values[0]
        self.co2 = param["genset_co2"].values[0]


class Grid:
    def __init__(self, param, status, price_import, price_export, co2):
        self.power_export = param["grid_power_export"].values[0]
        self.power_import = param["grid_power_import"].values[0]
        self.price_export = price_export
        self.price_import = price_import
        self.status = status
        self.co2 = co2


class NonModularMicrogrid:
    def __init__(self, parameters, horizon=DEFAULT_HORIZON, timestep=DEFAULT_TIMESTEP):
        self.parameters = parameters["parameters"]
        self.architecture = parameters["architecture"]
        self._load_ts = parameters["load"]
        self._pv_ts = parameters["pv"]

        self.pv = self._pv_ts.iloc[0, 0]
        self.load = self._load_ts.iloc[0, 0]
        self._next_load = self._load_ts.iloc[1, 0]
        self._next_pv = self._pv_ts.iloc[1, 0]
        if parameters["architecture"]["grid"] == 1:
            self._grid_status_ts = parameters["grid_ts"]
            self._grid_price_import = parameters["grid_price_import"]
            self._grid_price_export = parameters["grid_price_export"]
            self._grid_co2 = parameters["grid_co2"]

            self._next_grid_status = self._grid_status_ts.iloc[0, 0]
            self._next_grid_price_export = self._grid_price_export.iloc[0, 0]
            self._next_grid_price_import = self._grid_price_import.iloc[0, 0]
            self._next_grid_co2 = self._grid_co2.iloc[0, 0]

        self._df_record_control_dict = parameters["df_actions"]
        self._df_record_state = parameters["df_status"]
        self._df_record_actual_production = parameters["df_actual_generation"]
        self._df_record_cost = parameters["df_cost"]
        self._df_record_co2 = parameters["df_co2"]
        self._df_cost_per_epochs = []
        self.horizon = horizon
        self._tracking_timestep = 0
        self._data_length = min(self._load_ts.shape[0], self._pv_ts.shape[0])
        self.done = False
        self._has_run_rule_based_baseline = False
        self._has_run_mpc_baseline = False
        self._has_train_test_split = False
        self._epoch = 0
        self._zero = ZERO
        self.control_dict = parameters["control_dict"]
        self._data_set_to_use_default = "all"
        self._data_set_to_use = "all"

        if self.architecture["battery"] == 1:
            self.battery = Battery(
                self.parameters,
                self._df_record_state["capa_to_charge"][0],
                self._df_record_state["capa_to_discharge"][0],
            )
        if self.architecture["genset"] == 1:
            self.genset = Genset(self.parameters)
        if self.architecture["grid"] == 1:
            self.grid = Grid(
                self.parameters,
                self._grid_status_ts.iloc[0, 0],
                self._grid_price_import.iloc[0, 0],
                self._grid_price_export.iloc[0, 0],
                self._grid_co2.iloc[0, 0],
            )

    # --------------------------------------------------------------- getters
    def set_horizon(self, horizon):
        self.horizon = horizon

    def set_cost_co2(self, co2_cost):
        self.parameters["cost_co2"] = co2_cost

    def get_data(self):
        return self._load_ts, self._pv_ts

    def get_training_testing_data(self):
        if self._has_train_test_split:
            return (
                self._limit_index,
                self._load_train,
                self._pv_train,
                self._load_test,
                self._pv_test,
            )
        print("You have not split the dataset into training and testing sets")

    def get_control_dict(self):
        return self.control_dict

    def get_parameters(self):
        return self.parameters

    def get_cost(self):
        return self._df_record_cost["total_cost"][-1]

    def get_co2(self):
        return self._df_record_co2["co2"][-1]

    def get_updated_values(self):
        return {i: self._df_record_state[i][-1] for i in self._df_record_state}

    # ------------------------------------------------------------- forecasts
    def _active(self, all_ts, train_ts_name, test_ts_name):
        if self._data_set_to_use == "training":
            return getattr(self, train_ts_name)
        if self._data_set_to_use == "testing":
            return getattr(self, test_ts_name)
        return all_ts

    def _window(self, ts):
        return ts.iloc[
            self._tracking_timestep : self._tracking_timestep + self.horizon
        ].values.flatten()

    def forecast_all(self):
        forecast = {"pv": self.forecast_pv(), "load": self.forecast_load()}
        if self.architecture["grid"] == 1:
            forecast["grid_status"] = self.forecast_grid_status()
            forecast["grid_import"], forecast["grid_export"] = self.forecast_grid_prices()
            forecast["grid_co2"] = self.forecast_grid_co2()
        return forecast

    def forecast_pv(self):
        return self._window(self._active(self._pv_ts, "_pv_train", "_pv_test"))

    def forecast_load(self):
        return self._window(self._active(self._load_ts, "_load_train", "_load_test"))

    def forecast_grid_status(self):
        return self._window(
            self._active(self._grid_status_ts, "_grid_status_train", "_grid_status_test")
        )

    def forecast_grid_co2(self):
        return self._window(
            self._active(self._grid_co2, "_grid_co2_train", "_grid_co2_test")
        )

    def forecast_grid_prices(self):
        imp = self._window(
            self._active(
                self._grid_price_import, "_grid_price_import_train", "_grid_price_import_test"
            )
        )
        exp = self._window(
            self._active(
                self._grid_price_export, "_grid_price_export_train", "_grid_price_export_test"
            )
        )
        return imp, exp

    # ------------------------------------------------------------------- run
    def run(self, control_dict):
        """Advance one step: record the (clipped) control, dispatch PV /
        loss-load / curtailment, record CO2 and costs, update state."""
        control_dict["load"] = self.load
        control_dict["pv"] = self.pv

        self._df_record_control_dict = self._record_action(
            control_dict, self._df_record_control_dict
        )
        self._df_record_actual_production = self._record_production(
            control_dict, self._df_record_actual_production, self._df_record_state
        )

        last_production = {
            i: self._df_record_actual_production[i][-1]
            for i in self._df_record_actual_production
        }

        if self.architecture["grid"] == 1:
            self._df_record_co2 = self._record_co2(
                last_production, self._df_record_co2, self.grid.co2
            )
            self._df_record_cost = self._record_cost(
                last_production,
                self._df_record_cost,
                self._df_record_co2,
                self.grid.price_import,
                self.grid.price_export,
            )
            self._df_record_state = self._update_status(
                last_production,
                self._df_record_state,
                self._next_load,
                self._next_pv,
                self._next_grid_status,
                self._next_grid_price_import,
                self._next_grid_price_export,
                self._next_grid_co2,
            )
        else:
            self._df_record_co2 = self._record_co2(last_production, self._df_record_co2)
            self._df_record_cost = self._record_cost(
                last_production, self._df_record_cost, self._df_record_co2
            )
            self._df_record_state = self._update_status(
                control_dict, self._df_record_state, self._next_load, self._next_pv
            )

        if (
            self._tracking_timestep == self._data_length - self.horizon
            or self._tracking_timestep == self._data_length - 1
        ):
            self.done = True
            return self.get_updated_values()

        self._tracking_timestep += 1
        self.update_variables()
        return self.get_updated_values()

    def train_test_split(self, train_size=0.67, shuffle=False, cancel=False):
        if not self._has_train_test_split:
            self._limit_index = int(np.ceil(self._data_length * train_size))
            self._load_train = self._load_ts.iloc[: self._limit_index]
            self._pv_train = self._pv_ts.iloc[: self._limit_index]
            self._load_test = self._load_ts.iloc[self._limit_index :]
            self._pv_test = self._pv_ts.iloc[self._limit_index :]

            if self.architecture["grid"] == 1:
                self._grid_status_train = self._grid_status_ts.iloc[: self._limit_index]
                self._grid_status_test = self._grid_status_ts.iloc[self._limit_index :]
                self._grid_price_import_train = self._grid_price_import.iloc[: self._limit_index]
                self._grid_price_import_test = self._grid_price_import.iloc[self._limit_index :]
                self._grid_price_export_train = self._grid_price_export.iloc[: self._limit_index]
                self._grid_price_export_test = self._grid_price_export.iloc[self._limit_index :]
                self._grid_co2_train = self._grid_co2.iloc[: self._limit_index]
                self._grid_co2_test = self._grid_co2.iloc[self._limit_index :]

            self._has_train_test_split = True
            self._data_set_to_use_default = "training"
            self._data_set_to_use = "training"
        elif cancel:
            self._has_train_test_split = False
            self._data_set_to_use_default = "all"
            self._data_set_to_use = "all"

        self.reset()

    def update_variables(self):
        t = self._tracking_timestep
        pv_ts = self._active(self._pv_ts, "_pv_train", "_pv_test")
        load_ts = self._active(self._load_ts, "_load_train", "_load_test")
        self.pv = pv_ts.iloc[t, 0]
        self.load = load_ts.iloc[t, 0]

        if self._data_set_to_use == "all" and t >= self._data_length - 1:
            self._next_pv, self._next_load = None, None
        else:
            self._next_pv = pv_ts.iloc[t + 1, 0]
            self._next_load = load_ts.iloc[t + 1, 0]

        if self.architecture["grid"] == 1:
            status_ts = self._active(self._grid_status_ts, "_grid_status_train", "_grid_status_test")
            imp_ts = self._active(self._grid_price_import, "_grid_price_import_train", "_grid_price_import_test")
            exp_ts = self._active(self._grid_price_export, "_grid_price_export_train", "_grid_price_export_test")
            co2_ts = self._active(self._grid_co2, "_grid_co2_train", "_grid_co2_test")

            self.grid.status = status_ts.iloc[t, 0]
            self.grid.price_import = imp_ts.iloc[t, 0]
            self.grid.price_export = exp_ts.iloc[t, 0]
            self.grid.co2 = co2_ts.iloc[t, 0]

            if self._data_set_to_use == "all" and t >= self._data_length - 1:
                self._next_grid_status = None
                self._next_grid_price_import = None
                self._next_grid_price_export = None
                self._next_grid_co2 = None
            else:
                self._next_grid_status = status_ts.iloc[t + 1, 0]
                self._next_grid_price_import = imp_ts.iloc[t + 1, 0]
                self._next_grid_price_export = exp_ts.iloc[t + 1, 0]
                self._next_grid_co2 = co2_ts.iloc[t + 1, 0]

        if self.architecture["battery"] == 1:
            self.battery.soc = self._df_record_state["battery_soc"][-1]
            self.battery.capa_to_discharge = self._df_record_state["capa_to_discharge"][-1]
            self.battery.capa_to_charge = self._df_record_state["capa_to_charge"][-1]

    def reset(self, testing=False):
        if self._data_set_to_use == "training":
            temp_cost = copy(self._df_record_cost)
            temp_cost["epoch"] = self._epoch
            self._df_cost_per_epochs.append(temp_cost)

        self._df_record_control_dict = {i: [] for i in self._df_record_control_dict}
        self._df_record_state = {
            i: [self._df_record_state[i][0]] for i in self._df_record_state
        }
        self._df_record_actual_production = {
            i: [] for i in self._df_record_actual_production
        }
        self._df_record_cost = {i: [] for i in self._df_record_cost}
        self._df_record_co2 = {i: [] for i in self._df_record_co2}

        self._tracking_timestep = 0

        if testing and self._data_set_to_use_default == "training":
            self._data_set_to_use = "testing"
            self._data_length = min(self._load_test.shape[0], self._pv_test.shape[0])
        else:
            self._data_set_to_use = self._data_set_to_use_default
            if self._data_set_to_use == "training":
                self._data_length = min(self._load_train.shape[0], self._pv_train.shape[0])
            else:
                self._data_length = min(self._load_ts.shape[0], self._pv_ts.shape[0])

        self.update_variables()
        self.done = False
        self._epoch += 1

    # ------------------------------------------------------------- recording
    def _record_action(self, control_dict, df):
        if not isinstance(df, dict):
            raise TypeError(f"df needs to be dict, is {type(df)}")
        for j in df:
            if j in control_dict.keys():
                df[j].append(control_dict[j])
            else:
                df[j].append({j: 0})
        return df

    def _update_status(
        self, production_dict, df, next_load, next_pv, next_grid=0,
        next_price_import=0, next_price_export=0, next_co2=0,
    ):
        if not isinstance(df, dict):
            raise TypeError(f"df needs to be dict, is {type(df)}")

        new_dict = {
            "load": next_load,
            "pv": next_pv,
            "hour": self._tracking_timestep % 24,
        }
        if self.architecture["battery"] == 1:
            params = self.parameters
            eff = params["battery_efficiency"].values[0]
            cap = params["battery_capacity"].values[0]
            new_soc = df["battery_soc"][-1] + (
                production_dict["battery_charge"] * eff
                - production_dict["battery_discharge"] / eff
            ) / cap
            capa_to_charge = max(
                (params["battery_soc_max"].values[0] * cap - new_soc * cap) * eff, 0
            )
            capa_to_discharge = max(
                (new_soc * cap - params["battery_soc_min"].values[0] * cap) * eff, 0
            )
            new_dict["battery_soc"] = new_soc
            new_dict["capa_to_discharge"] = capa_to_discharge
            new_dict["capa_to_charge"] = capa_to_charge

        if self.architecture["grid"] == 1:
            new_dict["grid_status"] = next_grid
            new_dict["grid_price_import"] = next_price_import
            new_dict["grid_price_export"] = next_price_export
            new_dict["grid_co2"] = next_co2

        for j in df:
            df[j].append(new_dict[j])
        return df

    def _check_constraints_genset(self, p_genset):
        params = self.parameters
        if p_genset < 0:
            p_genset = 0
            print("error, genset power cannot be lower than 0")
        rated = params["genset_rated_power"].values[0]
        if p_genset < rated * params["genset_pmin"].values[0] and p_genset > 1:
            p_genset = rated * params["genset_pmin"].values[0]
        if p_genset > rated * params["genset_pmax"].values[0]:
            p_genset = rated * params["genset_pmax"].values[0]
        return p_genset

    def _check_constraints_grid(self, p_import, p_export):
        params = self.parameters
        if p_import < 0:
            p_import = 0
        if p_export < 0:
            p_export = 0
        if p_import > params["grid_power_import"].values[0]:
            p_import = params["grid_power_import"].values[0]
        if p_export > params["grid_power_export"].values[0]:
            p_export = params["grid_power_export"].values[0]
        return p_import, p_export

    def _check_constraints_battery(self, p_charge, p_discharge, status):
        params = self.parameters
        if p_charge < 0:
            p_charge = 0
        if p_discharge < 0:
            p_discharge = 0

        cap = params["battery_capacity"].values[0]
        eff = params["battery_efficiency"].values[0]
        soc = status["battery_soc"][-1]
        capa_to_charge = max(
            (params["battery_soc_max"].values[0] * cap - soc * cap) * eff, 0
        )
        capa_to_discharge = max(
            (soc * cap - params["battery_soc_min"].values[0] * cap) * eff, 0
        )

        if p_charge > capa_to_charge or p_charge > params["battery_power_charge"].values[0]:
            p_charge = min(capa_to_charge, params["battery_power_charge"].values[0])
        if (
            p_discharge > capa_to_discharge
            or p_discharge > params["battery_power_discharge"].values[0]
        ):
            p_discharge = min(capa_to_discharge, params["battery_power_discharge"].values[0])
        return p_charge, p_discharge

    def _record_production(self, control_dict, production_dict, status):
        assert isinstance(production_dict, dict)
        control_dict.pop("pv_consummed", None)

        has_grid = self.architecture["grid"] == 1
        has_genset = self.architecture["genset"] == 1
        has_battery = self.architecture["battery"] == 1

        sources = 0.0
        sinks = control_dict["load"]

        if has_battery:
            p_charge, p_discharge = self._check_constraints_battery(
                control_dict["battery_charge"], control_dict["battery_discharge"], status
            )
            production_dict["battery_charge"].append(p_charge)
            production_dict["battery_discharge"].append(p_discharge)
            sources += p_discharge
            sinks += p_charge

        if has_grid:
            p_import, p_export = self._check_constraints_grid(
                control_dict["grid_import"], control_dict["grid_export"]
            )
            production_dict["grid_import"].append(p_import)
            production_dict["grid_export"].append(p_export)
            sources += p_import
            sinks += p_export

        if has_genset:
            p_genset = self._check_constraints_genset(control_dict["genset"])
            production_dict["genset"].append(p_genset)
            sources += p_genset

        pv_required = sinks - sources
        pv_available = control_dict["pv"]

        if np.abs(pv_required - pv_available) < 1e-3:  # meeting demand
            pv_consumed, loss_load, pv_curtailed, overgeneration = pv_available, 0, 0, 0
        elif pv_required > pv_available:  # loss load
            pv_consumed = pv_available
            loss_load = pv_required - pv_available
            pv_curtailed = overgeneration = 0
        elif 0 < pv_required < pv_available:  # curtail pv
            pv_consumed = pv_required
            loss_load = 0
            pv_curtailed = pv_available - pv_required
            overgeneration = 0
        else:  # overgeneration; requires no pv at all
            assert pv_required < 0
            pv_consumed = 0
            loss_load = 0
            pv_curtailed = pv_available if pv_available > 0 else 0
            overgeneration = -pv_required

        production_dict["pv_consummed"].append(pv_consumed)
        production_dict["loss_load"].append(loss_load)
        production_dict["pv_curtailed"].append(pv_curtailed)
        production_dict["overgeneration"].append(overgeneration)
        return production_dict

    def _record_co2(self, control_dict, df, grid_co2=0):
        co2 = 0
        if self.architecture["genset"] == 1:
            co2 += control_dict["genset"] * self.parameters["genset_co2"].values[0]
        if self.architecture["grid"] == 1:
            co2 += grid_co2 * control_dict["grid_import"]
        df["co2"].append(co2)
        return df

    def _record_cost(self, control_dict, df, df_co2, cost_import=0, cost_export=0):
        if not isinstance(df, dict):
            raise TypeError(f"df needs to be dict, is {type(df)}")

        df["loss_load"].append(
            control_dict["loss_load"] * self.parameters["cost_loss_load"].values[0]
        )
        df["overgeneration"].append(
            control_dict["overgeneration"]
            * self.parameters["cost_overgeneration"].values[0]
        )
        if self.architecture["genset"] == 1:
            df["genset"].append(
                control_dict["genset"] * self.parameters["fuel_cost"].values[0]
            )
        if self.architecture["grid"] == 1:
            df["grid_import"].append(cost_import * control_dict["grid_import"])
            df["grid_export"].append(-cost_export * control_dict["grid_export"])
        if self.architecture["battery"] == 1:
            df["battery"].append(
                (control_dict["battery_charge"] + control_dict["battery_discharge"])
                * self.parameters["battery_cost_cycle"].values[0]
            )
        df["co2"].append(self.parameters["cost_co2"].values[0] * df_co2["co2"][-1])

        total_cost = np.sum([val[-1] for key, val in df.items() if key != "total_cost"])
        df["total_cost"].append(total_cost)
        return df

    def penalty(self, coef=1):
        penalty = 0
        for i in self._df_record_control_dict:
            penalty += abs(
                self._df_record_control_dict[i][-1]
                - self._df_record_actual_production[i][-1]
            )
        return penalty * coef

    @classmethod
    def from_modular(cls, modular):
        from pymgrid_tpu.convert import to_nonmodular

        return to_nonmodular(modular)

    def to_modular(self):
        from pymgrid_tpu.convert import to_modular

        return to_modular(self)
