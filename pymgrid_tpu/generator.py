"""Randomized microgrid scenario generator.

Mirror of the reference ``src/pymgrid/MicrogridGenerator.py:61``: samples an
architecture (genset / grid / both at 1/3 each), picks random load/PV/CO2
profiles from the packaged data, sizes components off the load (NREL-style
PV penetration 30-150% of peak load, battery 3-5h of mean load, genset
peak/0.9), generates TOU tariffs and weak-grid outage profiles, and builds a
:class:`~pymgrid_tpu.nonmodular.NonModularMicrogrid` spec (optionally
converted to modular).

Random draws use the global numpy RNG in the same call order as the
reference, so a fixed ``random_seed`` reproduces the reference's scenario
parameters bit-for-bit (given the same data files).
"""
from pathlib import Path

import numpy as np
import pandas as pd

from pymgrid_tpu.nonmodular import NonModularMicrogrid
from pymgrid_tpu.paths import data_dir

__all__ = ["MicrogridGenerator"]


class MicrogridGenerator:
    def __init__(self, nb_microgrid=10, random_seed=42, timestep=1, path=None):
        np.random.seed(random_seed)
        self.microgrids = []
        self.nb_microgrids = nb_microgrid
        self.timestep = 1
        self.path = str(path) if path is not None else None

    # ------------------------------------------------------------- utilities
    def _data_path(self, kind):
        if self.path is not None:
            return Path(self.path) / "data" / kind
        return Path(data_dir()) / kind

    def _get_random_file(self, path):
        data_files = list(Path(path).glob("*.csv"))
        if not len(data_files):
            raise NameError(f"Unable to find csv data files in {path}")
        return pd.read_csv(np.random.choice(data_files))

    def _scale_ts(self, df_ts, size, scaling_method="sum"):
        actual_ratio = 1
        if scaling_method == "sum":
            actual_ratio = size / df_ts.sum()
        if scaling_method == "max":
            actual_ratio = size / df_ts.max()
        return df_ts * actual_ratio

    def _resize_timeseries(self, timeseries, current_time_step, new_time_step):
        index = pd.date_range(
            "1/1/2015 00:00:00",
            freq=str(int(current_time_step * 60)) + "min",
            periods=len(timeseries),
        )
        try:
            timeseries = timeseries.squeeze()
        except AttributeError:
            pass
        try:
            timeseries = timeseries.values
        except AttributeError:
            pass
        unsampled = pd.Series(timeseries, index=index)
        resampled = (
            unsampled.resample(rule=str(int(new_time_step * 60)) + "min")
            .mean()
            .interpolate(method="linear")
        )
        return resampled.values

    def _get_pv_ts(self):
        return self._get_random_file(self._data_path("pv"))

    def _get_load_ts(self):
        return self._get_random_file(self._data_path("load"))

    def _get_co2_ts(self):
        return self._get_random_file(self._data_path("co2"))

    # ------------------------------------------------------------ components
    def _get_genset(self, rated_power=1000, pmax=0.9, pmin=0.05):
        polynom = [np.random.rand() * 10, np.random.rand(), np.random.rand() / 10]
        return {
            "polynom": polynom,
            "rated_power": rated_power,
            "pmax": pmax,
            "pmin": pmin,
            "fuel_cost": 0.4,
            "co2": 2,
        }

    def _get_battery(
        self, capa=1000, duration=4, pcharge=100, pdischarge=100, soc_max=1,
        soc_min=0.2, efficiency=0.9,
    ):
        return {
            "capa": capa,
            "pcharge": int(np.ceil(capa / duration)),
            "pdischarge": int(np.ceil(capa / duration)),
            "soc_max": soc_max,
            "soc_min": soc_min,
            "efficiency": efficiency,
            "soc_0": min(max(np.random.randn(), soc_min), soc_max),
            "cost_cycle": 0.02,
        }

    def _get_electricity_tariff(self, scenario):
        """TOU tariffs: 1 = PG&E A-6 2020 summer; 2 = French commercial
        (Marseille plage 5)."""
        price_import = []
        price_export = np.zeros((8760,))

        if scenario == 1:
            for i in range(8760):
                if 12 <= i % 24 < 18:
                    price_import.append(0.59)
                elif i % 24 < 8 or i % 24 >= 21:
                    price_import.append(0.22)
                else:
                    price_import.append(0.29)
        if scenario == 2:
            for i in range(8760):
                if (0 <= i % 24 < 5) or (14 <= i % 24 < 17):
                    price_import.append(0.08)
                else:
                    price_import.append(0.11)

        return price_import, price_export

    def _get_grid(self, rated_power=1000, weak_grid=0, pmin=0.2, price_scenario=0,
                  price_export=0, price_import=0.3):
        if weak_grid == 1:
            rand_outage_per_day = np.random.randn() * 3 / 4 + 0.25
            rand_duration = np.random.randint(low=1, high=8)
            grid_ts = self._generate_weak_grid_profile(
                rand_outage_per_day, rand_duration, 8760 / self.timestep
            )
        else:
            grid_ts = pd.DataFrame(
                np.ones(int(np.floor(8760 / self.timestep))), columns=["grid_status"]
            )

        grid_ts = grid_ts.iloc[:8760]
        price_import, price_export = self._get_electricity_tariff(price_scenario)

        return {
            "grid_power_import": rated_power,
            "grid_power_export": rated_power,
            "grid_ts": grid_ts,
            "grid_price_export": pd.DataFrame(price_export),
            "grid_price_import": pd.DataFrame(price_import),
        }

    def _generate_weak_grid_profile(self, outage_per_day, duration_of_outage,
                                    nb_time_step_per_year):
        weak_grid_timeseries = np.random.random(int(nb_time_step_per_year + 1))
        weak_grid_timeseries = [
            0 if weak_grid_timeseries[i] < outage_per_day / 24 else 1
            for i in range(len(weak_grid_timeseries))
        ]
        timestep = 8760 / nb_time_step_per_year
        for i in range(len(weak_grid_timeseries)):
            if weak_grid_timeseries[i] == 0:
                for j in range(1, int(duration_of_outage / timestep)):
                    if i - j > 0:
                        weak_grid_timeseries[i - j] = 0
        return pd.DataFrame(weak_grid_timeseries, columns=["grid_status"])

    # ---------------------------------------------------------------- sizing
    def _size_mg(self, load, size_load=1):
        pv = load.max().values[0] * (np.random.randint(low=30, high=151) / 100)
        return {
            "pv": pv,
            "load": size_load,
            "battery": self._size_battery(load),
            "genset": self._size_genset(load),
            "grid": int(max(load.values) * 2),
        }

    def _size_genset(self, load, max_operating_loading=0.9):
        return int(np.ceil(np.max(load) / max_operating_loading))

    def _size_battery(self, load):
        return int(np.ceil(np.random.randint(low=3, high=6) * np.mean(load).item()))

    def _size_load(self, size_load=None):
        if size_load is None:
            return np.random.randint(low=100, high=100001)
        return size_load

    def _bin_genset_grid(self):
        rand = np.random.rand()
        bin_genset, bin_grid = 0, 0
        if rand < 0.33:
            bin_genset = 1
        elif rand < 0.66:
            bin_grid = 1
        else:
            bin_genset = 1
            bin_grid = 1
        return bin_genset, bin_grid

    # ------------------------------------------------------------ generation
    def generate_microgrid(self, modular=True, verbose=False):
        convert = lambda x: x.to_modular() if modular else x
        for _ in range(self.nb_microgrids):
            self.microgrids.append(convert(self._create_microgrid()))
        if verbose and not modular:
            self.print_mg_parameters()
        return self

    @classmethod
    def load(cls, scenario):
        from pymgrid_tpu.microgrid import Microgrid
        from pymgrid_tpu.paths import scenario_yaml_path

        instance = cls()
        instance.microgrids = [
            Microgrid.load(open(scenario_yaml_path(j))) for j in range(25)
        ]
        return instance

    def _create_microgrid(self):
        bin_genset, bin_grid = self._bin_genset_grid()
        architecture = {"PV": 1, "battery": 1, "genset": bin_genset, "grid": bin_grid}
        size_load = self._size_load()
        load = self._scale_ts(self._get_load_ts(), size_load, scaling_method="max")
        size = self._size_mg(load, size_load)

        column_actions, column_actual_production, column_cost = [], [], []
        grid_ts = []
        grid_price_export_ts, grid_price_import_ts, grid_co2_ts = [], [], []
        df_parameters = pd.DataFrame()
        df_status = {}
        df_co2 = {"co2": []}

        df_parameters["load"] = [size_load]
        df_parameters["cost_loss_load"] = 10
        df_parameters["cost_overgeneration"] = 1
        df_parameters["cost_co2"] = 0.1
        df_status["load"] = [np.around(load.iloc[0, 0], 1)]
        df_status["hour"] = [0]
        column_actual_production.extend(["loss_load", "overgeneration"])
        column_actions.append("load")
        column_cost.extend(["loss_load", "overgeneration", "co2"])

        if architecture["PV"] == 1:
            df_parameters["PV_rated_power"] = np.around(size["pv"], 2)
            column_actual_production.extend(["pv_consummed", "pv_curtailed"])
            column_actions.extend(["pv_consummed", "pv_curtailed", "pv"])
            pv = pd.DataFrame(
                self._scale_ts(self._get_pv_ts(), size["pv"], scaling_method="max")
            )
            df_status["pv"] = [np.around(pv.iloc[0].values[0], 1)]

        if architecture["battery"] == 1:
            battery = self._get_battery(capa=size["battery"])
            df_parameters["battery_soc_0"] = battery["soc_0"]
            df_parameters["battery_power_charge"] = battery["pcharge"]
            df_parameters["battery_power_discharge"] = battery["pdischarge"]
            df_parameters["battery_capacity"] = battery["capa"]
            df_parameters["battery_efficiency"] = battery["efficiency"]
            df_parameters["battery_soc_min"] = battery["soc_min"]
            df_parameters["battery_soc_max"] = battery["soc_max"]
            df_parameters["battery_cost_cycle"] = battery["cost_cycle"]
            column_actual_production.extend(["battery_charge", "battery_discharge"])
            column_actions.extend(["battery_charge", "battery_discharge"])
            column_cost.append("battery")
            df_status["battery_soc"] = [battery["soc_0"]]

            capa_to_charge = max(
                (
                    df_parameters["battery_soc_max"].values[0]
                    * df_parameters["battery_capacity"].values[0]
                    - df_parameters["battery_soc_0"].iloc[-1]
                    * df_parameters["battery_capacity"].values[0]
                )
                / df_parameters["battery_efficiency"].values[0],
                0,
            )
            capa_to_discharge = max(
                (
                    df_parameters["battery_soc_0"].iloc[-1]
                    * df_parameters["battery_capacity"].values[0]
                    - df_parameters["battery_soc_min"].values[0]
                    * df_parameters["battery_capacity"].values[0]
                )
                * df_parameters["battery_efficiency"].values[0],
                0,
            )
            df_status["capa_to_charge"] = [np.around(capa_to_charge, 1)]
            df_status["capa_to_discharge"] = [np.around(capa_to_discharge, 1)]

        grid_spec = 0

        if architecture["grid"] == 1:
            rand_weak_grid = np.random.randint(low=0, high=2)
            price_scenario = np.random.randint(low=1, high=3)
            if rand_weak_grid == 1:
                architecture["genset"] = 1
            grid = self._get_grid(
                rated_power=size["grid"], weak_grid=rand_weak_grid,
                price_scenario=price_scenario,
            )
            df_parameters["grid_weak"] = rand_weak_grid
            df_parameters["grid_power_import"] = grid["grid_power_import"]
            df_parameters["grid_power_export"] = grid["grid_power_export"]
            grid_ts = grid["grid_ts"]
            column_actual_production.extend(["grid_import", "grid_export"])
            column_actions.extend(["grid_import", "grid_export"])
            column_cost.extend(["grid_import", "grid_export"])
            df_status["grid_status"] = [grid_ts.iloc[0, 0]]
            grid_co2_ts = self._get_co2_ts()
            df_status["grid_co2"] = [grid_co2_ts.iloc[0, 0]]

            grid_price_import_ts = grid["grid_price_import"]
            grid_price_export_ts = grid["grid_price_export"]
            df_status["grid_price_import"] = [grid_price_import_ts.iloc[0, 0]]
            df_status["grid_price_export"] = [grid_price_export_ts.iloc[0, 0]]

        if architecture["genset"] == 1:
            genset = self._get_genset(rated_power=size["genset"])
            df_parameters["genset_polynom_order"] = len(genset["polynom"])
            for i in range(len(genset["polynom"])):
                df_parameters["genset_polynom_" + str(i)] = genset["polynom"][i]
            df_parameters["genset_rated_power"] = genset["rated_power"]
            df_parameters["genset_pmin"] = genset["pmin"]
            df_parameters["genset_pmax"] = genset["pmax"]
            df_parameters["fuel_cost"] = genset["fuel_cost"]
            df_parameters["genset_co2"] = genset["co2"]
            column_actual_production.append("genset")
            column_actions.append("genset")
            column_cost.append("genset")

        column_cost.append("total_cost")
        df_actions = {key: [] for key in column_actions}
        df_actual_production = {key: [] for key in column_actual_production}
        df_cost = {key: [] for key in column_cost}

        microgrid_spec = {
            "parameters": df_parameters,
            "df_actions": df_actions,
            "architecture": architecture,
            "df_status": df_status,
            "df_actual_generation": df_actual_production,
            "grid_spec": grid_spec,
            "df_cost": df_cost,
            "df_co2": df_co2,
            "pv": pv,
            "load": load,
            "grid_ts": grid_ts,
            "control_dict": column_actions,
            "grid_price_import": grid_price_import_ts,
            "grid_price_export": grid_price_export_ts,
            "grid_co2": grid_co2_ts,
        }
        return NonModularMicrogrid(microgrid_spec)

    def print_mg_parameters(self, id="all"):
        if id == "all":
            if self.microgrids:
                parameters = pd.concat(
                    [m.parameters for m in self.microgrids], ignore_index=True
                )
                pd.options.display.max_columns = None
                print(parameters)
        elif isinstance(id, int) and id < self.nb_microgrids:
            print(self.microgrids[id].parameters)
