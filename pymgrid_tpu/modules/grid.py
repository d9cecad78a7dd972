"""Grid module (host layer).

Mirrors ``src/pymgrid/modules/grid_module.py``: a controllable
source-and-sink driven by a time series of
``(import_price, export_price, co2_per_kwh[, grid_status])``.  Three-column
series are padded with an always-up status column; outages zero both bounds.
Import reward is ``-(import_price + cost_per_unit_co2 * co2_per_kwh) * E``;
export reward is ``+export_price * E`` with no CO2.
"""
import numpy as np
import yaml

from pymgrid_tpu.utils.serialize import PymgridDumper, PymgridLoader, yaml_dump, yaml_load

from pymgrid_tpu.modules.base import BaseTimeSeriesMicrogridModule, DEFAULT_HORIZON

__all__ = ["GridModule"]


class GridModule(BaseTimeSeriesMicrogridModule):
    module_type = ("grid", "controllable")
    yaml_tag = "!GridModule"
    yaml_dumper = PymgridDumper
    yaml_loader = PymgridLoader

    state_components = np.array(
        ["import_price", "export_price", "co2_per_kwh", "grid_status"], dtype=object
    )

    def __init__(
        self,
        max_import,
        max_export,
        time_series,
        forecaster=None,
        forecast_horizon=DEFAULT_HORIZON,
        forecaster_increase_uncertainty=False,
        forecaster_relative_noise=False,
        initial_step=0,
        final_step=-1,
        cost_per_unit_co2=0.0,
        raise_errors=False,
    ):
        time_series = self._check_params(max_import, max_export, time_series)
        self.max_import, self.max_export = max_import, max_export
        self.cost_per_unit_co2 = cost_per_unit_co2
        self.name = ("grid", None)
        super().__init__(
            time_series,
            raise_errors,
            forecaster=forecaster,
            forecast_horizon=forecast_horizon,
            forecaster_increase_uncertainty=forecaster_increase_uncertainty,
            forecaster_relative_noise=forecaster_relative_noise,
            initial_step=initial_step,
            final_step=final_step,
            provided_energy_name="grid_import",
            absorbed_energy_name="grid_export",
        )

    def _check_params(self, max_import, max_export, time_series):
        if max_import < 0:
            raise ValueError("parameter max_import must be non-negative.")
        if max_export < 0:
            raise ValueError("parameter max_export must be non-negative.")
        if time_series.shape[1] not in (3, 4):
            raise ValueError(
                "Time series must be two dimensional with three or four columns."
                "See docstring for details."
            )
        if time_series.shape[1] == 4:
            status = np.asarray(time_series)[:, -1]
            if not ((status == 0) | (status == 1)).all():
                raise ValueError("Last column (grid status) must contain binary values.")
        else:
            new_ts = np.ones((time_series.shape[0], 4))
            new_ts[:, :3] = time_series
            time_series = new_ts
        if (np.asarray(time_series) < 0).any():
            raise ValueError("Time series must be non-negative.")
        return time_series

    def _get_bounds(self):
        min_obs = self._time_series.min(axis=0)
        max_obs = self._time_series.max(axis=0)
        assert len(min_obs) in (3, 4)
        return min_obs, max_obs, -1 * self.max_export, self.max_import

    def update(self, external_energy_change, as_source=False, as_sink=False):
        assert as_source + as_sink == 1, "Must act as either source or sink but not both or neither."
        reward = self.get_cost(external_energy_change, as_source, as_sink)
        info_key = "provided_energy" if as_source else "absorbed_energy"
        info = {
            info_key: external_energy_change,
            "co2_production": self.get_co2_production(external_energy_change, as_source, as_sink),
        }
        return reward, self._done(), info

    def get_cost(self, import_export, as_source, as_sink):
        """Reward of using the grid (negative = cost); export may be revenue."""
        if as_source:  # import
            import_cost = self._time_series[self.current_step, 0]
            return -1 * import_cost * import_export + self.get_co2_cost(
                import_export, as_source, as_sink
            )
        if as_sink:  # export
            export_cost = self._time_series[self.current_step, 1]
            return export_cost * import_export + self.get_co2_cost(
                import_export, as_source, as_sink
            )
        raise RuntimeError

    def get_co2_cost(self, import_export, as_source, as_sink):
        return -1.0 * self.cost_per_unit_co2 * self.get_co2_production(
            import_export, as_source, as_sink
        )

    def get_co2_production(self, import_export, as_source, as_sink):
        if as_source:  # import
            co2_per_kwh = self._time_series[self.current_step, 2]
            return import_export * co2_per_kwh
        if as_sink:
            return 0.0
        raise RuntimeError

    def as_flex(self):
        """Make grid modules flex (class-level, as in ``grid_module.py:230-246``)."""
        self.__class__.module_type = (self.__class__.module_type[0], "flex")

    def as_fixed(self):
        self.__class__.module_type = (self.__class__.module_type[0], "fixed")

    @property
    def import_price(self):
        return self.state[::4]

    @property
    def export_price(self):
        return self.state[1::4]

    @property
    def co2_per_kwh(self):
        return self.state[2::4]

    @property
    def grid_status(self):
        return self.state[3::4]

    @property
    def current_status(self):
        return self.grid_status[0]

    @property
    def max_production(self):
        return self.max_import * self.current_status

    @property
    def max_consumption(self):
        return self.max_export * self.current_status

    @property
    def production_marginal_cost(self):
        return self.import_price[0]

    @property
    def absorption_marginal_cost(self):
        return self.export_price[0]

    @property
    def is_source(self):
        return True

    @property
    def is_sink(self):
        return True

    @property
    def weak_grid(self):
        return self._time_series[:, -1].min() < 1

    def __repr__(self):
        return (
            f"GridModule(max_import={self.max_import}, max_export={self.max_export})"
        )
