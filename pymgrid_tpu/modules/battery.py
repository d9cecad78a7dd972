"""Battery module (host layer).

Mirrors ``src/pymgrid/modules/battery_module.py``: a controllable
source-and-sink with an efficiency-scaled SOC transition.  External discharge
drains ``E/efficiency`` internally; external charge retains ``E*efficiency``.
Cycling costs ``|internal ΔE| * battery_cost_cycle``.
"""
from warnings import warn

import numpy as np
import yaml

from pymgrid_tpu.utils.serialize import PymgridDumper, PymgridLoader, yaml_dump, yaml_load

from pymgrid_tpu.core import physics
from pymgrid_tpu.modules.base import BaseMicrogridModule

__all__ = ["BatteryModule"]


class BatteryModule(BaseMicrogridModule):
    module_type = ("battery", "controllable")
    yaml_tag = "!BatteryModule"
    yaml_dumper = PymgridDumper
    yaml_loader = PymgridLoader

    def __init__(
        self,
        min_capacity,
        max_capacity,
        max_charge,
        max_discharge,
        efficiency,
        battery_cost_cycle=0.0,
        battery_transition_model=None,
        init_charge=None,
        init_soc=None,
        initial_step=0,
        raise_errors=False,
    ):
        assert 0 < efficiency <= 1
        self.min_capacity = min_capacity
        self.max_capacity = max_capacity
        self.max_charge = max_charge
        self.max_discharge = max_discharge
        self.efficiency = efficiency
        self.battery_transition_model = battery_transition_model
        self.battery_cost_cycle = battery_cost_cycle

        self.min_soc, self.max_soc = min_capacity / max_capacity, 1
        self.init_charge, self.init_soc = init_charge, init_soc
        self._current_charge, self._soc = self._init_battery(init_charge, init_soc)
        self.name = ("battery", None)
        super().__init__(
            raise_errors,
            initial_step=initial_step,
            provided_energy_name="discharge_amount",
            absorbed_energy_name="charge_amount",
        )

    def _init_battery(self, init_charge, init_soc):
        if init_charge is not None:
            if init_soc is not None:
                warn("Passed both init_capacity and init_soc. Using init_charge and ignoring init_soc")
            init_soc = init_charge / self.max_capacity
        elif init_soc is not None:
            init_charge = init_soc * self.max_capacity
        else:
            raise ValueError("Must set one of init_charge and init_soc.")
        return init_charge, init_soc

    def update(self, external_energy_change, as_source=False, as_sink=False):
        assert as_source + as_sink == 1, "Must act as either source or sink but not both or neither."

        if as_source:
            info_key = "provided_energy"
            internal_energy_change = self.model_transition(-1.0 * external_energy_change)
            assert internal_energy_change <= 0
        else:
            info_key = "absorbed_energy"
            internal_energy_change = self.model_transition(external_energy_change)
            assert internal_energy_change >= 0

        self._update_state(internal_energy_change)
        reward = -1.0 * self.get_cost(internal_energy_change)
        return reward, False, {info_key: external_energy_change}

    def _update_state(self, energy_change):
        self._current_charge += energy_change
        if self._current_charge < self.min_capacity:
            assert np.isclose(self._current_charge, self.min_capacity)
            self._current_charge = self.min_capacity
        self._soc = self._current_charge / self.max_capacity

    def get_cost(self, energy_change):
        return np.abs(energy_change) * self.battery_cost_cycle

    def model_transition(self, energy):
        if self.battery_transition_model is None:
            return float(
                physics.battery_model_transition(energy, self.efficiency)
            )
        return self.battery_transition_model(
            external_energy_change=energy, **self.transition_kwargs()
        )

    def transition_kwargs(self):
        return dict(
            min_capacity=self.min_capacity,
            max_capacity=self.max_capacity,
            max_charge=self.max_charge,
            max_discharge=self.max_discharge,
            efficiency=self.efficiency,
            battery_cost_cycle=self.battery_cost_cycle,
            max_production=self.max_production,
            max_consumption=self.max_consumption,
            state_dict=self.state_dict(),
        )

    def _state_dict(self):
        return dict(zip(("soc", "current_charge"), [self._soc, self._current_charge]))

    @property
    def max_production(self):
        return float(
            physics.battery_max_production(
                self._current_charge, self.min_capacity, self.max_discharge, self.efficiency
            )
        )

    @property
    def max_consumption(self):
        return float(
            physics.battery_max_consumption(
                self._current_charge, self.max_capacity, self.max_charge, self.efficiency
            )
        )

    @property
    def current_charge(self):
        return self._current_charge

    @current_charge.setter
    def current_charge(self, value):
        self._current_charge, self._soc = self._init_battery(value, None)

    @property
    def soc(self):
        return self._soc

    @soc.setter
    def soc(self, value):
        self._current_charge, self._soc = self._init_battery(None, value)

    @property
    def min_obs(self):
        return np.array([self.min_soc, self.min_capacity])

    @property
    def max_obs(self):
        return np.array([self.max_soc, self.max_capacity])

    @property
    def min_act(self):
        return -self.max_discharge / self.efficiency

    @property
    def max_act(self):
        return self.max_charge * self.efficiency

    @property
    def production_marginal_cost(self):
        return self.battery_cost_cycle

    @property
    def absorption_marginal_cost(self):
        return self.battery_cost_cycle

    @property
    def is_source(self):
        return True

    @property
    def is_sink(self):
        return True
