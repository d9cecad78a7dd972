"""Unbalanced-energy (balancing) module (host layer).

Mirrors ``src/pymgrid/modules/unbalanced_energy_module.py``: an infinite flex
source-and-sink, auto-appended to every microgrid, that reconciles the energy
balance and charges ``loss_load_cost`` per unit of unmet demand (as a source)
and ``overgeneration_cost`` per unit of excess production (as a sink).
"""
import numpy as np
import yaml

from pymgrid_tpu.utils.serialize import PymgridDumper, PymgridLoader, yaml_dump, yaml_load

from pymgrid_tpu.modules.base import BaseMicrogridModule

__all__ = ["UnbalancedEnergyModule"]


class UnbalancedEnergyModule(BaseMicrogridModule):
    module_type = ("balancing", "flex")
    yaml_tag = "!UnbalancedEnergyModule"
    yaml_dumper = PymgridDumper
    yaml_loader = PymgridLoader

    def __init__(self, raise_errors, initial_step=0, loss_load_cost=10, overgeneration_cost=2.0):
        super().__init__(
            raise_errors,
            initial_step=initial_step,
            provided_energy_name="loss_load",
            absorbed_energy_name="overgeneration",
        )
        self.loss_load_cost = loss_load_cost
        self.overgeneration_cost = overgeneration_cost
        self.name = ("unbalanced_energy", None)

    def update(self, external_energy_change, as_source=False, as_sink=False):
        assert as_source + as_sink == 1, "Must act as either source or sink but not both or neither."
        info_key = "provided_energy" if as_source else "absorbed_energy"
        reward = -1.0 * self.get_cost(external_energy_change, as_source, as_sink)
        assert reward <= 0
        return reward, False, {info_key: external_energy_change}

    def get_cost(self, energy_amount, as_source, as_sink):
        if as_source and as_sink:
            raise TypeError("as_source and as_sink cannot both be True.")
        if as_source:  # loss load
            return self.loss_load_cost * energy_amount
        if as_sink:  # overgeneration
            return self.overgeneration_cost * energy_amount
        raise TypeError("One of as_source or as_sink must be True.")

    def _state_dict(self):
        return dict()

    @property
    def state(self):
        return np.array([])

    @property
    def min_obs(self):
        return np.array([])

    @property
    def max_obs(self):
        return np.array([])

    @property
    def min_act(self):
        return -np.inf

    @property
    def max_act(self):
        return np.inf

    @property
    def max_production(self):
        return np.inf

    @property
    def max_consumption(self):
        return np.inf

    @property
    def is_source(self):
        return True

    @property
    def is_sink(self):
        return True

    @property
    def production_marginal_cost(self):
        return self.loss_load_cost

    @property
    def absorption_marginal_cost(self):
        return self.overgeneration_cost
