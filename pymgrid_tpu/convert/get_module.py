"""Legacy component -> module constructors (reference ``convert/get_module.py``)."""
import pandas as pd

from pymgrid_tpu.modules import (
    BatteryModule,
    GensetModule,
    GridModule,
    LoadModule,
    RenewableModule,
    UnbalancedEnergyModule,
)

__all__ = ["get_module"]


def get_module(component, nonmodular, raise_errors):
    builders = {
        "load": get_load_module,
        "PV": get_pv_module,
        "battery": get_battery_module,
        "genset": get_genset_module,
        "grid": get_grid_module,
        "unbalanced_energy": get_unbalanced_energy_module,
    }
    try:
        return builders[component](nonmodular, raise_errors)
    except KeyError:
        raise ValueError(f"Cannot parse component {component}.")


def get_load_module(nonmodular, raise_errors):
    return LoadModule(
        time_series=nonmodular._load_ts,
        forecaster="oracle",
        forecast_horizon=nonmodular.horizon - 1,
        raise_errors=raise_errors,
    )


def get_pv_module(nonmodular, raise_errors):
    return RenewableModule(
        time_series=nonmodular._pv_ts,
        raise_errors=raise_errors,
        forecaster="oracle",
        forecast_horizon=nonmodular.horizon - 1,
    )


def get_battery_module(nonmodular, raise_errors):
    battery = nonmodular.battery
    return BatteryModule(
        min_capacity=battery.capacity * battery.soc_min,
        max_capacity=battery.capacity,
        max_charge=battery.p_charge_max,
        max_discharge=battery.p_discharge_max,
        efficiency=battery.efficiency,
        battery_cost_cycle=battery.cost_cycle,
        init_soc=battery.soc,
        raise_errors=raise_errors,
    )


def get_genset_module(nonmodular, raise_errors):
    genset = nonmodular.genset
    return GensetModule(
        running_min_production=genset.p_min * genset.rated_power,
        running_max_production=genset.p_max * genset.rated_power,
        genset_cost=genset.fuel_cost,
        co2_per_unit=nonmodular.parameters.genset_co2.item(),
        cost_per_unit_co2=nonmodular.parameters.cost_co2.item(),
        start_up_time=0,
        wind_down_time=0,
        raise_errors=raise_errors,
    )


def get_grid_module(nonmodular, raise_errors):
    cost_import = nonmodular._grid_price_import.squeeze()
    cost_import.name = "cost_import"
    cost_export = nonmodular._grid_price_export.squeeze()
    cost_export.name = "cost_export"
    co2_per_unit = nonmodular._grid_co2.squeeze()
    co2_per_unit.name = "co2_per_unit_production"
    grid_status = nonmodular._grid_status_ts.squeeze()
    grid_status.name = "grid_status"
    time_series = pd.concat(
        [cost_import, cost_export, co2_per_unit, grid_status], axis=1
    )
    return GridModule(
        max_import=nonmodular.grid.power_import,
        max_export=nonmodular.grid.power_export,
        time_series=time_series,
        forecaster="oracle",
        forecast_horizon=nonmodular.horizon - 1,
        cost_per_unit_co2=nonmodular.parameters.cost_co2.item(),
        raise_errors=raise_errors,
    )


def get_unbalanced_energy_module(nonmodular, raise_errors):
    return UnbalancedEnergyModule(
        raise_errors=raise_errors,
        loss_load_cost=nonmodular.parameters["cost_loss_load"].item(),
        overgeneration_cost=nonmodular.parameters["cost_overgeneration"].item(),
    )
