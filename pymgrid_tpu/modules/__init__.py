from pymgrid_tpu.modules.base import BaseMicrogridModule, BaseTimeSeriesMicrogridModule
from pymgrid_tpu.modules.battery import BatteryModule
from pymgrid_tpu.modules.genset import GensetModule
from pymgrid_tpu.modules.grid import GridModule
from pymgrid_tpu.modules.load import LoadModule
from pymgrid_tpu.modules.renewable import RenewableModule
from pymgrid_tpu.modules.unbalanced import UnbalancedEnergyModule
from pymgrid_tpu.modules.container import Container, ModuleContainer, ModuleList, get_subcontainers

__all__ = [
    "BaseMicrogridModule",
    "BaseTimeSeriesMicrogridModule",
    "BatteryModule",
    "GensetModule",
    "GridModule",
    "LoadModule",
    "RenewableModule",
    "UnbalancedEnergyModule",
    "Container",
    "ModuleContainer",
    "ModuleList",
    "get_subcontainers",
]
