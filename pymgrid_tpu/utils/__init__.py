from pymgrid_tpu.utils.logger import ModularLogger
from pymgrid_tpu.utils.serialize import add_pymgrid_yaml_representers
from pymgrid_tpu.utils.space import Box, ModuleSpace, MicrogridSpace

__all__ = [
    "ModularLogger",
    "Box",
    "ModuleSpace",
    "MicrogridSpace",
    "add_pymgrid_yaml_representers",
]
