DEFAULT_HORIZON = 23

from pymgrid_tpu.microgrid.microgrid import Microgrid
from pymgrid_tpu.microgrid.step import MicrogridStep
from pymgrid_tpu.microgrid import trajectory, reward_shaping

__all__ = ["Microgrid", "MicrogridStep", "DEFAULT_HORIZON", "trajectory", "reward_shaping"]
