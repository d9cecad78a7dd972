DEFAULT_HORIZON = 23

from pymgrid_tpu.microgrid.microgrid import Microgrid
from pymgrid_tpu.microgrid import trajectory, reward_shaping

__all__ = ["Microgrid", "DEFAULT_HORIZON", "trajectory", "reward_shaping"]
