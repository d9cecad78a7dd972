from pymgrid_tpu.envs.discrete import DiscreteMicrogridEnv
from pymgrid_tpu.envs.continuous import ContinuousMicrogridEnv

__all__ = ["DiscreteMicrogridEnv", "ContinuousMicrogridEnv"]
