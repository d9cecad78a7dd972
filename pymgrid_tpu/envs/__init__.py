from pymgrid_tpu.envs.base import BaseMicrogridEnv
from pymgrid_tpu.envs.discrete import DiscreteMicrogridEnv
from pymgrid_tpu.envs.continuous import ContinuousMicrogridEnv

__all__ = ["BaseMicrogridEnv", "DiscreteMicrogridEnv", "ContinuousMicrogridEnv"]
