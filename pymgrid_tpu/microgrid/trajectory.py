"""Episode trajectory functions.

YAML-serializable callables ``(initial_step, final_step) -> (initial, final)``
invoked on every reset (reference: ``src/pymgrid/microgrid/trajectory/``).
"""
import inspect

import numpy as np
import yaml

from pymgrid_tpu.utils.serialize import PymgridDumper, PymgridLoader, yaml_dump, yaml_load

__all__ = [
    "BaseTrajectory",
    "DeterministicTrajectory",
    "StochasticTrajectory",
    "FixedLengthStochasticTrajectory",
]


class BaseTrajectory(yaml.YAMLObject):
    yaml_dumper = PymgridDumper
    yaml_loader = PymgridLoader

    def __getstate__(self):
        # Python 3.11+ object.__getstate__ returns None for empty instances,
        # which PyYAML's represent_yaml_object cannot handle
        return dict(self.__dict__)

    def __call__(self, initial_step, final_step):
        raise NotImplementedError

    def __repr__(self):
        params = inspect.signature(self.__init__).parameters
        formatted = ", ".join(f"{p}={getattr(self, p)}" for p in params)
        return f"{self.__class__.__name__}({formatted})"

    def __eq__(self, other):
        if type(self) != type(other):
            return NotImplemented
        return repr(self) == repr(other)


class DeterministicTrajectory(BaseTrajectory):
    yaml_tag = "!DeterministicTrajectory"

    def __init__(self, initial_step, final_step):
        self.initial_step = initial_step
        self.final_step = final_step

    def __call__(self, initial_step, final_step):
        return self.initial_step, self.final_step


class StochasticTrajectory(BaseTrajectory):
    """Uniform random sub-episode of the available range."""

    yaml_tag = "!StochasticTrajectory"

    def __call__(self, initial_step, final_step):
        initial = np.random.randint(initial_step, final_step - 2)
        final = np.random.randint(initial, final_step)
        return initial, final


class FixedLengthStochasticTrajectory(BaseTrajectory):
    """Random start, fixed episode length."""

    yaml_tag = "!FixedLengthStochasticTrajectory"

    def __init__(self, trajectory_length):
        self.trajectory_length = trajectory_length

    def __call__(self, initial_step, final_step):
        if final_step - initial_step < self.trajectory_length:
            raise ValueError(
                f"Cannot create a trajectory of length {self.trajectory_length}"
                f"between initial_step ({initial_step}) and final_step ({final_step})"
            )
        initial = np.random.randint(initial_step, final_step - self.trajectory_length)
        return initial, initial + self.trajectory_length
