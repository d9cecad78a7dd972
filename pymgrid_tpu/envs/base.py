"""Base RL environment.

Mirrors ``src/pymgrid/envs/base/base.py``: an environment is a
:class:`~pymgrid_tpu.microgrid.Microgrid` with gym-style
``reset``/``step``/spaces.  Observation spaces are per-module normalized
boxes, optionally filtered by state-dict key names and flattened.

The constructor accepts a module list, a ``Microgrid`` /
``NonModularMicrogrid`` instance, or a pymgrid25 scenario number (the
reference's ``__new__`` dispatch).
"""
from pymgrid_tpu.microgrid import Microgrid
from pymgrid_tpu.utils.space import Box
from pymgrid_tpu.utils.gym_spaces import Dict, Tuple, flatten, flatten_space

__all__ = ["BaseMicrogridEnv", "skip_init"]


def skip_init(cls, init):
    """One-shot ``__init__`` suppressor for the ``__new__`` dispatch
    (reference ``envs/base/skip_init.py``)."""

    def wrapper(self, *args, **kwargs):
        cls.__init__ = init
        return None

    return wrapper


class BaseMicrogridEnv(Microgrid):
    action_space = None
    observation_space = None

    def __new__(cls, modules, *args, **kwargs):
        from pymgrid_tpu.nonmodular import NonModularMicrogrid

        if isinstance(modules, (NonModularMicrogrid, Microgrid)):
            instance = cls.from_microgrid(modules, **kwargs)
        elif isinstance(modules, int):
            instance = cls.from_scenario(modules, **kwargs)
        else:
            return super().__new__(cls)

        cls.__init__ = skip_init(cls, cls.__init__)
        return instance

    def __init__(
        self,
        modules,
        add_unbalanced_module=True,
        loss_load_cost=10,
        overgeneration_cost=2,
        reward_shaping_func=None,
        trajectory_func=None,
        flat_spaces=True,
        observation_keys=(),
    ):
        super().__init__(
            modules,
            add_unbalanced_module=add_unbalanced_module,
            loss_load_cost=loss_load_cost,
            overgeneration_cost=overgeneration_cost,
            reward_shaping_func=reward_shaping_func,
            trajectory_func=trajectory_func,
        )

        self._flat_spaces = flat_spaces
        self.observation_keys = self._validate_observation_keys(observation_keys)

        self.action_space = self._get_action_space()
        self.observation_space, self._nested_observation_space = (
            self._get_observation_space()
        )

    def _validate_observation_keys(self, keys):
        if not keys:
            return keys
        if isinstance(keys, str):
            keys = [keys]

        possible_keys = self.state_series().index.get_level_values(-1).unique()
        bad_keys = [key for key in keys if key not in possible_keys]
        if bad_keys:
            raise NameError(f"Keys {bad_keys} not found in state.")
        return keys

    def _get_action_space(self, remove_redundant_actions=False):
        raise NotImplementedError

    def _get_observation_space(self):
        import numpy as np

        obs_space = {}
        state_series = self.state_series()

        for name, module_list in self.modules.iterdict():
            tup = []
            for module_num, module in enumerate(module_list):
                normalized_space = module.observation_space["normalized"]

                if not self.observation_keys:
                    tup.append(normalized_space)
                else:
                    try:
                        relevant = state_series.loc[(name, module_num)]
                    except KeyError:
                        continue
                    relevant_idx = relevant.index
                    locs = [
                        relevant_idx.get_loc(key)
                        for key in self.observation_keys
                        if key in relevant_idx
                    ]
                    if locs:
                        tup.append(
                            Box(
                                normalized_space.low[locs],
                                normalized_space.high[locs],
                                shape=(len(locs),),
                            )
                        )
            if tup:
                obs_space[name] = Tuple(tup)

        obs_space = Dict(obs_space)
        return (
            flatten_space(obs_space) if self._flat_spaces else obs_space
        ), obs_space

    def reset(self):
        obs = super().reset()
        return self._get_obs(obs)

    def step(self, action, normalized=True):
        obs, reward, done, info = self.run(action, normalized=normalized)
        obs = self._get_obs(obs)
        return obs, reward, done, info

    def _get_obs(self, obs):
        import pandas as pd

        if self.observation_keys:
            obs = self.state_series(normalized=True).loc[
                pd.IndexSlice[:, :, self.observation_keys]
            ]
            if self._flat_spaces:
                obs = obs.values
            else:
                obs = (
                    obs.to_frame()
                    .unstack(level=1)
                    .T.droplevel(level=1, axis=1)
                    .to_dict(orient="list")
                )
        elif self._flat_spaces:
            obs = flatten(
                self._nested_observation_space,
                {k: v for k, v in obs.items() if k in self._nested_observation_space.spaces},
            )
        return obs

    def render(self, mode="human"):
        raise NotImplementedError

    @property
    def unwrapped(self):
        return self

    @property
    def flat_spaces(self):
        return self._flat_spaces

    @classmethod
    def from_microgrid(cls, microgrid, **kwargs):
        try:
            modules = microgrid.modules
        except AttributeError:
            from pymgrid_tpu.nonmodular import NonModularMicrogrid

            assert isinstance(microgrid, NonModularMicrogrid)
            return cls.from_nonmodular(microgrid, **kwargs)

        kwargs = kwargs.copy()
        kwargs["add_unbalanced_module"] = kwargs.pop("add_unbalanced_module", False)
        kwargs["reward_shaping_func"] = kwargs.pop(
            "reward_shaping_func", microgrid.reward_shaping_func
        )
        kwargs["trajectory_func"] = kwargs.pop(
            "trajectory_func", microgrid.trajectory_func
        )
        return cls(modules.to_tuples(), **kwargs)

    @classmethod
    def from_nonmodular(cls, nonmodular, **kwargs):
        microgrid = super().from_nonmodular(nonmodular)
        return cls.from_microgrid(microgrid, **kwargs)

    @classmethod
    def from_scenario(cls, microgrid_number=0, **kwargs):
        env = super().from_scenario(microgrid_number=microgrid_number)
        if kwargs:
            return cls.from_microgrid(env, **kwargs)
        return env

    @classmethod
    def load(cls, stream):
        return cls(super().load(stream))
