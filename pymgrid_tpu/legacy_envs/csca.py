"""Continuous-state continuous-action legacy envs, with safe-exploration
variants.

Mirror of ``src/pymgrid/_deprecated/Environments/pymgrid_csca.py``:

* :class:`MicrogridEnv` — abstract base over a nonmodular microgrid with
  optional random sub-trajectories;
* :class:`ContinuousMicrogridEnv` — direct power set-point actions, with
  standardization constants pre-computed from an MPC run;
* :class:`ContinuousMicrogridSampleEnv` — resamples load/pv/grid from SAA
  forecasts on every reset;
* :class:`SafeExpMicrogridEnv` / :class:`SafeExpMicrogridSampleEnv` —
  expose constraint values (``c_i < 0`` form) for safety-layer RL.

Fixes relative to the reference (which cannot run as shipped):
``np.float`` removed, the genset-case standardization key tuple is an actual
tuple of keys rather than one comma-joined string
(reference pymgrid_csca.py:413), and the action-bound helper tolerates
gridless microgrids (reference reads ``grid_power_import`` unconditionally).
"""
from copy import deepcopy

import numpy as np

from pymgrid_tpu.legacy_envs.preprocessing import sample_reset
from pymgrid_tpu.legacy_envs.environment import generate_sampler
from pymgrid_tpu.nonmodular import NonModularMicrogrid
from pymgrid_tpu.utils.space import Box

# MPC steps used to estimate standardization constants
# (hard-coded to 1000 in the reference, pymgrid_csca.py:409).
STANDARDIZATION_MPC_STEPS = 1000

__all__ = [
    "MicrogridEnv",
    "ContinuousMicrogridEnv",
    "ContinuousMicrogridSampleEnv",
    "SafeExpMicrogridEnv",
    "SafeExpMicrogridSampleEnv",
]


class MicrogridEnv:
    """Gym-style MDP over a nonmodular microgrid (reference lines 55-171)."""

    metadata = {"render.modes": ["human"]}

    def __init__(self, microgrid, trajectory_len=None, max_episode_len=None):
        if isinstance(microgrid, int) and 0 <= microgrid <= 25:
            from pymgrid_tpu.generator import MicrogridGenerator

            print(
                f"Initializing microgrid {microgrid} of 25 using 25 microgrids "
                f"from MicrogridGenerator"
            )
            m_gen = MicrogridGenerator(nb_microgrid=25)
            m_gen.generate_microgrid(verbose=False, modular=False)
            self.microgrid = deepcopy(m_gen.microgrids[microgrid])
        elif isinstance(microgrid, NonModularMicrogrid):
            self.microgrid = deepcopy(microgrid)
        else:
            raise ValueError(
                f"microgrid must be of type NonModularMicrogrid, is {type(microgrid)}"
            )

        assert self.microgrid._data_length == 8760, (
            f"Microgrid data length should be 8760, is {self.microgrid._data_length}"
        )

        self.has_grid = self.microgrid.architecture["grid"] == 1
        self.has_genset = self.microgrid.architecture["genset"] == 1

        observation_dim = len(self.microgrid._df_record_state)
        self.observation_space = Box(
            low=0, high=np.inf, shape=(observation_dim,), dtype=np.float64
        )
        self.action_space = None

        self.current_action = None
        self.current_obs = None

        # horizon doubles as the end-of-data margin in NonModularMicrogrid.run
        if max_episode_len is None:
            self.microgrid.horizon = 0
        else:
            self.microgrid.horizon = self.microgrid._data_length - max_episode_len

        self.trajectory_len = trajectory_len
        self._short_trajectory_set()

    def _short_trajectory_set(self):
        """Start a random fixed-length sub-trajectory (reference lines 101-110)."""
        trajectory_len = self.trajectory_len
        if trajectory_len is not None:
            assert isinstance(trajectory_len, int)
            high_range = (
                self.microgrid._data_length - self.microgrid.horizon - trajectory_len
            )
            start_index = np.random.randint(low=0, high=high_range)
            self.microgrid._tracking_timestep = start_index
            self.microgrid._data_length = (
                start_index + trajectory_len + self.microgrid.horizon
            )

    def reset(self):
        self.microgrid.reset()
        self._short_trajectory_set()
        initial_state = self.microgrid.get_updated_values()
        observations = np.array(list(initial_state.values()))
        self.current_obs = observations
        return observations

    def step(self, action, **kwargs):
        control_dict = self.get_control_dict(action)
        observation = self.run_control(control_dict)
        reward = -1.0 * self.microgrid.get_cost()
        done = self.microgrid.done
        info = dict()

        self.current_obs = observation
        self.current_action = action
        return observation, reward, done, info

    def get_control_dict(self, action):
        return NotImplemented

    def run_control(self, control_dict):
        updated_vals = self.microgrid.run(control_dict)
        # dtype=float maps the microgrid's end-of-data None sentinels (it has
        # no lookahead past the final row) to nan on the terminal step; the
        # reference crashes in standardize() there instead.
        observations = np.array(list(updated_vals.values()), dtype=np.float64)
        assert len(observations) == self.observation_space.shape[0]
        return observations


class ContinuousMicrogridEnv(MicrogridEnv):
    """Continuous states, continuous actions (reference lines 174-484)."""

    def __init__(self, microgrid, standardization=True, trajectory_len=None,
                 max_episode_len=None, **kwargs):
        super().__init__(
            microgrid, trajectory_len=trajectory_len, max_episode_len=max_episode_len
        )
        self.logger = kwargs.get("logger")

        action_dim = 5 + self.has_genset
        upper_bound, lower_bound = self._get_action_ub_lb()
        self.action_space = Box(
            low=lower_bound, high=upper_bound, shape=(action_dim,), dtype=np.float64
        )

        self.standardization = standardization
        if self.standardization:
            self.standardizations = self.pre_compute_standardizations()
            low_new = self.standardize(self.action_space.low, use_proxy="action")
            self.action_space.low = low_new
            high_new = self.standardize(self.action_space.high, use_proxy="action")
            high_new[1] = 0.1  # reference's hard-coded grid_export bound (line 200)
            self.action_space.high = high_new
        else:
            self.standardizations = None

    def _get_action_ub_lb(self):
        params = self.microgrid.parameters

        def _param(name):
            return params[name].values[0] if name in params else 0.0

        p_max_import = _param("grid_power_import")
        p_max_export = _param("grid_power_export")
        p_max_charge = params["battery_power_charge"].values[0]
        p_max_discharge = params["battery_power_discharge"].values[0]
        pv_max = params.PV_rated_power.squeeze()

        upper_bound = [p_max_import, p_max_export, p_max_charge, p_max_discharge, pv_max]
        lower_bound = [0] * 5

        if self.has_genset:
            p_genset_max = (
                params["genset_rated_power"].values[0] * params["genset_pmax"].values[0]
            )
            p_genset_min = (
                params["genset_rated_power"].values[0] * params["genset_pmin"].values[0]
            )
            upper_bound.insert(0, p_genset_max)
            lower_bound.insert(0, p_genset_min)

        return np.array(upper_bound, dtype=np.float64), np.array(lower_bound, dtype=np.float64)

    def get_values(self, *value_names):
        """Unstandardized current action/observation components by name
        (reference lines 237-291)."""
        genset_actions = ["genset", "grid_import", "grid_export", "battery_charge",
                          "battery_discharge", "pv_consummed"]
        no_genset_actions = ["grid_import", "grid_export", "battery_charge",
                             "battery_discharge", "pv_consummed"]
        grid_observations = ["load", "hour", "pv", "battery_soc", "capa_to_charge",
                             "capa_to_discharge", "grid_status", "grid_co2",
                             "grid_price_import", "grid_price_export"]
        no_grid_observations = ["load", "hour", "pv", "battery_soc", "capa_to_charge",
                                "capa_to_discharge"]

        if self.current_action is None:
            print("Warning: current_action is None, should only happen on first iteration")
            n_actions = len(genset_actions) if self.has_genset else len(no_genset_actions)
            self.current_action = np.array([0] * n_actions)
            action = self.current_action
            obs = self.current_obs
        elif self.standardization:
            obs_mean, obs_std, action_mean, action_std = self.standardizations
            action = self.standardize(
                self.current_action, action_mean, action_std, direction="backward"
            )
            obs = self.standardize(self.current_obs, obs_mean, obs_std, direction="backward")
        else:
            action = self.current_action
            obs = self.current_obs

        actions_dict = dict(zip(genset_actions if self.has_genset else no_genset_actions,
                                action))
        obs_dict = dict(zip(grid_observations if self.has_grid else no_grid_observations,
                            obs))

        values = []
        for name in value_names:
            if name in actions_dict:
                values.append(actions_dict[name])
            elif name in obs_dict:
                values.append(obs_dict[name])
            else:
                raise ValueError(
                    f"Value '{name}' not recognized with current architecture"
                )
        return values

    def reset(self):
        observation = super().reset()
        if self.standardization:
            obs_mean, obs_std, _, _ = self.standardizations
            observation = self.standardize(observation, obs_mean, obs_std, direction="forward")
            self.current_obs = observation
        return observation

    def step(self, action, **kwargs):
        assert isinstance(action, np.ndarray)
        unscaled_action = action.copy()

        if self.standardization:
            obs_mean, obs_std, action_mean, action_std = self.standardizations
            action = self.standardize(action, action_mean, action_std, direction="backward")

        observation, reward, done, info = super().step(action)

        if self.standardization:
            observation = self.standardize(observation, obs_mean, obs_std, direction="forward")

        self.current_obs = observation
        self.current_action = unscaled_action
        return observation, reward, done, info

    def standardize(self, data, mean_proxy=None, std_proxy=None, direction="forward",
                    use_proxy=None):
        """Affine (de)standardization with validation (reference lines 354-391)."""
        if (mean_proxy is None and std_proxy is None and use_proxy is None) or (
            mean_proxy is not None and use_proxy is not None
        ):
            raise ValueError(
                "Must pass mean_proxy and std_proxy, or use_proxy must be a str in "
                "('action', 'obs'), but not both"
            )
        if mean_proxy is None and std_proxy is None:
            if use_proxy == "action":
                mean_proxy, std_proxy = self.standardizations[2:]
            elif use_proxy == "obs":
                mean_proxy, std_proxy = self.standardizations[:2]
            else:
                raise NameError(
                    f"Unable to recognize use_proxy {use_proxy}, must be one of "
                    f"'action' or 'obs'"
                )

        names = ("data", "mean_proxy", "std_proxy")
        vals = (data, mean_proxy, std_proxy)
        for name, v in zip(names, vals):
            if not isinstance(v, np.ndarray):
                raise TypeError(f"{name} must be of type numpy.ndarray, is {type(v)}")
        if not (data.shape == mean_proxy.shape == std_proxy.shape):
            raise ValueError(
                "Incompatible shapes of data, mean_proxy, std_proxy. Must be equal, "
                f"are: {dict(zip(names, [v.shape for v in vals]))}"
            )
        if direction not in ("forward", "backward"):
            raise ValueError("direction must be one of ('forward', 'backward')")

        if direction == "forward":
            return (data - mean_proxy) / std_proxy
        return data * std_proxy + mean_proxy

    def pre_compute_standardizations(self, alg_to_use="mpc"):
        """Run MPC to estimate per-component action/obs mean and std
        (reference lines 393-457)."""
        from pymgrid_tpu.algos.mpc import ModelPredictiveControl

        action_mean = [0] * self.action_space.shape[0]
        action_std = [0] * self.action_space.shape[0]
        obs_mean = [0] * self.observation_space.shape[0]
        obs_std = [0] * self.observation_space.shape[0]

        if alg_to_use != "mpc":
            raise RuntimeError(f"algorithm name {alg_to_use} not currently supported")

        old_horizon = self.microgrid.horizon
        self.microgrid.horizon = 24
        mpc = ModelPredictiveControl(self.microgrid)
        mpc_output = mpc.run(max_steps=STANDARDIZATION_MPC_STEPS)
        self.microgrid.horizon = old_horizon

        if self.has_genset:
            action_keys = ("genset", "grid_import", "grid_export", "battery_charge",
                           "battery_discharge", "pv_consummed")
        else:
            action_keys = ("grid_import", "grid_export", "battery_charge",
                           "battery_discharge", "pv_consummed")

        for j, name in enumerate(action_keys):
            action_mean[j] = np.mean(mpc_output["action"][name])
            action_std[j] = np.std(mpc_output["action"][name])

        obs_keys = list(self.microgrid._df_record_state.keys())
        for j, name in enumerate(obs_keys):
            obs_mean[j] = np.mean(mpc_output["status"][name])
            obs_std[j] = np.std(mpc_output["status"][name])

        for j in range(len(obs_std)):
            if obs_std[j] < 1.0:
                obs_std[j] = 1.0
        for j in range(len(action_std)):
            if action_std[j] < 1.0:
                action_std[j] = 1.0

        names = ("obs_mean", "obs_std", "action_mean", "action_std")
        outputs = tuple(
            np.array(output)
            for output in (obs_mean, obs_std, action_mean, action_std)
        )
        for name, output in zip(names, outputs):
            for j, val in enumerate(output):
                if val == 0:
                    print(
                        f"Warning: Zero value in pos {j} in {name}, may not have "
                        f"been filled properly"
                    )
        return outputs

    def get_control_dict(self, action):
        if not isinstance(action, np.ndarray):
            raise TypeError(f"action must be an ndarray, is {type(action)}")

        if self.has_genset:
            return {
                "battery_charge": action[3],
                "battery_discharge": action[4],
                "genset": action[0],
                "grid_import": action[1],
                "grid_export": action[2],
                "pv_consummed": action[5],
            }
        return {
            "battery_charge": action[2],
            "battery_discharge": action[3],
            "grid_import": action[0],
            "grid_export": action[1],
            "pv_consummed": action[4],
        }


class ContinuousMicrogridSampleEnv(ContinuousMicrogridEnv):
    """ContinuousMicrogridEnv with SAA-sampled data on reset
    (reference lines 487-508)."""

    metadata = {"render.modes": ["human"]}

    def __init__(self, microgrid, standardization=True, forecast_args=None,
                 baseline_sampling_args=None, max_episode_len=None):
        super().__init__(
            microgrid, standardization=standardization, max_episode_len=max_episode_len
        )
        self.forecast_args = forecast_args
        self.baseline_sampling_args = baseline_sampling_args
        self.saa = generate_sampler(self.microgrid, forecast_args)

    def reset(self, sampling_args=None):
        sample_reset(self.has_grid, self.saa, self.microgrid, sampling_args=sampling_args)
        return super().reset()


class SafeExpMicrogridEnv(ContinuousMicrogridEnv):
    """ContinuousMicrogridEnv with constraint values for a safety layer
    (reference lines 511-642)."""

    def __init__(self, microgrid, standardization=True, balance_tolerance=1.0,
                 scale_constraints=True, only_inequality_constr=True,
                 trajectory_len=None, max_episode_len=None):
        super().__init__(
            microgrid,
            standardization=standardization,
            trajectory_len=trajectory_len,
            max_episode_len=max_episode_len,
        )
        self.balance_tolerance = balance_tolerance
        self.scale_constraints = scale_constraints
        self.only_inequality_constr = only_inequality_constr

        self.n_constraints = 9 if self.has_genset else 7
        if only_inequality_constr:
            self.n_constraints -= 1

    def get_num_constraints(self):
        return self.n_constraints

    def get_constraint_values(self):
        """Constraint values in ``c_i < 0`` form."""
        inequality_constraints = self._get_inequality_constraints()
        if self.only_inequality_constr:
            return inequality_constraints
        return np.append(inequality_constraints, self._get_energy_balance())

    def _get_energy_balance(self):
        if self.has_genset:
            (p_import, p_export, p_charge, p_discharge, p_genset, load, pv,
             pv_consumed) = self.get_values(
                "grid_import", "grid_export", "battery_charge", "battery_discharge",
                "genset", "load", "pv", "pv_consummed")
        else:
            (p_import, p_export, p_charge, p_discharge, load, pv,
             pv_consumed) = self.get_values(
                "grid_import", "grid_export", "battery_charge", "battery_discharge",
                "load", "pv", "pv_consummed")
            p_genset = 0

        pv_curtailed = pv - pv_consumed
        energy_balance = np.array(
            p_import - p_export - p_charge + p_discharge + p_genset
            - pv_curtailed - load + pv
        )
        if self.scale_constraints:
            energy_balance /= float(self.microgrid.parameters.battery_capacity.squeeze())
        return energy_balance

    def _get_inequality_constraints(self):
        constraints = []

        p_charge, p_discharge, p_max_charge, p_max_discharge = self.get_values(
            "battery_charge", "battery_discharge", "capa_to_charge", "capa_to_discharge"
        )
        if self.scale_constraints:
            charge_scale = float(self.microgrid.parameters.battery_capacity.squeeze())
            constraints.append((p_charge - p_max_charge) / charge_scale)
            constraints.append((p_discharge - p_max_discharge) / charge_scale)
        else:
            constraints.append(p_charge - p_max_charge)
            constraints.append(p_discharge - p_max_discharge)

        p_max_import = self.microgrid.parameters["grid_power_import"].values[0]
        p_max_export = self.microgrid.parameters["grid_power_export"].values[0]
        p_import, p_export, grid_status = self.get_values(
            "grid_import", "grid_export", "grid_status"
        )
        if self.scale_constraints:
            constraints.append((p_import - p_max_import * grid_status) / p_max_import)
            constraints.append((p_export - p_max_export * grid_status) / p_max_export)
        else:
            constraints.append(p_import - p_max_import * grid_status)
            constraints.append(p_export - p_max_export * grid_status)

        battery_max = self.microgrid.parameters["battery_soc_max"].values[0]
        battery_min = self.microgrid.parameters["battery_soc_min"].values[0]
        (battery_soc,) = self.get_values("battery_soc")
        if self.scale_constraints:
            constraints.append((battery_soc - battery_max) / battery_max)
            constraints.append((battery_min - battery_soc) / battery_min)
        else:
            constraints.append(battery_soc - battery_max)
            constraints.append(battery_min - battery_soc)

        if self.has_genset:
            p_genset_max = (
                self.microgrid.parameters["genset_rated_power"].values[0]
                * self.microgrid.parameters["genset_pmax"].values[0]
            )
            p_genset_min = (
                self.microgrid.parameters["genset_rated_power"].values[0]
                * self.microgrid.parameters["genset_pmin"].values[0]
            )
            (p_genset,) = self.get_values("genset")

            if p_genset < 1:
                if self.scale_constraints:
                    constraints.append((p_genset - 1) / p_genset_max)
                    constraints.append((-p_genset - self.balance_tolerance) / p_genset_max)
                else:
                    constraints.append(p_genset - 1)
                    constraints.append(-p_genset - self.balance_tolerance)
            else:
                if self.scale_constraints:
                    constraints.append((p_genset - p_genset_max) / p_genset_max)
                    constraints.append((p_genset_min - p_genset) / p_genset_min)
                else:
                    constraints.append(p_genset - p_genset_max)
                    constraints.append(p_genset_min - p_genset)

        return np.array(constraints)


class SafeExpMicrogridSampleEnv(SafeExpMicrogridEnv):
    """SafeExpMicrogridEnv with SAA-sampled data on reset
    (reference lines 645-672)."""

    def __init__(self, microgrid, standardization=True, balance_tolerance=1.0,
                 scale_constraints=True, only_inequality_constr=True,
                 forecast_args=None, baseline_sampling_args=None,
                 trajectory_len=None, max_episode_len=None):
        super().__init__(
            microgrid,
            standardization=standardization,
            balance_tolerance=balance_tolerance,
            scale_constraints=scale_constraints,
            only_inequality_constr=only_inequality_constr,
            trajectory_len=trajectory_len,
            max_episode_len=max_episode_len,
        )
        self.forecast_args = forecast_args
        self.baseline_sampling_args = baseline_sampling_args
        self.saa = generate_sampler(self.microgrid, forecast_args)

    def reset(self, sampling_args=None):
        sample_reset(self.has_grid, self.saa, self.microgrid, sampling_args=sampling_args)
        return super().reset()
