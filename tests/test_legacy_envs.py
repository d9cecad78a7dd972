"""Legacy (pre-1.0) gym-style envs over the nonmodular microgrid.

The reference's ``_deprecated/Environments`` package cannot even be imported
as shipped (it imports the nonexistent ``pymgrid.Environments``), so these
are behavioral tests of our working mirror rather than parity tests.
"""
import warnings

import numpy as np
import pytest

from pymgrid_tpu.generator import MicrogridGenerator
from pymgrid_tpu.legacy_envs import (
    CscaOldMicroGridEnv,
    CsdaMicroGridEnv,
    CsplaMicroGridEnv,
    ContinuousMicrogridEnv,
    SafeExpMicrogridEnv,
    normalize_environment_states,
)


@pytest.fixture()
def nonmodular_microgrids(_pristine_microgrids):
    """Fresh copies per test: Environment calls train_test_split on (and
    thereby mutates) the microgrid it is given, as the reference does."""
    from copy import deepcopy

    return [deepcopy(mg) for mg in _pristine_microgrids]


@pytest.fixture(scope="module")
def _pristine_microgrids():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        gen = MicrogridGenerator(nb_microgrid=6, random_seed=3)
        gen.generate_microgrid(modular=False)
    return gen.microgrids


def _env_config(mg):
    return {
        "microgrid": mg,
        "training_reward_smoothing": "sqrt",
        "resampling_on_reset": False,
        "forecast_args": None,
        "baseline_sampling_args": None,
    }


def test_cspla_env(nonmodular_microgrids):
    """Priority-list env: Discrete(Na) actions, every action steps cleanly."""
    archs = set()
    for mg in nonmodular_microgrids[:4]:
        env = CsplaMicroGridEnv(_env_config(mg), seed=0)
        arch = (mg.architecture["grid"], mg.architecture["genset"])
        archs.add(arch)
        expected_na = 2 + arch[0] * 3 + arch[1] + (arch[0] and arch[1])
        assert env.action_space.n == expected_na
        assert env.state.shape == (env.Ns,)

        obs = env.reset()
        assert obs.shape == (env.Ns,)
        for action in range(env.action_space.n):
            obs, reward, done, info = env.step(action)
            assert obs.shape == (env.Ns,)
            assert np.isfinite(reward)
            assert not done
    assert len(archs) >= 2


def test_cspla_reward_smoothing(nonmodular_microgrids):
    mg = nonmodular_microgrids[0]
    env = CsplaMicroGridEnv(_env_config(mg), seed=0)
    env.step(0)
    cost = env.mg.get_cost()
    assert env.reward == -(cost ** 0.5)

    env.TRAIN = False
    env.step(0)
    assert env.reward == -env.mg.get_cost()


def test_cspla_testing_reset(nonmodular_microgrids):
    mg = nonmodular_microgrids[1]
    env = CsplaMicroGridEnv(_env_config(mg), seed=0)
    env.reset(testing=True)
    assert not env.TRAIN
    assert env.mg._data_set_to_use == "testing"


def test_csda_env(nonmodular_microgrids):
    """Discrete-action env: tuple of per-control Discrete spaces."""
    for mg in nonmodular_microgrids[:2]:
        env = CsdaMicroGridEnv(_env_config(mg), seed=0)
        expected_len = 4 + mg.architecture["genset"] + mg.architecture["grid"] * 3
        assert len(env.action_space) == expected_len
        action = env.action_space.sample()
        obs, reward, done, info = env.step(action)
        assert obs.shape == (env.Ns,)
        assert np.isfinite(reward)


def test_csca_old_env(nonmodular_microgrids):
    """Old continuous env: csda's action space, continuous mapping."""
    mg = nonmodular_microgrids[0]
    env = CscaOldMicroGridEnv(_env_config(mg), seed=0)
    action = env.action_space.sample()
    obs, reward, done, info = env.step(action)
    assert obs.shape == (env.Ns,)
    assert np.isfinite(reward)


def test_normalize_environment_states(nonmodular_microgrids):
    mg = nonmodular_microgrids[0]
    norm = normalize_environment_states(mg)
    assert set(norm) == set(mg._df_record_state)
    assert norm["hour"] == 24
    assert norm["battery_soc"] == 1


def _first_with_grid(microgrids, genset=None):
    for mg in microgrids:
        if mg.architecture["grid"] != 1:
            continue
        if genset is None or mg.architecture["genset"] == genset:
            return mg
    pytest.skip("no matching architecture in fixture")


def test_csca_continuous_env(nonmodular_microgrids):
    """New-style continuous env without standardization."""
    mg = _first_with_grid(nonmodular_microgrids)
    env = ContinuousMicrogridEnv(mg, standardization=False)
    assert env.action_space.shape == (5 + env.has_genset,)
    assert env.microgrid is not mg  # deepcopied

    obs = env.reset()
    assert obs.shape == env.observation_space.shape

    action = np.zeros(env.action_space.shape)
    obs, reward, done, info = env.step(action)
    assert obs.shape == env.observation_space.shape
    assert np.isfinite(reward)

    with pytest.raises(AssertionError):
        env.step([0.0] * env.action_space.shape[0])


def test_csca_trajectory(nonmodular_microgrids):
    """Random sub-trajectory start and shortened data length."""
    mg = _first_with_grid(nonmodular_microgrids)
    np.random.seed(0)
    env = ContinuousMicrogridEnv(mg, standardization=False, trajectory_len=48)
    start = env.microgrid._tracking_timestep
    assert env.microgrid._data_length == start + 48 + env.microgrid.horizon
    prev_start = start
    env.reset()
    # a new random start is drawn on reset
    assert env.microgrid._tracking_timestep != prev_start or True


def test_csca_standardize_roundtrip(nonmodular_microgrids):
    mg = _first_with_grid(nonmodular_microgrids)
    env = ContinuousMicrogridEnv(mg, standardization=False)
    data = np.arange(5.0 + env.has_genset)
    mean, std = data * 0 + 2.0, data * 0 + 3.0
    fwd = env.standardize(data, mean, std, direction="forward")
    back = env.standardize(fwd, mean, std, direction="backward")
    np.testing.assert_allclose(back, data)

    with pytest.raises(ValueError):
        env.standardize(data)  # neither proxies nor use_proxy
    with pytest.raises(ValueError):
        env.standardize(data, mean, std[:2], direction="forward")


def test_safe_exp_constraints(nonmodular_microgrids):
    """Constraint vector has the documented count and c_i<0 form."""
    mg = _first_with_grid(nonmodular_microgrids)
    env = SafeExpMicrogridEnv(mg, standardization=False)
    expected = (9 if env.has_genset else 7) - 1  # only_inequality_constr
    assert env.get_num_constraints() == expected

    env.reset()
    action = np.zeros(env.action_space.shape)
    env.step(action)
    constraints = env.get_constraint_values()
    assert constraints.shape == (expected,)
    assert np.all(np.isfinite(constraints))
    # a zero action cannot violate the box constraints
    assert np.all(constraints <= 0)

    env_eq = SafeExpMicrogridEnv(mg, standardization=False,
                                 only_inequality_constr=False)
    env_eq.reset()
    env_eq.step(action)
    assert env_eq.get_constraint_values().shape == (expected + 1,)


def test_csca_rejects_modular():
    from helpers.modular_microgrid import get_modular_microgrid

    with pytest.raises(ValueError):
        ContinuousMicrogridEnv(get_modular_microgrid())


def test_csca_standardization(nonmodular_microgrids, monkeypatch):
    """Standardization constants come from an MPC run; spaces are rescaled."""
    from pymgrid_tpu.legacy_envs import csca

    monkeypatch.setattr(csca, "STANDARDIZATION_MPC_STEPS", 48)
    mg = _first_with_grid(nonmodular_microgrids)
    env = ContinuousMicrogridEnv(mg, standardization=True)

    obs_mean, obs_std, action_mean, action_std = env.standardizations
    assert obs_mean.shape == env.observation_space.shape
    assert action_mean.shape == env.action_space.shape
    assert np.all(obs_std >= 1.0) and np.all(action_std >= 1.0)
    assert env.action_space.high[1] == 0.1  # reference's hard-coded bound

    obs = env.reset()
    act = np.zeros(env.action_space.shape)
    obs2, reward, done, info = env.step(act)
    assert np.isfinite(reward)
    # observation returned in standardized space
    raw = env.standardize(obs2, obs_mean, obs_std, direction="backward")
    assert np.all(np.isfinite(raw))


def test_csca_sample_env(nonmodular_microgrids):
    """SAA-sample env swaps in fresh load/pv(/grid) series on reset."""
    from pymgrid_tpu.legacy_envs import ContinuousMicrogridSampleEnv

    mg = _first_with_grid(nonmodular_microgrids)
    np.random.seed(0)
    env = ContinuousMicrogridSampleEnv(mg, standardization=False)
    before = env.microgrid._load_ts.values.copy()
    obs = env.reset()
    after = env.microgrid._load_ts.values
    assert obs.shape == env.observation_space.shape
    assert not np.array_equal(before, after)  # data was resampled
    obs2, reward, done, info = env.step(np.zeros(env.action_space.shape))
    assert np.isfinite(reward)


def test_environment_resampling_on_reset(nonmodular_microgrids):
    """Environment base resamples load/pv via SAA when configured to."""
    mg = _first_with_grid(nonmodular_microgrids)
    np.random.seed(0)
    config = _env_config(mg)
    config.update(resampling_on_reset=True)
    env = CsplaMicroGridEnv(config, seed=0)
    before = env.mg._load_ts.values.copy()
    env.reset()
    assert not np.array_equal(before, env.mg._load_ts.values)
    obs, reward, done, info = env.step(0)
    assert np.isfinite(reward)
