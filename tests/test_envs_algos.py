"""Env and RBC parity with the reference, and compiled-RBC equivalence."""
import numpy as np
import pandas as pd
import pytest

from helpers.reference import reference_available, import_reference
from helpers.factories import module_params, build_microgrid

import pymgrid_tpu
import pymgrid_tpu.modules as M
from pymgrid_tpu.envs import DiscreteMicrogridEnv, ContinuousMicrogridEnv
from pymgrid_tpu.algos import RuleBasedControl

needs_ref = pytest.mark.skipif(
    not reference_available(), reason="reference not available"
)


def _pairs(seed=0, **kwargs):
    pymgrid = import_reference()
    import pymgrid.modules as ref_modules

    params = module_params(seed=seed, **kwargs)
    ref_mods, _ = build_microgrid(ref_modules, params)
    our_mods, _ = build_microgrid(M, params)
    return ref_mods, our_mods


@needs_ref
def test_priority_list_enumeration_parity():
    pymgrid = import_reference()
    from pymgrid.envs import DiscreteMicrogridEnv as RefDiscrete

    ref_mods, our_mods = _pairs(seed=3)
    ref_env = RefDiscrete(ref_mods)
    our_env = DiscreteMicrogridEnv(our_mods)

    assert ref_env.action_space.n == our_env.action_space.n
    for ref_pl, our_pl in zip(ref_env.actions_list, our_env.actions_list):
        assert len(ref_pl) == len(our_pl)
        for re_el, our_el in zip(ref_pl, our_pl):
            assert re_el.module == our_el.module
            assert re_el.module_actions == our_el.module_actions
            assert re_el.action == our_el.action
            assert re_el.marginal_cost == our_el.marginal_cost


@needs_ref
def test_discrete_env_trajectory_parity():
    import_reference()
    from pymgrid.envs import DiscreteMicrogridEnv as RefDiscrete

    ref_mods, our_mods = _pairs(seed=11)
    ref_env = RefDiscrete(ref_mods)
    our_env = DiscreteMicrogridEnv(our_mods)

    assert ref_env.observation_space.shape == our_env.observation_space.shape

    rng = np.random.RandomState(5)
    for step in range(50):
        a = int(rng.randint(ref_env.action_space.n))
        ref_obs, ref_r, ref_d, _ = ref_env.step(a)
        our_obs, our_r, our_d, _ = our_env.step(a)
        np.testing.assert_array_equal(
            np.asarray(ref_obs, dtype=float), np.asarray(our_obs, dtype=float),
            err_msg=f"step {step}",
        )
        assert ref_r == our_r, f"step {step}: {ref_r} != {our_r}"
        assert ref_d == our_d

    pd.testing.assert_frame_equal(
        ref_env.get_log(), our_env.get_log(), check_exact=True
    )


@needs_ref
def test_discrete_env_reset_and_obs_keys():
    import_reference()
    from pymgrid.envs import DiscreteMicrogridEnv as RefDiscrete

    ref_mods, our_mods = _pairs(seed=13, forecaster="oracle", forecast_horizon=3)
    keys = ["load_current", "soc"]
    ref_env = RefDiscrete(ref_mods, observation_keys=keys)
    our_env = DiscreteMicrogridEnv(our_mods, observation_keys=keys)
    assert ref_env.observation_space.shape == our_env.observation_space.shape

    ref_obs = ref_env.reset()
    our_obs = our_env.reset()
    np.testing.assert_array_equal(np.asarray(ref_obs, float), np.asarray(our_obs, float))

    for step in range(10):
        ref_out = ref_env.step(step % ref_env.action_space.n)
        our_out = our_env.step(step % our_env.action_space.n)
        np.testing.assert_array_equal(
            np.asarray(ref_out[0], float), np.asarray(our_out[0], float)
        )
        assert ref_out[1] == our_out[1]


@needs_ref
def test_discrete_env_from_scenario():
    import_reference()
    from pymgrid.envs import DiscreteMicrogridEnv as RefDiscrete

    ref_env = RefDiscrete.from_scenario(1)
    our_env = DiscreteMicrogridEnv.from_scenario(1)
    assert ref_env.action_space.n == our_env.action_space.n
    assert ref_env.observation_space.shape == our_env.observation_space.shape
    for step in range(10):
        a = step % our_env.action_space.n
        ref_out = ref_env.step(a)
        our_out = our_env.step(a)
        np.testing.assert_array_equal(
            np.asarray(ref_out[0], float), np.asarray(our_out[0], float)
        )
        assert ref_out[1] == our_out[1]


def test_continuous_env_runs():
    """The reference continuous env cannot step with v1.2.2 module types (its
    action space is over fixed sources and its step crashes upstream); ours
    exposes the controllable modules' normalized boxes — compare against the
    host Microgrid driven directly with the same normalized actions."""
    params = module_params(seed=17)
    mods, _ = build_microgrid(M, params)
    env = ContinuousMicrogridEnv(mods)
    mg = pymgrid_tpu.Microgrid(build_microgrid(M, params)[0])

    # flat layout follows sorted Dict keys: battery (1) + genset (2) + grid (1)
    assert env.action_space.shape == (4,)

    rng = np.random.RandomState(3)
    for step in range(20):
        flat = rng.rand(4)
        obs, reward, done, info = env.step(flat)
        action = {"battery": [flat[0]], "genset": [flat[1:3]], "grid": [flat[3]]}
        _, mg_reward, mg_done, _ = mg.run(action, normalized=True)
        assert reward == mg_reward, f"step {step}"
        assert done == mg_done
    assert obs.shape == env.observation_space.shape


@needs_ref
def test_rbc_parity():
    import_reference()
    from pymgrid.algos import RuleBasedControl as RefRBC

    ref_mods, our_mods = _pairs(seed=23)
    ref_rbc = RefRBC(import_reference().Microgrid(ref_mods))
    our_rbc = RuleBasedControl(pymgrid_tpu.Microgrid(our_mods))

    assert [e.module for e in ref_rbc.priority_list] == [
        e.module for e in our_rbc.priority_list
    ]

    ref_log = ref_rbc.run(max_steps=80)
    our_log = our_rbc.run(max_steps=80)
    pd.testing.assert_frame_equal(ref_log, our_log, check_exact=True)


def test_rbc_compiled_matches_host():
    params = module_params(seed=29)
    mods, _ = build_microgrid(M, params)
    mg = pymgrid_tpu.Microgrid(mods)

    host_log = RuleBasedControl(mg).run(max_steps=100)
    eng_log = RuleBasedControl(mg).run_compiled(max_steps=100)

    assert list(host_log.columns) == list(eng_log.columns)
    np.testing.assert_array_equal(
        host_log.values.astype(float), eng_log.values.astype(float)
    )


def test_rbc_compiled_scenario():
    mg = pymgrid_tpu.Microgrid.from_scenario(0)
    host_log = RuleBasedControl(mg).run(max_steps=60)
    eng_log = RuleBasedControl(mg).run_compiled(max_steps=60)
    np.testing.assert_array_equal(
        host_log.values.astype(float), eng_log.values.astype(float)
    )
