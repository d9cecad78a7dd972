"""Aux subsystems: profiling helpers, checked steps, gymnasium adapter."""
import numpy as np
import pytest

from helpers.modular_microgrid import get_modular_microgrid


def test_throughput_meter():
    from pymgrid_tpu.utils.profiling import Throughput

    with Throughput(10, 100) as t:
        pass
    assert t.steps_per_sec > 0


def test_check_balance_on_rollout():
    from pymgrid_tpu.algos import RuleBasedControl
    from pymgrid_tpu.core.compiled import CompiledMicrogrid
    from pymgrid_tpu.core.rollout import make_priority_policy, rollout_policy
    from pymgrid_tpu.utils.profiling import check_balance

    mg = get_modular_microgrid()
    rbc = RuleBasedControl(mg)
    compiled = CompiledMicrogrid(rbc.microgrid, dtype=np.float64)
    policy = make_priority_policy(compiled.spec, rbc.priority_list)
    _, outputs = rollout_policy(
        compiled.spec, compiled.params, compiled.reset(), policy, 50
    )
    assert check_balance(outputs)


def test_checked_step_passes_and_catches():
    import jax

    from pymgrid_tpu.core.compiled import CompiledMicrogrid
    from pymgrid_tpu.utils.profiling import checked_step

    mg = get_modular_microgrid()
    compiled = CompiledMicrogrid(mg, dtype=np.float64)
    fn = jax.jit(checked_step(compiled.spec, normalized=False))
    state = compiled.reset()
    err, (state, out) = fn(compiled.params, state, compiled.zero_action())
    err.throw()  # no error on a valid step


def test_gymnasium_adapter():
    gymnasium = pytest.importorskip("gymnasium")
    from pymgrid_tpu.envs import DiscreteMicrogridEnv
    from pymgrid_tpu.envs.gym_adapter import GymnasiumWrapper

    env = GymnasiumWrapper(DiscreteMicrogridEnv(get_modular_microgrid(modules_only=True)))
    assert isinstance(env.action_space, gymnasium.spaces.Discrete)
    assert isinstance(env.observation_space, gymnasium.spaces.Box)

    obs, info = env.reset(seed=0)
    assert env.observation_space.contains(obs)
    for _ in range(3):
        obs, reward, terminated, truncated, info = env.step(env.action_space.sample())
        assert env.observation_space.contains(obs)
        assert not truncated


def test_profiler_trace(tmp_path):
    import jax
    import jax.numpy as jnp

    from pymgrid_tpu.utils.profiling import trace

    with trace(str(tmp_path / "trace")):
        jnp.arange(16.0).sum().block_until_ready()
