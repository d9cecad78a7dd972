

def test_fused_rollout_shared_step_bitwise():
    """shared_step=True (one simulated time riding the scan carry — valid
    for reset() states since auto-resets fire simultaneously) is bitwise-
    equal to the per-replica-step rollout, incl. logs and observations."""
    import numpy as np

    from pymgrid_tpu.envs import DiscreteMicrogridEnv
    from pymgrid_tpu.parallel.batched_env import BatchedDiscreteEnv

    for scen in (0, 1):
        env = DiscreteMicrogridEnv.from_scenario(scen)
        b = BatchedDiscreteEnv(env, batch_size=6, dtype=np.float64)
        rng = np.random.RandomState(0)
        seq = rng.randint(b.n_actions, size=(30, 6))
        _, o1 = b.rollout(b.reset(seed=0), seq, keep_logs=True)
        _, o2 = b.rollout(b.reset(seed=0), seq, keep_logs=True,
                          shared_step=True)
        np.testing.assert_array_equal(np.asarray(o1.reward),
                                      np.asarray(o2.reward))
        np.testing.assert_array_equal(np.asarray(o1.obs), np.asarray(o2.obs))
        np.testing.assert_array_equal(np.asarray(o1.log_row),
                                      np.asarray(o2.log_row))


def test_continuous_fused_rollout_shared_step_bitwise():
    import numpy as np

    from pymgrid_tpu.envs import ContinuousMicrogridEnv
    from pymgrid_tpu.parallel.batched_env import BatchedContinuousEnv

    env = ContinuousMicrogridEnv.from_scenario(1)
    b = BatchedContinuousEnv(env, batch_size=5, dtype=np.float64)
    rng = np.random.RandomState(1)
    seq = rng.rand(25, 5, b.action_dim)
    _, o1 = b.rollout(b.reset(seed=0), seq, keep_logs=True)
    _, o2 = b.rollout(b.reset(seed=0), seq, keep_logs=True, shared_step=True)
    np.testing.assert_array_equal(np.asarray(o1.reward), np.asarray(o2.reward))
    np.testing.assert_array_equal(np.asarray(o1.obs), np.asarray(o2.obs))
    np.testing.assert_array_equal(np.asarray(o1.log_row),
                                  np.asarray(o2.log_row))
