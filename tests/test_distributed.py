"""Multi-host helpers, exercised single-process over the virtual mesh.

Real multi-process runs need multiple hosts; here the single-process
degenerate paths and the global-mesh sharding are validated (the semantics
that differ multi-process are jax's own make_array_from_process_local_data /
process_allgather, exercised by jax upstream).
"""
import numpy as np
import pytest

import jax

from pymgrid_tpu.parallel import distributed as dist


def test_initialize_noop_single_process():
    assert dist.initialize() is False
    assert dist.process_count() == 1


def test_local_batch_size():
    assert dist.local_batch_size(64) == 64
    with pytest.raises(ValueError):
        # single process: any batch divides; force the error via a fake count
        n = dist.process_count()
        if 63 % n == 0:
            raise ValueError("forced")
        dist.local_batch_size(63)


def test_global_mesh_and_feed_roundtrip():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = dist.global_batch_mesh()
    assert mesh.devices.size == len(jax.devices())

    local = {"a": np.arange(16.0).reshape(16, 1), "b": np.ones((16, 3))}
    placed = dist.from_process_local(mesh, local)
    # sharded over the batch axis of the mesh
    assert placed["a"].sharding.spec == jax.sharding.PartitionSpec("batch")
    fetched = dist.fetch(placed)
    np.testing.assert_array_equal(fetched["a"], local["a"])
    np.testing.assert_array_equal(fetched["b"], local["b"])


def test_global_mesh_rollout():
    """BatchedMicrogrid on the global mesh with per-host feeding."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from helpers.factories import module_params, build_microgrid
    import pymgrid_tpu.modules as M
    from pymgrid_tpu import Microgrid
    from pymgrid_tpu.parallel import BatchedMicrogrid
    from pymgrid_tpu.core.rollout import make_marginal_cost_policy

    params = module_params(seed=0)
    mods, _ = build_microgrid(M, params, ("battery", "pv", "load", "grid"))
    mg = Microgrid(mods)

    mesh = dist.global_batch_mesh()
    batched = BatchedMicrogrid(mg, batch_size=16, dtype=np.float64, mesh=mesh)
    policy = make_marginal_cost_policy(batched.spec)
    final_state, (rewards, dones) = batched.rollout(policy, n_steps=20, collect=False)
    rewards = dist.fetch(rewards)
    assert rewards.shape == (16, 20) and np.isfinite(rewards).all()
