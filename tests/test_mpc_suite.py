"""SuiteMPC: all scenarios' receding-horizon MPC as one batched program.

Validates the heterogeneous batched-IPM path (stacked per-scenario
constraint matrices, VERDICT r3 item 2) against the per-scenario
:class:`BatchedMPC` controller it replaces for table generation.
"""
import warnings

import numpy as np
import pytest

import pymgrid_tpu


@pytest.fixture(scope="module")
def suite_and_batched():
    import jax  # noqa: F401  (conftest pins CPU x64)

    from pymgrid_tpu.algos.mpc_jax import BatchedMPC
    from pymgrid_tpu.algos.mpc_suite import SuiteMPC

    warnings.filterwarnings("ignore")
    scenarios = [0, 4, 1]  # grid-only, genset-only, genset+weak-grid
    mgs = [pymgrid_tpu.Microgrid.from_scenario(n) for n in scenarios]
    T = 20
    suite = SuiteMPC(mgs, dtype=np.float64, enum_bits=2, enum_chunk=4)
    rew_suite, _ = suite.run_scanned(T, chunk=T)

    rew_batched = []
    for mg in mgs:
        bm = BatchedMPC(mg, batch_size=1, dtype=np.float64,
                        host_fallback=False, enum_bits=2, enum_chunk=4)
        r, _ = bm.run_scanned(T, chunk=T)
        rew_batched.append(r[:, 0])
    return scenarios, rew_suite, np.stack(rew_batched, axis=1)


def test_suite_mpc_matches_batched_mpc(suite_and_batched):
    """Each scenario's realized rewards from the one-program SuiteMPC match
    its solo BatchedMPC run (same formulation; solver batching may shift
    the IPM trajectory by float noise)."""
    scenarios, rew_suite, rew_batched = suite_and_batched
    assert rew_suite.shape == rew_batched.shape
    for i, n in enumerate(scenarios):
        scale = max(1.0, np.abs(rew_batched[:, i]).max())
        np.testing.assert_allclose(
            rew_suite[:, i] / scale, rew_batched[:, i] / scale,
            atol=5e-4, err_msg=f"scenario {n}",
        )


def test_suite_mpc_costs_close_to_batched(suite_and_batched):
    scenarios, rew_suite, rew_batched = suite_and_batched
    cost_s = -rew_suite.sum(axis=0)
    cost_b = -rew_batched.sum(axis=0)
    np.testing.assert_allclose(cost_s, cost_b, rtol=1e-4)


def test_suite_mpc_rejects_mismatched_lengths():
    from pymgrid_tpu.algos.mpc_suite import SuiteMPC

    warnings.filterwarnings("ignore")
    a = pymgrid_tpu.Microgrid.from_scenario(0)
    b = pymgrid_tpu.Microgrid.from_scenario(4)
    b.final_step = int(b.final_step) - 7
    with pytest.raises(ValueError, match="disagree"):
        SuiteMPC([a, b], dtype=np.float64, enum_bits=0)
