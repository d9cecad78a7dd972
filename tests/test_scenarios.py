"""pymgrid25 scenario loading and behavioral parity with the reference."""
import numpy as np
import pandas as pd
import pytest

from helpers.reference import reference_available, import_reference

import pymgrid_tpu


@pytest.mark.parametrize("n", [0, 1, 4, 13, 24])
def test_scenario_loads_and_runs(n):
    mg = pymgrid_tpu.Microgrid.from_scenario(n)
    assert mg.final_step == 8759
    assert mg.get_forecast_horizon() == 23
    np.random.seed(0)
    for _ in range(5):
        obs, reward, done, info = mg.run(mg.sample_action())
    assert not done


def test_scenario_round_trip():
    mg = pymgrid_tpu.Microgrid.from_scenario(2)
    assert pymgrid_tpu.Microgrid.load(mg.dump()) == mg


@pytest.mark.skipif(not reference_available(), reason="reference not available")
@pytest.mark.parametrize("n", [0, 1, 24])
def test_scenario_reference_parity(n):
    pymgrid = import_reference()

    ref_mg = pymgrid.Microgrid.from_scenario(n)
    our_mg = pymgrid_tpu.Microgrid.from_scenario(n)

    # identical module structure
    assert list(dict(ref_mg.modules.iterdict())) == list(dict(our_mg.modules.iterdict()))
    for (name, ref_mods), (_, our_mods) in zip(
        ref_mg.modules.iterdict(), our_mg.modules.iterdict()
    ):
        for rm, om in zip(ref_mods, our_mods):
            if hasattr(rm, "time_series"):
                np.testing.assert_array_equal(rm.time_series, om.time_series)

    # lockstep trajectories (oracle forecasters -> deterministic)
    np.random.seed(42)
    ref_actions = [ref_mg.sample_action() for _ in range(40)]
    np.random.seed(42)
    our_actions = [our_mg.sample_action() for _ in range(40)]
    for step, (ra, oa) in enumerate(zip(ref_actions, our_actions)):
        for k in ra:
            np.testing.assert_array_equal(
                np.asarray(ra[k], dtype=object).tolist(),
                np.asarray(oa[k], dtype=object).tolist(),
                err_msg=f"step {step} action {k}",
            )
        ref_out = ref_mg.run(ra, normalized=False)
        our_out = our_mg.run(oa, normalized=False)
        assert ref_out[1] == our_out[1], f"step {step} reward"
        assert ref_out[2] == our_out[2]

    pd.testing.assert_frame_equal(ref_mg.get_log(), our_mg.get_log(), check_exact=True)


@pytest.mark.skipif(not reference_available(), reason="reference not available")
@pytest.mark.parametrize("n", [0, 24])
def test_scenario_engine_parity(n):
    """The compiled engine reproduces pymgrid25 host trajectories bitwise."""
    from pymgrid_tpu.core.compiled import CompiledMicrogrid

    mg = pymgrid_tpu.Microgrid.from_scenario(n)
    compiled = CompiledMicrogrid(mg, dtype=np.float64)
    state = compiled.initial_state(seed=0)

    np.random.seed(7)
    rows = []
    for step in range(30):
        action = mg.sample_action()
        _, host_reward, _, _ = mg.run(action, normalized=False)
        state, out = compiled.step(
            state, compiled.action_to_arrays(action), normalized=False
        )
        rows.append(np.asarray(out.log_row))
        assert float(out.reward) == host_reward, f"step {step}"

    host_log = mg.get_log()
    eng_log = compiled.log_frame(np.stack(rows))
    assert list(host_log.columns) == list(eng_log.columns)
    np.testing.assert_array_equal(
        host_log.values.astype(np.float64), eng_log.values.astype(np.float64)
    )
