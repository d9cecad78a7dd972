"""Full-year golden parity: all 25 scenarios vs recorded reference streams.

``tools/record_reference_golden.py`` ran the REFERENCE RuleBasedControl over
the full year of every pymgrid25 scenario once and froze the per-step balance
reward streams (float64, exact bits) into ``tests/fixtures/golden_rbc.npz``.
The compiled engine must reproduce every stream bitwise — the strongest
end-to-end statement the framework makes: one jitted scan over 8759 steps
equals the reference's Python loop to the last ulp, for every benchmark
config.
"""
from pathlib import Path

import numpy as np
import pytest

import pymgrid_tpu
from pymgrid_tpu.algos import RuleBasedControl

FIXTURE = Path(__file__).parent / "fixtures" / "golden_rbc.npz"

pytestmark = pytest.mark.skipif(
    not FIXTURE.exists(), reason="golden fixture not recorded"
)


def _fixture_scenarios():
    if not FIXTURE.exists():
        return []
    with np.load(FIXTURE) as f:
        return sorted(
            int(k.split("_")[1]) for k in f.files if k.endswith("_reward")
        )


@pytest.mark.parametrize("scenario", _fixture_scenarios())
def test_engine_full_year_rbc_bitwise(scenario):
    with np.load(FIXTURE) as f:
        golden = f[f"scenario_{scenario}_reward"]

    mg = pymgrid_tpu.Microgrid.from_scenario(scenario)
    log = RuleBasedControl(mg).run_compiled()
    ours = log[("balance", 0, "reward")].values.astype(np.float64)

    assert ours.shape == golden.shape
    np.testing.assert_array_equal(ours, golden)
