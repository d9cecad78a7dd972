#!/usr/bin/env python
"""Record golden full-year reference trajectories for the pymgrid25 suite.

Runs the REFERENCE implementation's RuleBasedControl over the full year of
every scenario and saves the per-step balance reward stream (float64, exact
bits) to ``tests/fixtures/golden_rbc.npz``.  The parity gate
``tests/test_golden_year.py`` then asserts our compiled engine reproduces
every stream bitwise — without needing the reference at test time.

Usage: python tools/record_reference_golden.py [--scenarios 0,1,2]
(~1-2 min per scenario; run once, commit the fixture.)
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

FIXTURE = REPO / "tests" / "fixtures" / "golden_rbc.npz"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--scenarios", default=None)
    args = parser.parse_args()

    from helpers.reference import import_reference

    pymgrid = import_reference()
    from pymgrid.algos import RuleBasedControl as RefRBC

    scenarios = (
        [int(s) for s in args.scenarios.split(",")]
        if args.scenarios
        else list(range(25))
    )

    existing = {}
    if FIXTURE.exists():
        with np.load(FIXTURE) as f:
            existing = {k: f[k] for k in f.files}

    for n in scenarios:
        t0 = time.time()
        mg = pymgrid.Microgrid.load(
            open(f"/root/reference/src/pymgrid/data/scenario/pymgrid25/"
                 f"microgrid_{n}/microgrid_{n}.yaml")
        )
        log = RefRBC(mg).run()
        rewards = log[("balance", 0, "reward")].values.astype(np.float64)
        existing[f"scenario_{n}_reward"] = rewards
        print(
            f"scenario {n}: {len(rewards)} steps, total cost {-rewards.sum():,.2f} "
            f"({time.time() - t0:.0f}s)",
            flush=True,
        )

    FIXTURE.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(FIXTURE, **existing)
    print(f"wrote {FIXTURE} ({FIXTURE.stat().st_size / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()
