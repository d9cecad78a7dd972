#!/usr/bin/env python
"""Import the pymgrid benchmark data assets into this package.

Reads the reference checkout's data directory (load/PV/CO2 hourly profiles
and the 25 ``pymgrid25`` scenario snapshots) and re-serializes everything
through this framework's own IO:

* profile CSVs are round-tripped through pandas (values preserved);
* scenarios are loaded with our YAML loader and re-dumped with our dumper,
  producing our serialization of the same benchmark data (and exercising the
  dump/load machinery end to end).

Usage: python tools/import_reference_data.py [--ref /root/reference/src/pymgrid/data]
"""
import argparse
import sys
from pathlib import Path

import numpy as np
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def import_profiles(ref_data, out_data):
    for kind in ("co2", "load", "pv"):
        src_dir = ref_data / kind
        dst_dir = out_data / kind
        dst_dir.mkdir(parents=True, exist_ok=True)
        for csv in sorted(src_dir.glob("*.csv")):
            df = pd.read_csv(csv)
            df.to_csv(dst_dir / csv.name, index=False)
            print(f"profile {kind}/{csv.name}: {len(df)} rows")


def import_scenarios(ref_data, out_data):
    import os

    os.environ["PYMGRID_TPU_DATA_DIR"] = str(ref_data)  # resolve from reference
    from pymgrid_tpu import Microgrid

    for n in range(25):
        mg = Microgrid.from_scenario(n)
        out_dir = out_data / "scenario" / "pymgrid25" / f"microgrid_{n}"
        out_dir.mkdir(parents=True, exist_ok=True)
        out_path = out_dir / f"microgrid_{n}.yaml"
        with open(out_path, "w") as f:
            mg.dump(f)

        # verify round trip against the original
        with open(out_path) as f:
            mg2 = Microgrid.load(f)
        assert mg == mg2, f"scenario {n} round-trip mismatch"
        print(f"scenario {n}: {mg}")

    del os.environ["PYMGRID_TPU_DATA_DIR"]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--ref", default="/root/reference/src/pymgrid/data", type=Path
    )
    parser.add_argument("--out", default=REPO / "pymgrid_tpu" / "data", type=Path)
    args = parser.parse_args()

    import_profiles(args.ref, args.out)
    import_scenarios(args.ref, args.out)
    print("done")


if __name__ == "__main__":
    main()
