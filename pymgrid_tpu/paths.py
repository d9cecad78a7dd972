"""Data asset resolution.

Benchmark data (the ``pymgrid25`` scenario suite and the load/PV/CO2
profiles) is resolved in order from:

1. ``$PYMGRID_TPU_DATA_DIR``
2. the packaged ``pymgrid_tpu/data`` directory (populated by
   ``tools/import_reference_data.py``)
3. a reference pymgrid checkout's ``src/pymgrid/data`` (``$PYMGRID_REF_DATA``
   or the default mount at ``/root/reference``)
"""
import os
from pathlib import Path

PROJECT_PATH = Path(__file__).parent

_REFERENCE_DATA = Path(
    os.environ.get("PYMGRID_REF_DATA", "/root/reference/src/pymgrid/data")
)


def data_dir():
    env = os.environ.get("PYMGRID_TPU_DATA_DIR")
    if env:
        return Path(env)
    packaged = PROJECT_PATH / "data"
    if packaged.exists():
        return packaged
    if _REFERENCE_DATA.exists():
        return _REFERENCE_DATA
    raise FileNotFoundError(
        "No pymgrid data directory found. Set PYMGRID_TPU_DATA_DIR or run "
        "tools/import_reference_data.py."
    )


def scenario_yaml_path(n):
    d = data_dir() / "scenario" / "pymgrid25" / f"microgrid_{n}" / f"microgrid_{n}.yaml"
    if d.exists():
        return d
    # fall back to the reference checkout if the packaged copy lacks scenarios
    alt = (
        _REFERENCE_DATA / "scenario" / "pymgrid25" / f"microgrid_{n}" / f"microgrid_{n}.yaml"
    )
    if alt.exists():
        return alt
    raise FileNotFoundError(f"Scenario {n} not found under {d} or {alt}.")
