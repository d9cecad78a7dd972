"""Legacy layer parity: generator, nonmodular simulation, conversion."""
import warnings

import numpy as np
import pandas as pd
import pytest

from helpers.reference import reference_available, import_reference

needs_ref = pytest.mark.skipif(
    not reference_available(), reason="reference not available"
)

REF_PATH = "/root/reference/src/pymgrid"


def _gen_pair(n=3, seed=42):
    """Reference and our generators reading the same data dir, same seed."""
    import_reference()
    from pymgrid.MicrogridGenerator import MicrogridGenerator as RefGen
    from pymgrid_tpu.generator import MicrogridGenerator as OurGen

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ref = RefGen(nb_microgrid=n, random_seed=seed, path=REF_PATH)
        ref.generate_microgrid(modular=False)
        ours = OurGen(nb_microgrid=n, random_seed=seed, path=REF_PATH)
        ours.generate_microgrid(modular=False)
    return ref, ours


@needs_ref
def test_generator_seed_parity():
    """Same seed, same data files -> bitwise-identical scenario parameters."""
    ref, ours = _gen_pair(n=4)
    for i, (rm, om) in enumerate(zip(ref.microgrids, ours.microgrids)):
        assert rm.architecture == om.architecture, f"microgrid {i}"
        pd.testing.assert_frame_equal(
            rm.parameters, om.parameters, check_exact=True
        )
        np.testing.assert_array_equal(rm._load_ts.values, om._load_ts.values)
        np.testing.assert_array_equal(rm._pv_ts.values, om._pv_ts.values)
        if rm.architecture["grid"]:
            np.testing.assert_array_equal(
                rm._grid_status_ts.values, om._grid_status_ts.values
            )
            np.testing.assert_array_equal(
                rm._grid_price_import.values, om._grid_price_import.values
            )


@needs_ref
def test_nonmodular_run_parity():
    """Identical control sequences produce identical record dicts."""
    ref, ours = _gen_pair(n=2, seed=7)
    for rm, om in zip(ref.microgrids, ours.microgrids):
        rng = np.random.RandomState(0)
        for _ in range(40):
            control = {}
            if rm.architecture["battery"]:
                control["battery_charge"] = float(rng.rand() * 50)
                control["battery_discharge"] = float(rng.rand() * 50)
            if rm.architecture["grid"]:
                control["grid_import"] = float(rng.rand() * 100)
                control["grid_export"] = float(rng.rand() * 50)
            if rm.architecture["genset"]:
                control["genset"] = float(rng.rand() * 100)
            ref_out = rm.run(dict(control))
            our_out = om.run(dict(control))
            assert ref_out == our_out

        for attr in ("_df_record_actual_production", "_df_record_cost", "_df_record_co2"):
            ref_d, our_d = getattr(rm, attr), getattr(om, attr)
            assert set(ref_d) == set(our_d)
            for k in ref_d:
                np.testing.assert_array_equal(ref_d[k], our_d[k], err_msg=f"{attr}.{k}")


@needs_ref
def test_to_modular_conversion_parity():
    """Converted modules match the reference's conversion, category by
    category (mirrors ``tests/conversion_test/test_modular_conversion.py``)."""
    ref, ours = _gen_pair(n=4, seed=11)
    for i, (rm, om) in enumerate(zip(ref.microgrids, ours.microgrids)):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            ref_modular = rm.to_modular()
            our_modular = om.to_modular()

        assert sorted(dict(ref_modular.modules.iterdict())) == sorted(
            dict(our_modular.modules.iterdict())
        ), f"microgrid {i}"

        for (name, ref_mods), (_, our_mods) in zip(
            ref_modular.modules.iterdict(), our_modular.modules.iterdict()
        ):
            for r, o in zip(ref_mods, our_mods):
                if hasattr(r, "time_series"):
                    np.testing.assert_allclose(
                        np.abs(r.time_series), np.abs(o.time_series),
                        err_msg=f"{name} ts",
                    )
                for attr in (
                    "min_capacity", "max_capacity", "efficiency",
                    "running_min_production", "running_max_production",
                    "genset_cost", "max_import", "max_export",
                    "loss_load_cost", "overgeneration_cost",
                ):
                    rv, ov = getattr(r, attr, None), getattr(o, attr, None)
                    if rv is not None or ov is not None:
                        assert rv == ov, f"{name}.{attr}"


def test_nonmodular_round_trip():
    """modular -> nonmodular -> modular preserves parameters."""
    from helpers.modular_microgrid import get_modular_microgrid

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        mg = get_modular_microgrid(remove_modules=["genset"])
        nonmodular = mg.to_nonmodular()
        back = nonmodular.to_modular()

    battery = back.modules["battery"].item()
    assert battery.max_capacity == 100
    assert battery.efficiency == 1.0
    grid = back.modules["grid"].item()
    assert grid.max_import == 100
    load = back.modules["load"].item()
    assert load.current_load == 60


def test_nonmodular_runs_standalone():
    from pymgrid_tpu.generator import MicrogridGenerator

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        gen = MicrogridGenerator(nb_microgrid=2, random_seed=1)
        gen.generate_microgrid(modular=False)

    for mg in gen.microgrids:
        mg.train_test_split(train_size=0.5)
        for _ in range(10):
            control = {"battery_charge": 0.0, "battery_discharge": 10.0}
            if mg.architecture["grid"]:
                control.update(grid_import=20.0, grid_export=0.0)
            if mg.architecture["genset"]:
                control["genset"] = 10.0
            out = mg.run(control)
        assert len(mg._df_record_cost["total_cost"]) == 10
        mg.reset(testing=True)
        assert mg._data_set_to_use == "testing"


@needs_ref
def test_generator_modular_output():
    """generate_microgrid(modular=True) yields runnable modular microgrids."""
    import pymgrid_tpu
    from pymgrid_tpu.generator import MicrogridGenerator

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        gen = MicrogridGenerator(nb_microgrid=2, random_seed=3)
        gen.generate_microgrid(modular=True)

    for mg in gen.microgrids:
        assert isinstance(mg, pymgrid_tpu.Microgrid)
        np.random.seed(0)
        for _ in range(3):
            obs, reward, done, info = mg.run(mg.sample_action())
        assert np.isfinite(reward)


@needs_ref
def test_nonmodular_rbc_parity():
    """Legacy rule-based benchmark (the xlsx pipeline) matches the reference
    frame-by-frame across architectures (grid-only / genset / weak-grid)."""
    ref, ours = _gen_pair(n=6, seed=3)
    from pymgrid.algos.rbc._nonmodular_rbc import (
        NonModularRuleBasedControl as RefRBC,
    )
    from pymgrid_tpu.algos.nonmodular_rbc import NonModularRuleBasedControl

    import io
    import contextlib

    archs = set()
    for rm, om in zip(ref.microgrids, ours.microgrids):
        archs.add((rm.architecture["grid"], rm.architecture["genset"]))
        with contextlib.redirect_stdout(io.StringIO()):
            ref_out = RefRBC(rm).run_rule_based(length=150)
        our_out = NonModularRuleBasedControl(om).run_rule_based(length=150)
        for name in ("action", "status", "production", "cost", "co2"):
            ref_d, our_d = ref_out[name], our_out[name]
            assert set(ref_d) == set(our_d), name
            for k in ref_d:
                np.testing.assert_array_equal(
                    ref_d[k], our_d[k], err_msg=f"{name}.{k}"
                )
    assert len(archs) >= 2  # multiple architectures actually exercised


@needs_ref
def test_benchmarks_nonmodular_rbc():
    """Benchmarks orchestration runs the legacy RBC on nonmodular microgrids."""
    from pymgrid_tpu.algos.control import Benchmarks, ControlOutput

    _, ours = _gen_pair(n=1, seed=5)
    bench = Benchmarks(ours.microgrids[0])
    bench.run_rule_based_benchmark(length=100)
    assert bench.has_rule_based_benchmark
    out = bench.rule_based_output
    assert isinstance(out, ControlOutput)
    total = np.sum(out["cost"]["total_cost"])
    assert np.isfinite(total) and len(out["cost"]["total_cost"]) == 100 - 24
