"""Sample generators, SAA, and Benchmarks."""
import warnings

import numpy as np
import pandas as pd
import pytest

from pymgrid_tpu.utils.data_generator import (
    NoisyGridData,
    NoisyLoadData,
    NoisyPVData,
    SampleGenerator,
    ForecastArgSet,
    quantile_regression_fit,
    return_underlying_data,
)


def _nonmodular(seed=5, grid_only=False):
    from pymgrid_tpu.generator import MicrogridGenerator

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        gen = MicrogridGenerator(nb_microgrid=8, random_seed=seed)
        gen.generate_microgrid(modular=False)
    for mg in gen.microgrids:
        if mg.architecture["grid"] == 1 and (not grid_only or mg.architecture["genset"] == 0):
            return mg
    return gen.microgrids[0]


def test_quantile_regression_pinball():
    rng = np.random.RandomState(0)
    n = 300
    X = np.column_stack([np.ones(n), np.sin(np.linspace(0, 6, n))])
    y = X @ np.array([5.0, 2.0]) + rng.randn(n)
    for q in (0.25, 0.5, 0.9):
        beta = quantile_regression_fit(y, X, q)
        frac_below = np.mean(y <= X @ beta)
        assert abs(frac_below - q) < 0.06, f"q={q}: frac_below={frac_below}"


def test_noisy_pv_data():
    mg = _nonmodular()
    np.random.seed(0)
    npv = NoisyPVData(pv_data=mg._pv_ts)
    sample = npv.sample()
    assert sample.shape[0] == len(mg._pv_ts)
    assert (sample["pv"] >= 0).all()
    # daily shape plausible: zero at midnight
    assert sample["pv"].iloc[0] == 0

    # preset-style sampling with pushes
    args = ForecastArgSet(preset_to_use=85)
    sample2 = npv.sample(**args["pv_args"])
    mape = SampleGenerator.mape(None, mg._pv_ts.values, sample2["pv"].values)
    assert mape < 1.0


def test_noisy_load_data():
    mg = _nonmodular()
    np.random.seed(1)
    nl = NoisyLoadData(load_data=mg._load_ts)
    sample = nl.sample(load_variance_scale=1.0)
    assert sample.shape[0] == min(len(mg._load_ts), 8760)
    assert (sample["load"] >= 0).all()
    # mean close to underlying mean
    ratio = sample["load"].mean() / mg._load_ts.values.mean()
    assert 0.8 < ratio < 1.2


@pytest.mark.parametrize("dist_type", ["naive", "markov"])
def test_noisy_grid_data(dist_type):
    mg = _nonmodular()
    np.random.seed(2)
    ng = NoisyGridData(grid_data=mg._grid_status_ts, dist_type=dist_type)
    sample = ng.sample()
    assert len(sample) == len(mg._grid_status_ts)
    assert set(np.unique(sample)) <= {0.0, 1.0}


def test_sample_generator():
    mg = _nonmodular()
    np.random.seed(3)
    sg = SampleGenerator(mg, preset_to_use=50)
    assert set(sg.forecasts.columns) == {"pv", "load", "grid"}
    mape = sg.validate_forecasts(aggregate=True)
    assert np.isfinite(mape)

    samples = sg.sample_from_forecasts(n_samples=2)
    assert len(samples) == 2
    for s in samples:
        assert set(s.columns) == {"pv", "load", "grid"}

    data = return_underlying_data(mg)
    assert data.shape[1] == 3


def test_saa_run():
    from pymgrid_tpu.algos.saa import SampleAverageApproximation
    from pymgrid_tpu.algos.control import ControlOutput

    mg = _nonmodular()
    np.random.seed(4)
    saa = SampleAverageApproximation(mg, preset_to_use=85)
    out = saa.run(n_samples=2, forecast_steps=3, optimal_percentile=0.5)
    assert isinstance(out, ControlOutput)
    assert len(out["cost"]["total_cost"]) == 3
    assert np.isfinite(out["cost"]["total_cost"]).all()
    frame = out.to_frame()
    assert ("cost", "total_cost") in frame.columns


def test_nonmodular_mpc_control_output():
    from pymgrid_tpu.algos.mpc import ModelPredictiveControl
    from pymgrid_tpu.algos.control import ControlOutput

    mg = _nonmodular()
    mpc = ModelPredictiveControl(mg)
    assert not mpc.is_modular
    out = mpc.run(max_steps=4)
    assert isinstance(out, ControlOutput)
    assert len(out["cost"]["total_cost"]) == 4


def test_benchmarks_modular():
    import pymgrid_tpu
    from pymgrid_tpu.algos.control import Benchmarks

    mg = pymgrid_tpu.Microgrid.from_scenario(2)
    bench = Benchmarks(mg)
    bench.run_rule_based_benchmark(max_steps=48)
    import pymgrid_tpu as pt

    mg2 = pt.Microgrid.from_scenario(2)
    bench2 = Benchmarks(mg2)
    bench2.run_mpc_benchmark(max_steps=48)
    bench2.outputs_dict.update(bench.outputs_dict)
    bench2.has_rule_based_benchmark = True
    bench2.describe_benchmarks()
    bench2.describe_benchmarks(test_split=True, test_ratio=0.5)
