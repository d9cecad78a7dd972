"""The full public import surface of the reference, mirrored 1:1.

Every public name the reference exports (enumerated from its source tree,
see SURVEY.md §2) must be importable from the analogous ``pymgrid_tpu``
location, so reference user code ports with a package rename alone.
"""
import importlib

import pytest

SURFACE = {
    "pymgrid_tpu": ["Microgrid", "MicrogridGenerator", "NonModularMicrogrid", "envs"],
    "pymgrid_tpu.generator": ["MicrogridGenerator"],
    "pymgrid_tpu.modules": [
        "BaseMicrogridModule",
        "BaseTimeSeriesMicrogridModule",
        "BatteryModule",
        "GensetModule",
        "GridModule",
        "LoadModule",
        "RenewableModule",
        "UnbalancedEnergyModule",
        "Container",
        "ModuleContainer",
        "ModuleList",
        "get_subcontainers",
    ],
    "pymgrid_tpu.microgrid": ["Microgrid", "MicrogridStep", "DEFAULT_HORIZON"],
    "pymgrid_tpu.microgrid.trajectory": [
        "BaseTrajectory",
        "DeterministicTrajectory",
        "StochasticTrajectory",
        "FixedLengthStochasticTrajectory",
    ],
    "pymgrid_tpu.microgrid.reward_shaping": [
        "BaseRewardShaper",
        "BatteryDischargeShaper",
        "PVCurtailmentShaper",
    ],
    "pymgrid_tpu.convert": [
        "to_modular",
        "to_nonmodular",
        "get_module",
        "check_viability",
        "get_empty_params",
        "finalize_params",
        "add_params_from_module",
    ],
    "pymgrid_tpu.envs": [
        "BaseMicrogridEnv",
        "DiscreteMicrogridEnv",
        "ContinuousMicrogridEnv",
    ],
    "pymgrid_tpu.algos": [
        "RuleBasedControl",
        "ModelPredictiveControl",
        "SampleAverageApproximation",
        "PriorityListAlgo",
        "PriorityListElement",
        "HorizonOutput",
        "ControlOutput",
        "Benchmarks",
    ],
    "pymgrid_tpu.forecast": [
        "get_forecaster",
        "Forecaster",
        "UserDefinedForecaster",
        "OracleForecaster",
        "GaussianNoiseForecaster",
        "NoForecaster",
        "vectorize_scalar_forecaster",
    ],
    "pymgrid_tpu.utils.data_generator": [
        "return_underlying_data",
        "NoisyPVData",
        "NoisyLoadData",
        "NoisyGridData",
        "SampleGenerator",
        "ForecastArgSet",
        "ForecastArgs",
    ],
    "pymgrid_tpu.utils": ["add_pymgrid_yaml_representers"],
    "pymgrid_tpu.utils.logger": ["ModularLogger"],
    "pymgrid_tpu.utils.ray": ["ray_decorator"],
    "pymgrid_tpu.utils.serialize": [
        "add_pymgrid_yaml_representers",
        "add_numpy_pandas_representers",
        "add_numpy_pandas_constructors",
        "add_path_to_arr_like",
        "dump_data",
        "NDArraySubclass",
    ],
    "pymgrid_tpu.utils.space": ["ModuleSpace", "MicrogridSpace"],
    "pymgrid_tpu.nonmodular": [
        "NonModularMicrogrid",
        "Battery",
        "Genset",
        "Grid",
        "in_ipynb",
    ],
    "pymgrid_tpu.algos.nonmodular_rbc": ["NonModularRuleBasedControl"],
    "pymgrid_tpu.legacy_envs": [
        "Environment",
        "CsplaMicroGridEnv",
        "CsdaMicroGridEnv",
        "MicrogridEnv",
        "ContinuousMicrogridEnv",
        "ContinuousMicrogridSampleEnv",
        "SafeExpMicrogridEnv",
        "SafeExpMicrogridSampleEnv",
        "normalize_environment_states",
        "sample_reset",
    ],
}


@pytest.mark.parametrize("module_path", sorted(SURFACE))
def test_public_names(module_path):
    mod = importlib.import_module(module_path)
    missing = [n for n in SURFACE[module_path] if not hasattr(mod, n)]
    assert not missing, f"{module_path} missing {missing}"


def test_get_subcontainers_matches_container():
    from pymgrid_tpu.modules import get_subcontainers
    from tests.helpers.modular_microgrid import get_modular_microgrid

    mg = get_modular_microgrid()
    subs = get_subcontainers([m for _, m in mg.modules.iterdict()])
    assert ("fixed", "sinks") in subs
    names = {n for c in subs.values() for n in c}
    assert "load" in names and "battery" in names


def test_add_pymgrid_yaml_representers_idempotent():
    from pymgrid_tpu.utils.serialize import add_pymgrid_yaml_representers

    add_pymgrid_yaml_representers()
    add_pymgrid_yaml_representers()


def test_in_ipynb_false_outside_notebook():
    from pymgrid_tpu.nonmodular import in_ipynb

    assert in_ipynb() is False
