"""Harness for importing the reference implementation as ground truth.

The reference (Total-RD/pymgrid) is mounted read-only at /root/reference and
depends on ``gym``, which is not installed; a thin shim backed by gymnasium
provides the API subset it uses.  Parity tests compare pymgrid_tpu against
the genuine reference behavior rather than against recorded fixtures.

If the reference is unavailable (e.g. a standalone checkout of this repo),
tests that need it are skipped via :func:`reference_available`.
"""
import os
import sys
import types

REFERENCE_SRC = os.environ.get("PYMGRID_REFERENCE_SRC", "/root/reference/src")


def _install_gym_shim():
    if "gym" in sys.modules:
        return
    try:
        import gymnasium
    except ImportError:
        return

    gym = types.ModuleType("gym")
    gym.__version__ = "0.22.0"
    gym.Env = gymnasium.Env
    gym.Space = gymnasium.Space
    gym.spaces = gymnasium.spaces
    sys.modules["gym"] = gym
    sys.modules["gym.spaces"] = gymnasium.spaces


def _install_viz_stubs():
    """Stub the reference's notebook/plotting imports if absent."""

    def _stub(name, attrs=()):
        if name in sys.modules:
            return sys.modules[name]
        mod = types.ModuleType(name)
        for attr in attrs:
            setattr(mod, attr, lambda *a, **k: None)
        sys.modules[name] = mod
        return mod

    try:
        import plotly  # noqa: F401
    except ImportError:
        _stub("plotly")
        _stub("plotly.offline", ["init_notebook_mode", "iplot"])
    try:
        import matplotlib  # noqa: F401
        import matplotlib.pyplot  # noqa: F401
    except ImportError:
        _stub("matplotlib")
        pyplot = _stub("matplotlib.pyplot")
        pyplot.__getattr__ = lambda name: (lambda *a, **k: None)
    try:
        import IPython  # noqa: F401
        import IPython.display  # noqa: F401
    except ImportError:
        ipython = _stub("IPython", ["get_ipython"])
        _stub("IPython.display", ["display"])
        ipython.display = sys.modules["IPython.display"]
    try:
        import cufflinks  # noqa: F401
    except ImportError:
        _stub("cufflinks", ["go_offline"])
    try:
        import statsmodels.regression.quantile_regression  # noqa: F401
    except ImportError:
        # A *working* miniature QuantReg (exact LP via HiGHS) so the
        # reference's NoisyPVData curve interpolation — and therefore its
        # SampleAverageApproximation — runs genuinely in-process.
        sm = _stub("statsmodels")
        reg = _stub("statsmodels.regression")
        qr = _stub("statsmodels.regression.quantile_regression")
        qr.QuantReg = _MiniQuantReg
        sm.regression = reg
        reg.quantile_regression = qr
    try:
        import cvxpy  # noqa: F401
    except ImportError:
        # A *working* miniature cvxpy backed by scipy/HiGHS (helpers/
        # cvxpy_shim.py) — enough to run the reference MPC for real parity.
        from helpers import cvxpy_shim

        sys.modules["cvxpy"] = cvxpy_shim


class _MiniQuantReg:
    """statsmodels-compatible quantile regression over pandas inputs.

    Backed by the exact LP formulation (the same solver path as
    ``pymgrid_tpu.utils.data_generator.quantile_regression_fit``), so the
    reference's PV curve fits and ours agree bitwise in parity tests.
    """

    def __init__(self, endog, exog):
        self.endog = endog
        self.exog = exog

    def fit(self, q=0.5, **kwargs):
        import numpy as np
        import pandas as pd

        from pymgrid_tpu.utils.data_generator import quantile_regression_fit

        beta = quantile_regression_fit(
            np.asarray(self.endog, dtype=float),
            np.asarray(self.exog, dtype=float),
            q,
        )
        index = getattr(self.exog, "columns", None)
        params = pd.Series(beta, index=index)
        return types.SimpleNamespace(params=params)


def _patch_numpy_compat():
    """The reference targets numpy<2; restore the aliases it uses."""
    import numpy as np

    if not hasattr(np, "product"):
        np.product = np.prod
    if not hasattr(np, "float_"):
        np.float_ = np.float64
    if not hasattr(np, "int_"):
        np.int_ = np.int64
    if not hasattr(np, "NaN"):
        np.NaN = np.nan


def reference_available():
    return os.path.isdir(os.path.join(REFERENCE_SRC, "pymgrid"))


def import_reference():
    """Import and return the reference ``pymgrid`` package."""
    if not reference_available():
        raise ImportError(f"reference source not found at {REFERENCE_SRC}")
    _install_gym_shim()
    _install_viz_stubs()
    _patch_numpy_compat()
    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)
    import pymgrid  # noqa: F401

    return pymgrid


def make_reference_microgrid(seed=0, weak_grid=False, genset=True, battery=True,
                             grid=True, timesteps=120):
    """Build a reference microgrid with random time series (seeded)."""
    import numpy as np

    pymgrid = import_reference()
    from pymgrid.modules import (
        BatteryModule,
        GensetModule,
        GridModule,
        LoadModule,
        RenewableModule,
    )

    rng = np.random.RandomState(seed)
    modules = []
    if genset:
        modules.append(
            GensetModule(
                running_min_production=10,
                running_max_production=50,
                genset_cost=0.5,
                co2_per_unit=2.0,
                cost_per_unit_co2=0.1,
                start_up_time=rng.randint(0, 3),
                wind_down_time=rng.randint(0, 3),
            )
        )
    if battery:
        modules.append(
            BatteryModule(
                min_capacity=10,
                max_capacity=100,
                max_charge=50,
                max_discharge=50,
                efficiency=0.9,
                battery_cost_cycle=0.02,
                init_soc=0.5,
            )
        )
    modules.append(("pv", RenewableModule(time_series=50 * rng.rand(timesteps))))
    modules.append(LoadModule(time_series=60 * rng.rand(timesteps)))
    if grid:
        ts = rng.rand(timesteps, 4)
        ts[:, 3] = (rng.rand(timesteps) > 0.3) if weak_grid else 1.0
        modules.append(
            GridModule(
                max_import=100, max_export=100, time_series=ts, cost_per_unit_co2=0.1
            )
        )
    return pymgrid.Microgrid(modules)
