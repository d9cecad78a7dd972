"""MPC tests mirroring the reference's analytic-optimum suite
(``tests/control/test_mpc.py``), solved with HiGHS."""
import numpy as np
import pytest

from pymgrid_tpu.algos import ModelPredictiveControl
from pymgrid_tpu.modules import LoadModule, RenewableModule

from helpers.modular_microgrid import get_modular_microgrid


def test_init():
    mpc = ModelPredictiveControl(get_modular_microgrid())
    assert mpc.is_modular
    assert mpc.horizon == 1
    assert mpc.has_genset


def test_run_with_load_pv_battery_grid():
    max_steps, pv_const, load_const = 10, 50, 60
    pv = RenewableModule(time_series=pv_const * np.ones(100))
    load = LoadModule(time_series=load_const * np.ones(100))
    microgrid = get_modular_microgrid(
        remove_modules=["renewable", "load", "genset"], additional_modules=[pv, load]
    )

    out = ModelPredictiveControl(microgrid).run(max_steps=max_steps)
    assert out.shape[0] == max_steps
    np.testing.assert_allclose(
        out[("grid", 0, "grid_import")].values
        + out[("battery", 0, "discharge_amount")].values
        + out[("renewable", 0, "renewable_used")].values,
        [load_const] * max_steps,
        atol=1e-8,
    )


def test_run_with_load_pv_battery_genset():
    max_steps, pv_const, load_const = 10, 50, 60
    pv = RenewableModule(time_series=pv_const * np.ones(100))
    load = LoadModule(time_series=load_const * np.ones(100))
    microgrid = get_modular_microgrid(
        remove_modules=["renewable", "load", "grid"], additional_modules=[pv, load]
    )

    out = ModelPredictiveControl(microgrid).run(max_steps=max_steps)
    assert out.shape[0] == max_steps
    np.testing.assert_allclose(
        out[("load", 0, "load_met")].values, [60.0] * max_steps
    )
    np.testing.assert_allclose(
        out[("genset", 0, "genset_production")].values
        + out[("battery", 0, "discharge_amount")].values,
        [10.0] * max_steps,
        atol=1e-8,
    )


def test_run_twice():
    """Second run starts from the post-run SOC (reset keeps module state, as
    in the reference); the battery is depleted so the genset serves the net
    load alone (reference ``test_mpc.py:56-80``)."""
    max_steps = 10
    pv = RenewableModule(time_series=50 * np.ones(100))
    load = LoadModule(time_series=60 * np.ones(100))
    microgrid = get_modular_microgrid(
        remove_modules=["renewable", "load", "grid"], additional_modules=[pv, load]
    )
    mpc = ModelPredictiveControl(microgrid)

    out1 = mpc.run(max_steps=max_steps)
    np.testing.assert_allclose(
        out1[("load", 0, "load_met")].values, [60.0] * max_steps
    )
    np.testing.assert_allclose(
        out1[("genset", 0, "genset_production")].values
        + out1[("battery", 0, "discharge_amount")].values,
        [10.0] * max_steps,
        atol=1e-8,
    )

    out2 = mpc.run(max_steps=max_steps)
    np.testing.assert_allclose(
        out2[("genset", 0, "genset_production")].values, [10.0] * max_steps, atol=1e-8
    )


def test_run_with_custom_names():
    max_steps, load_const = 10, 60
    pv = RenewableModule(time_series=50 * np.ones(100))
    load = LoadModule(time_series=load_const * np.ones(100))
    microgrid = get_modular_microgrid(
        remove_modules=["renewable", "load", "genset"],
        additional_modules=[("pv_with_name", pv), ("load_with_name", load)],
    )

    out = ModelPredictiveControl(microgrid).run(max_steps=max_steps)
    np.testing.assert_allclose(
        out[("load_with_name", 0, "load_met")].values, [load_const] * max_steps
    )
    np.testing.assert_allclose(
        out[("grid", 0, "grid_import")].values
        + out[("battery", 0, "discharge_amount")].values
        + out[("pv_with_name", 0, "renewable_used")].values,
        [load_const] * max_steps,
        atol=1e-8,
    )


def test_scenario_mpc_smoke():
    """MPC on a pymgrid25 scenario (horizon 24, genset MILP path)."""
    import pymgrid_tpu

    mg = pymgrid_tpu.Microgrid.from_scenario(1)
    mpc = ModelPredictiveControl(mg)
    assert mpc.horizon == 24
    out = mpc.run(max_steps=5)
    assert out.shape[0] == 5
    # energy balance holds every step
    np.testing.assert_allclose(
        out[("balance", 0, "overall_provided_to_microgrid")].values,
        out[("balance", 0, "overall_absorbed_from_microgrid")].values,
    )


def test_mpc_beats_rbc_on_scenario():
    """MPC with perfect forecasts should not cost more than RBC."""
    import pymgrid_tpu
    from pymgrid_tpu.algos import RuleBasedControl

    steps = 72
    mg = pymgrid_tpu.Microgrid.from_scenario(2)
    rbc_cost = -RuleBasedControl(mg).run_compiled(max_steps=steps)[
        ("balance", 0, "reward")
    ].sum()
    mg2 = pymgrid_tpu.Microgrid.from_scenario(2)
    mpc_cost = -ModelPredictiveControl(mg2).run(max_steps=steps)[
        ("balance", 0, "reward")
    ].sum()
    assert mpc_cost <= rbc_cost * 1.001


def test_tight_battery_bounds_remove_loss_load():
    """The reference MPC model caps external battery flows at the internal
    limits, so planned discharges clip in the simulator and appear as loss
    load; tight_battery_bounds models the simulator's true bounds."""
    import pymgrid_tpu

    mg = pymgrid_tpu.Microgrid.from_scenario(0)
    loose = ModelPredictiveControl(mg).run(max_steps=15)
    mg2 = pymgrid_tpu.Microgrid.from_scenario(0)
    tight = ModelPredictiveControl(mg2, tight_battery_bounds=True).run(max_steps=15)
    assert tight[("unbalanced_energy", 0, "loss_load")].sum() <= 1e-6
    assert (
        -tight[("balance", 0, "reward")].sum()
        <= -loose[("balance", 0, "reward")].sum() + 1e-9
    )
