"""Module-level unit tests mirroring the reference pyramid
(``tests/microgrid/modules/module_tests/``)."""
import warnings

import numpy as np
import pytest

from pymgrid_tpu.modules import (
    BatteryModule,
    GensetModule,
    GridModule,
    LoadModule,
    RenewableModule,
    UnbalancedEnergyModule,
    ModuleContainer,
)


class TestTimeseriesBounds:
    """Action/obs spaces and bounds for time-series modules
    (reference ``timeseries_modules.py``)."""

    def test_load_sign_and_bounds(self):
        ts = 60 * np.random.RandomState(0).rand(50)
        load = LoadModule(time_series=ts)
        assert (load.time_series <= 0).all()
        assert load.min_act.size == 0 and load.max_act.size == 0
        assert load.min_obs == pytest.approx(-ts.max())
        assert load.max_obs == pytest.approx(0.0)
        assert load.current_load == pytest.approx(ts[0])
        assert load.is_sink and not load.is_source

    def test_renewable_sign_and_bounds(self):
        ts = 50 * np.random.RandomState(1).rand(50)
        pv = RenewableModule(time_series=ts)
        assert (pv.time_series >= 0).all()
        assert pv.max_production == pytest.approx(ts[0])
        assert pv.is_source and not pv.is_sink

    def test_mixed_sign_rejected(self):
        with pytest.raises(ValueError):
            RenewableModule(time_series=np.array([1.0, -1.0, 2.0]))

    def test_grid_ts_validation(self):
        with pytest.raises(ValueError):
            GridModule(max_import=10, max_export=10, time_series=np.ones((10, 2)))
        bad_status = np.ones((10, 4))
        bad_status[:, 3] = 0.5
        with pytest.raises(ValueError):
            GridModule(max_import=10, max_export=10, time_series=bad_status)
        with pytest.raises(ValueError):
            GridModule(max_import=-1, max_export=10, time_series=np.ones((10, 3)))

    def test_grid_outage_bounds(self):
        ts = np.ones((10, 4))
        ts[3, 3] = 0
        grid = GridModule(max_import=100, max_export=50, time_series=ts)
        assert grid.max_production == 100
        for _ in range(3):
            grid.step(0.0, normalized=False)
        assert grid.current_status == 0
        assert grid.max_production == 0 and grid.max_consumption == 0
        assert grid.weak_grid

    def test_forecast_horizon_obs_dims(self):
        ts = np.arange(1.0, 31.0)
        pv = RenewableModule(time_series=ts, forecaster="oracle", forecast_horizon=5)
        assert pv.observation_space.shape == (6,)
        obs, *_ = pv.step(0.2, normalized=True)
        np.testing.assert_allclose(
            pv.state[:6][1:], ts[2:7], err_msg="oracle forecast wrong"
        )


class TestBattery:
    def test_soc_transition_efficiency(self):
        battery = BatteryModule(
            min_capacity=0, max_capacity=100, max_charge=50, max_discharge=50,
            efficiency=0.5, init_soc=0.5,
        )
        # discharge 10 externally -> 20 internal
        battery.step(-10 / battery.efficiency * battery.efficiency, normalized=False)
        # external action -x means sink (charge); positive means source
        battery2 = BatteryModule(
            min_capacity=0, max_capacity=100, max_charge=50, max_discharge=50,
            efficiency=0.5, init_soc=0.5,
        )
        battery2.step(10.0, normalized=False)  # discharge 10 -> internal -20
        assert battery2.current_charge == pytest.approx(30)
        battery2.step(-10.0, normalized=False)  # charge 10 -> internal +5
        assert battery2.current_charge == pytest.approx(35)

    def test_bounds(self):
        battery = BatteryModule(
            min_capacity=10, max_capacity=100, max_charge=50, max_discharge=50,
            efficiency=0.9, init_soc=0.2,
        )
        assert battery.max_production == pytest.approx(min(50, 20 - 10) * 0.9)
        assert battery.max_consumption == pytest.approx(min(50, 100 - 20) / 0.9)
        assert battery.min_act == pytest.approx(-50 / 0.9)
        assert battery.max_act == pytest.approx(50 * 0.9)

    def test_requires_init(self):
        with pytest.raises(ValueError):
            BatteryModule(
                min_capacity=0, max_capacity=100, max_charge=50, max_discharge=50,
                efficiency=1.0,
            )

    def test_clipping(self):
        battery = BatteryModule(
            min_capacity=0, max_capacity=100, max_charge=50, max_discharge=50,
            efficiency=1.0, init_soc=0.1,
        )
        obs, reward, done, info = battery.step(50.0, normalized=False)
        assert info["provided_energy"] == pytest.approx(10)
        assert battery.current_charge == pytest.approx(0)


class TestGenset:
    def test_invalid_production_range(self):
        with pytest.raises(ValueError):
            GensetModule(running_min_production=50, running_max_production=10, genset_cost=1)

    def test_two_dim_action(self):
        genset = GensetModule(
            running_min_production=10, running_max_production=50, genset_cost=0.5
        )
        obs, reward, done, info = genset.step(np.array([1.0, 30.0]), normalized=False)
        assert info["provided_energy"] == 30
        assert reward == pytest.approx(-15.0)

    def test_off_produces_nothing(self):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            genset = GensetModule(
                running_min_production=10, running_max_production=50, genset_cost=0.5,
                init_start_up=False,
            )
        obs, reward, done, info = genset.step(np.array([0.0, 30.0]), normalized=False)
        assert info["provided_energy"] == 0
        assert reward == 0

    def test_cost_with_co2(self):
        genset = GensetModule(
            running_min_production=0, running_max_production=50, genset_cost=0.4,
            co2_per_unit=2.0, cost_per_unit_co2=0.1,
        )
        assert genset.production_marginal_cost == pytest.approx(0.4 + 0.1 * 2.0)

    def test_callable_cost(self):
        genset = GensetModule(
            running_min_production=0, running_max_production=50,
            genset_cost=lambda p: 5 + 0.2 * p,
        )
        assert genset.get_cost(10.0) == pytest.approx(7.0)


class TestUnbalanced:
    def test_costs(self):
        mod = UnbalancedEnergyModule(
            raise_errors=False, loss_load_cost=10, overgeneration_cost=2
        )
        reward, done, info = mod.update(5.0, as_source=True)
        assert reward == -50 and info["provided_energy"] == 5.0
        reward, done, info = mod.update(5.0, as_sink=True)
        assert reward == -10 and info["absorbed_energy"] == 5.0


class TestContainer:
    def test_taxonomy_views(self):
        from helpers.modular_microgrid import get_modular_microgrid

        mg = get_modular_microgrid()
        c = mg.modules
        assert len(c.fixed.sinks) == 1          # load
        assert len(c.flex.sources) == 1         # renewable
        assert len(c.flex.source_and_sinks) == 1  # balancing
        assert len(c.controllable.sources) == 1   # genset
        assert len(c.controllable.source_and_sinks) == 2  # battery, grid
        assert set(c.names()) >= {"load", "renewable", "battery", "genset", "grid"}
        assert len(c.to_list()) == 6
        # attribute access
        assert c.battery[0].max_capacity == 100
        assert mg.battery[0].max_capacity == 100

    def test_name_collision(self):
        from pymgrid_tpu.modules.container import ModuleContainer

        mods = [
            ("x", LoadModule(time_series=np.ones(10))),
            ("x", RenewableModule(time_series=np.ones(10))),
        ]
        with pytest.raises(NameError):
            ModuleContainer(mods)

    def test_get_attrs(self):
        from helpers.modular_microgrid import get_modular_microgrid

        mg = get_modular_microgrid()
        steps = mg.modules.get_attrs("current_step", unique=True)
        assert steps.item() == 0
        d = mg.modules.get_attrs("max_production", as_pandas=False)
        assert "battery" in d


class TestModuleSerialization:
    @pytest.mark.parametrize("factory", [
        lambda: BatteryModule(min_capacity=5, max_capacity=90, max_charge=40,
                              max_discharge=45, efficiency=0.8,
                              battery_cost_cycle=0.01, init_soc=0.4),
        lambda: GensetModule(running_min_production=5, running_max_production=40,
                             genset_cost=0.3, start_up_time=2, wind_down_time=1),
        lambda: LoadModule(time_series=np.random.RandomState(3).rand(30),
                           forecaster="oracle", forecast_horizon=4),
        lambda: RenewableModule(time_series=np.random.RandomState(4).rand(30)),
        lambda: GridModule(max_import=50, max_export=25,
                           time_series=np.random.RandomState(5).rand(30, 3)),
        lambda: UnbalancedEnergyModule(raise_errors=False, loss_load_cost=7,
                                       overgeneration_cost=3),
    ])
    def test_round_trip(self, factory):
        module = factory()
        np.random.seed(0)
        for _ in range(3):
            try:
                module.step(module.sample_action(), normalized=True)
            except (AssertionError, ValueError):
                module.step(0.0, normalized=False)
        cls = type(module)
        restored = cls.load(module.dump())
        assert restored == module
        assert restored.current_step == module.current_step
