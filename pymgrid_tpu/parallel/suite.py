"""Heterogeneous config batching: the whole pymgrid25 suite as ONE program.

The 25 benchmark scenarios differ only in the presence of the genset and/or
grid modules.  Each scenario is normalized onto a superset structure
(load, pv, balancing, battery, genset, grid) by inserting *neutral* modules
for absent slots — zero-capacity grid (no import/export possible) and a
zero-production genset.  A neutral module's contribution to every phase of
the dispatch is exactly +/-0.0, so trajectories are bit-for-bit identical to
the unpadded config (tested), while all configs share one
:class:`~pymgrid_tpu.core.spec.MicrogridSpec`.

Params then stack along a leading config axis and the engine runs under
``vmap(configs) o vmap(replicas) o scan(time)`` — one XLA program for
``n_configs x batch`` microgrids, shardable over a device mesh.
"""
import numpy as np

from pymgrid_tpu.core.engine import make_reset_fn, make_step_fn
from pymgrid_tpu.core.spec import extract_spec

__all__ = ["normalize_to_superset", "build_suite", "SuiteRunner"]

_CANONICAL_ORDER = ("load", "renewable", "balancing", "battery", "genset", "grid")


def _neutral_grid(T, horizon, forecaster, initial_step=0, final_step=-1):
    from pymgrid_tpu.modules import GridModule

    ts = np.zeros((T, 4))
    ts[:, 3] = 1.0  # always up; zero prices/co2; zero import/export capacity
    return GridModule(
        max_import=0.0,
        max_export=0.0,
        time_series=ts,
        forecaster=forecaster,
        forecast_horizon=horizon,
        initial_step=initial_step,
        final_step=final_step,
    )


def _neutral_genset(initial_step=0):
    from pymgrid_tpu.modules import GensetModule

    return GensetModule(
        running_min_production=0.0,
        running_max_production=0.0,
        genset_cost=0.0,
        initial_step=initial_step,
    )


def normalize_to_superset(microgrid, horizon=None):
    """Rebuild ``microgrid`` with modules in canonical order, inserting
    neutral modules for absent kinds.  Returns a new host Microgrid."""
    import warnings

    from pymgrid_tpu.core.spec import _KINDS  # noqa: F401
    from pymgrid_tpu.microgrid import Microgrid
    from pymgrid_tpu.modules import (
        BatteryModule,
        GensetModule,
        GridModule,
        LoadModule,
        RenewableModule,
        UnbalancedEnergyModule,
    )

    kind_of = {
        LoadModule: "load",
        RenewableModule: "renewable",
        UnbalancedEnergyModule: "balancing",
        BatteryModule: "battery",
        GensetModule: "genset",
        GridModule: "grid",
    }

    by_kind = {}
    T, h = None, horizon
    initial_step, final_step = 0, -1
    for name, modules in microgrid.modules.iterdict():
        for module in modules:
            kind = kind_of[type(module)]
            if kind in by_kind:
                raise ValueError(
                    f"Suite batching supports one module per kind; duplicate {kind}."
                )
            by_kind[kind] = (name, module)
            if hasattr(module, "time_series"):
                T = len(module)
                initial_step = module.initial_step
                final_step = module.final_step
                if h is None:
                    h = module.forecast_horizon

    forecaster = "oracle" if h else None
    ordered = []
    for kind in _CANONICAL_ORDER:
        if kind in by_kind:
            ordered.append(by_kind[kind])
        elif kind == "grid":
            ordered.append(
                ("grid", _neutral_grid(T, h or 0, forecaster, initial_step, final_step))
            )
        elif kind == "genset":
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                ordered.append(("genset", _neutral_genset(initial_step)))
        else:
            raise ValueError(f"Microgrid missing required module kind {kind}.")

    return Microgrid(ordered, add_unbalanced_module=False)


def build_suite(microgrids, dtype=np.float32):
    """Extract one shared spec and config-stacked params from microgrids.

    Returns ``(spec, stacked_params)`` where every array in ``stacked_params``
    carries a leading ``n_configs`` axis.
    """
    import jax

    specs, params_list = [], []
    for mg in microgrids:
        normalized = normalize_to_superset(mg)
        spec, params, _ = extract_spec(normalized, dtype=dtype)
        specs.append(spec)
        params_list.append(params)

    first = specs[0]
    for i, spec in enumerate(specs[1:], 1):
        if spec != first:
            raise ValueError(
                f"Config {i} does not normalize onto the shared spec "
                f"(module structure differs)."
            )

    stacked = jax.tree.map(lambda *xs: np.stack(xs), *params_list)
    from pymgrid_tpu.core.tables import ensure_tables

    stacked = ensure_tables(first, stacked, config_axis=True)
    return first, stacked


class SuiteRunner:
    """Run B replicas of each of N configs in lockstep on device.

    ``rollout(policy_builder, n_steps)`` compiles one program:
    scan over time inside, vmapped over replicas, vmapped over configs,
    optionally sharded over a mesh along the config axis (cross-chip
    communication is only the final metric reduction).
    """

    def __init__(self, microgrids, batch_per_config, dtype=np.float32, mesh=None):
        import jax
        import jax.numpy as jnp

        self.spec, params = build_suite(microgrids, dtype=dtype)
        self.params = jax.tree.map(jnp.asarray, params)
        self.n_configs = len(microgrids)
        self.batch_per_config = batch_per_config
        self.mesh = mesh

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._param_sharding = NamedSharding(mesh, P("batch"))
            self.params = jax.device_put(self.params, self._param_sharding)

    def rollout_fn(self, policy, n_steps, auto_reset=True, collect=False):
        """Jitted ``(params, keys) -> per-config, per-replica outputs``.

        With ``collect=False`` (throughput mode) returns the scalar
        reward+obs checksum per env.  With ``collect=True`` returns
        ``(checksum, StepOutput)`` where the ``StepOutput`` pytree is
        time-major over the full episode — the same collect contract as
        :func:`pymgrid_tpu.core.rollout.make_rollout_fn` (obs, rewards,
        dones, log rows all materialized to HBM every step).
        """
        import jax
        import jax.numpy as jnp
        from jax import lax

        spec = self.spec
        step_fn = make_step_fn(spec, normalized=False)
        reset_fn = make_reset_fn(spec)

        def single(params, key):
            state = reset_fn(params, key)

            def body(carry, _):
                state, acc = carry
                action = policy(params, state)
                new_state, out = step_fn(params, state, action)
                if auto_reset:
                    fresh = reset_fn(params, new_state["rng"])
                    new_state = jax.tree.map(
                        lambda f, n: jnp.where(out.done, f, n), fresh, new_state
                    )
                acc = acc + out.reward + out.obs.sum()
                if collect:
                    return (new_state, acc), out
                return (new_state, acc), None

            (final_state, acc), outs = lax.scan(
                body, (state, jnp.asarray(0.0, jnp.dtype(spec.dtype))), None,
                length=n_steps,
            )
            if collect:
                return acc, outs
            return acc

        def suite_rollout(params, keys):
            # vmap replicas (shared config params), then vmap configs
            per_config = jax.vmap(
                lambda p, ks: jax.vmap(lambda k: single(p, k))(ks),
                in_axes=(0, 0),
            )
            return per_config(params, keys)

        return jax.jit(suite_rollout)

    def make_keys(self, seed=0):
        import jax

        keys = jax.random.split(
            jax.random.PRNGKey(seed), self.n_configs * self.batch_per_config
        ).reshape(self.n_configs, self.batch_per_config, -1)
        if self.mesh is not None:
            keys = jax.device_put(keys, self._param_sharding)
        return keys
