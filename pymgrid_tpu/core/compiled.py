"""High-level handle on the compiled engine for a single config.

``CompiledMicrogrid`` extracts the spec/params from a host
:class:`~pymgrid_tpu.microgrid.Microgrid` once, jit-compiles the step and
rollout programs, and offers conversion between the host's dict-shaped
actions/logs and the engine's array world.
"""
import functools

import numpy as np

from pymgrid_tpu.core.engine import make_reset_fn, make_step_fn
from pymgrid_tpu.core.spec import extract_spec

__all__ = ["CompiledMicrogrid"]


class CompiledMicrogrid:
    def __init__(self, microgrid, dtype=np.float64, seed=0, numpy_rng_noise=False):
        """``numpy_rng_noise``: replay the host's global-numpy-RNG gaussian
        forecast stream (snapshotted NOW) into an HBM bank so seeded
        gaussian-forecast trajectories equal the host bitwise — construct at
        the same RNG point the host run starts from (see
        :mod:`pymgrid_tpu.core.noise_bank`)."""
        import dataclasses

        import jax

        self.spec, self.params, self._state0 = extract_spec(microgrid, dtype=dtype)
        if numpy_rng_noise:
            from pymgrid_tpu.core.noise_bank import precompute_numpy_noise

            banks = precompute_numpy_noise(microgrid, self.spec, dtype)
            if banks:
                self.spec = dataclasses.replace(self.spec, numpy_noise=True)
                for kind, bank in banks.items():
                    self.params[kind]["np_noise"] = bank
        self._reset_fn = jax.jit(make_reset_fn(self.spec))
        self._step_fns = {
            False: jax.jit(make_step_fn(self.spec, normalized=False)),
            True: jax.jit(make_step_fn(self.spec, normalized=True)),
        }
        self._seed = seed

    # ------------------------------------------------------------------ api
    def reset(self, seed=None):
        import jax

        key = jax.random.PRNGKey(self._seed if seed is None else seed)
        return self._reset_fn(self.params, key)

    def initial_state(self, seed=None):
        """State matching the host microgrid's *current* (extraction-time)
        module state rather than a fresh reset."""
        import jax
        import jax.numpy as jnp

        key = jax.random.PRNGKey(self._seed if seed is None else seed)
        state = self._reset_fn(self.params, key)
        dtype = jnp.dtype(self.spec.dtype)
        state["step"] = jnp.asarray(self._state0["step"], jnp.int32)
        state["battery_charge"] = jnp.asarray(self._state0["battery_charge"], dtype)
        state["genset"] = {
            k: jnp.asarray(v, jnp.int32) for k, v in self._state0["genset"].items()
        }
        from pymgrid_tpu.core.engine import _forecasts_at

        state["forecast"] = _forecasts_at(
            self.spec, self.params, state["step"], state["rng"]
        )
        return state

    def step(self, state, action, normalized=False):
        return self._step_fns[normalized](self.params, state, action)

    def save_state(self, path, state):
        """Array checkpoint of an engine state (the engine analog of the
        host layer's YAML dump, microgrid/microgrid.py:820-845)."""
        from pymgrid_tpu.utils.checkpoint import save_state

        save_state(path, state)

    def restore_state(self, path):
        """Restore a checkpoint; continuing from it reproduces the
        uninterrupted trajectory bitwise."""
        from pymgrid_tpu.utils.checkpoint import restore_state

        return restore_state(path, template=self.reset(seed=0))

    # -------------------------------------------------------- action mapping
    def action_to_arrays(self, action_dict):
        """Host-style action dict -> engine action arrays."""
        import jax.numpy as jnp

        dtype = jnp.dtype(self.spec.dtype)
        sizes = self.spec.action_sizes()
        out = {
            "battery": np.zeros(sizes["battery"], dtype=dtype),
            "genset": np.zeros((sizes["genset"], 2), dtype=dtype),
            "grid": np.zeros(sizes["grid"], dtype=dtype),
        }
        for ref in self.spec.controllable:
            entry = action_dict[ref.name][ref.num]
            if ref.kind == "genset":
                out["genset"][ref.slot] = np.asarray(entry, dtype=dtype).reshape(2)
            else:
                out[ref.kind][ref.slot] = np.asarray(entry, dtype=dtype).reshape(())
        return {k: jnp.asarray(v) for k, v in out.items()}

    def zero_action(self):
        import jax.numpy as jnp

        dtype = jnp.dtype(self.spec.dtype)
        sizes = self.spec.action_sizes()
        return {
            "battery": jnp.zeros(sizes["battery"], dtype),
            "genset": jnp.zeros((sizes["genset"], 2), dtype),
            "grid": jnp.zeros(sizes["grid"], dtype),
        }

    # ------------------------------------------------------------ log mapping
    def log_frame(self, log_rows, initial_step=None):
        """Stacked engine log rows -> the host ``get_log`` DataFrame."""
        import pandas as pd

        log_rows = np.asarray(log_rows)
        start = self.spec_initial_step if initial_step is None else initial_step
        df = pd.DataFrame(
            log_rows,
            columns=pd.MultiIndex.from_tuples(
                self.spec.log_columns,
                names=["module_name", "module_number", "field"],
            ),
            index=pd.RangeIndex(start=start, stop=start + log_rows.shape[0]),
        )
        return df

    @property
    def spec_initial_step(self):
        return int(self.params["initial_step"])
