"""Vectorized RL environments over the compiled engine.

``BatchedDiscreteEnv`` exposes the discrete priority-list env as a batched
``reset/step`` pair: B replicas step in lockstep on device, integer actions
index a precomputed priority-ordering table
(:func:`~pymgrid_tpu.core.rollout.make_table_policy`, the SURVEY §7 masked
deployment scan) so compile time stays O(n_controllable) no matter how large
the ``n!·2^g`` action space grows, and episodes auto-reset.  This is the
batched analog of :class:`~pymgrid_tpu.envs.DiscreteMicrogridEnv` for RL
training loops.
"""
import numpy as np

from pymgrid_tpu.core.engine import make_reset_fn, make_step_fn
from pymgrid_tpu.core.rollout import make_table_policy

__all__ = ["BatchedDiscreteEnv"]


class BatchedDiscreteEnv:
    def __init__(self, env, batch_size=1, dtype=np.float32, mesh=None,
                 auto_reset=True):
        import jax
        import jax.numpy as jnp
        from pymgrid_tpu.core.spec import extract_spec

        self.batch_size = batch_size
        self.n_actions = env.action_space.n
        self.auto_reset = auto_reset
        self.mesh = mesh
        self.spec, params, _ = extract_spec(env, dtype=dtype)
        self.params = jax.tree.map(jnp.asarray, params)
        self.obs_dim = self.spec.obs_dim

        table_policy = make_table_policy(
            self.spec, [list(pl) for pl in env.actions_list]
        )
        step_fn = make_step_fn(self.spec, normalized=False)
        reset_fn = make_reset_fn(self.spec)

        obs_perm = jnp.asarray(self.spec.env_obs_permutation())

        def single_step(params, state, action_idx):
            action = table_policy(params, state, action_idx)
            new_state, out = step_fn(params, state, action)
            if self.auto_reset:
                fresh = reset_fn(params, new_state["rng"])
                new_state = jax.tree.map(
                    lambda f, n: jnp.where(out.done, f, n), fresh, new_state
                )
            # reorder to the env's flattened (sorted-name) obs layout
            out = out._replace(obs=out.obs[obs_perm])
            return new_state, out

        self._state_sharding = None
        kwargs = {}
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._state_sharding = NamedSharding(mesh, P("batch"))
            self.params = jax.device_put(self.params, NamedSharding(mesh, P()))

        self._batch_reset = jax.jit(
            lambda params, keys: jax.vmap(reset_fn, in_axes=(None, 0))(params, keys)
        )
        self._batch_step = jax.jit(
            lambda params, states, idxs: jax.vmap(
                single_step, in_axes=(None, 0, 0)
            )(params, states, idxs)
        )

    def reset(self, seed=0):
        """Returns (states, obs) for B replicas."""
        import jax

        keys = jax.random.split(jax.random.PRNGKey(seed), self.batch_size)
        if self._state_sharding is not None:
            keys = jax.device_put(keys, self._state_sharding)
        states = self._batch_reset(self.params, keys)
        return states

    def step(self, states, action_indices):
        """Step with integer actions (B,); returns (new_states, StepOutput)."""
        import jax.numpy as jnp

        action_indices = jnp.asarray(action_indices, jnp.int32)
        return self._batch_step(self.params, states, action_indices)

    def save_states(self, path, states):
        """Checkpoint a batch state pytree (sharded arrays write
        cooperatively on a multi-host mesh)."""
        from pymgrid_tpu.utils.checkpoint import save_state

        save_state(path, states)

    def restore_states(self, path):
        """Restore a checkpoint onto this env's sharding; resuming a rollout
        from it is bitwise-identical to an uninterrupted run."""
        from pymgrid_tpu.utils.checkpoint import restore_state

        template = self.reset(seed=0)
        return restore_state(path, template=template)
