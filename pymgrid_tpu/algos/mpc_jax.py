"""Batched on-chip model predictive control.

Receding-horizon MPC where the horizon LP is solved *on the TPU* for a whole
batch of replicas at once (:mod:`pymgrid_tpu.core.lp`), and the resulting
first-step control feeds the compiled engine — planner and simulator in one
jitted program per step:

    state -> (c, b, h) from HBM time-series windows -> batched interior-point
    LP solve -> first-block controls -> three-phase dispatch -> state'

The LP is the reference MPC's modular formulation (same block matrices as
:class:`pymgrid_tpu.algos.mpc.ModelPredictiveControl`, which this class
reuses as the builder).  Supports grid-connected configs without a genset
(the genset boolean makes the exact problem a MILP; use the host MPC for
those, or the LP relaxation here knowingly).

Status: float64 solves match HiGHS to ~1e-5 objective and receding-horizon
trajectories track the host MPC within a few percent (interior-point
solutions sit on the analytic center of degenerate optimal faces, not a
simplex vertex).  The float32 TPU path is functional but the batched dense
Cholesky is slow there — replacing the normal-equation solve with matvec-only
CG is the planned TPU fast path.

:class:`ProblemTemplate` factors the (c, b, h) assembly so the stochastic
variant (:mod:`pymgrid_tpu.algos.saa_jax`) can drive the same LP from
sampled futures.
"""
import numpy as np

__all__ = ["BatchedMPC", "ProblemTemplate"]


class ProblemTemplate:
    """Static LP structure for one microgrid + assembly from horizon vectors.

    Wraps the host MPC's block matrices; ``assemble`` is traceable and maps
    per-horizon vectors (load, pv, prices, co2, grid status, initial SOC) to
    the LP data ``(c, b, h)``.
    """

    def __init__(self, microgrid, iters=30, dtype=np.float64, relax_genset=False):
        import jax.numpy as jnp

        from pymgrid_tpu.algos.mpc import ModelPredictiveControl
        from pymgrid_tpu.core.lp import make_batched_ipm_solver
        from pymgrid_tpu.core.spec import extract_spec

        self.host_mpc = ModelPredictiveControl(microgrid)
        if self.host_mpc.has_genset and not relax_genset:
            raise NotImplementedError(
                "The genset on/off boolean makes the horizon problem a MILP; "
                "use the host ModelPredictiveControl, or pass relax_genset=True "
                "to solve the LP relaxation on chip."
            )

        self.spec, params, _ = extract_spec(microgrid, dtype=dtype)
        import jax

        self.params = jax.tree.map(jnp.asarray, params)
        self.horizon = self.host_mpc.horizon
        self.idx = self.host_mpc._idx
        self.block = self.host_mpc._block
        self.rows_per_step = self.host_mpc._rows_per_step
        self.has_genset = self.host_mpc.has_genset
        self.dtype = jnp.dtype(dtype)
        self.costs_static = jnp.asarray(np.asarray(self.host_mpc._costs), dtype)

        K_eq = np.asarray(self.host_mpc._A_eq.todense())
        K_in = np.asarray(self.host_mpc._C_ub.todense())
        self.solver = make_batched_ipm_solver(K_eq, K_in, iters=iters, dtype=dtype)

        self.load_ref = next(m for m in self.spec.fixed if m.kind == "load")
        self.pv_ref = next(m for m in self.spec.flex if m.kind == "renewable")
        self.grid_refs = [m for m in self.spec.controllable if m.kind == "grid"]
        self.battery_ref = next(
            m for m in self.spec.controllable if m.kind == "battery"
        )

    # ------------------------------------------------------------- assembly
    def grid_windows(self, params, t):
        """(price_import, price_export, co2, limits...) over [t, t+H)."""
        import jax.numpy as jnp
        from jax import lax

        H, dtype = self.horizon, self.dtype
        zero_i = jnp.zeros((), t.dtype)
        if self.grid_refs:
            g = self.grid_refs[0].slot
            grid_win = lax.dynamic_slice(
                params["grid"]["ts"][g], (t, zero_i), (H, 4)
            ).astype(dtype)
            return dict(
                price_imp=grid_win[:, 0],
                price_exp=grid_win[:, 1],
                grid_co2=grid_win[:, 2],
                grid_status_real=grid_win[:, 3],
                p_max_imp=params["grid"]["max_import"][g],
                p_max_exp=params["grid"]["max_export"][g],
                cost_co2=params["grid"]["cost_per_unit_co2"][g],
            )
        zeros = jnp.zeros(H, dtype)
        zero = jnp.asarray(0.0, dtype)
        return dict(
            price_imp=zeros, price_exp=zeros, grid_co2=zeros,
            grid_status_real=jnp.ones(H, dtype),
            p_max_imp=zero, p_max_exp=zero, cost_co2=zero,
        )

    def soc_0(self, params, state):
        pb = params["battery"]
        i = self.battery_ref.slot
        return state["battery_charge"][i] / pb["max_capacity"][i]

    def assemble(self, params, load_vec, pv_vec, grid, grid_status, soc_0):
        """LP data from horizon vectors.  ``load_vec``/``pv_vec``/``grid_status``
        are (H,); ``grid`` is the dict from :meth:`grid_windows`."""
        import jax.numpy as jnp

        H, dtype = self.horizon, self.dtype
        idx, nb, rps = self.idx, self.block, self.rows_per_step

        pb = params["battery"]
        i = self.battery_ref.slot
        e_min = pb["min_soc"][i]
        e_max = jnp.asarray(1.0, dtype)
        p_max_charge = pb["max_charge"][i]
        p_max_discharge = pb["max_discharge"][i]

        b = jnp.zeros(2 * H, dtype).at[:H].set(load_vec - pv_vec).at[H].set(soc_0)

        block = jnp.stack(
            [e_max, -e_min, p_max_charge, p_max_discharge,
             jnp.asarray(0.0, dtype), jnp.asarray(0.0, dtype),
             jnp.asarray(0.0, dtype), jnp.asarray(0.0, dtype)]
        )
        h = jnp.tile(block, H)
        off = rps - 4
        h = h.at[off::rps].set(grid["p_max_imp"] * grid_status)
        h = h.at[off + 1 :: rps].set(grid["p_max_exp"] * grid_status)
        h = h.at[off + 2 :: rps].set(pv_vec)
        h = h.at[off + 3 :: rps].set(load_vec)

        c = self.costs_static
        c = c.at[idx["imp"]::nb].set(
            self.costs_static[idx["imp"]::nb]
            + grid["price_imp"] + grid["grid_co2"] * grid["cost_co2"]
        )
        c = c.at[idx["exp"]::nb].set(
            self.costs_static[idx["exp"]::nb] + grid["price_exp"]
        )
        return c, b, h

    def extract_action(self, x):
        """First-block controls -> engine action arrays."""
        import jax.numpy as jnp

        spec, idx, dtype = self.spec, self.idx, self.dtype
        charge = x[idx["charge"]]
        discharge = x[idx["discharge"]]
        action = {
            "battery": jnp.zeros(spec.n_battery, dtype).at[
                self.battery_ref.slot
            ].set(discharge - charge),
            "genset": jnp.zeros((spec.n_genset, 2), dtype),
            "grid": jnp.zeros(spec.n_grid, dtype),
        }
        if self.grid_refs:
            grid_diff = x[idx["imp"]] - x[idx["exp"]]
            action["grid"] = action["grid"].at[self.grid_refs[0].slot].set(grid_diff)
        if self.has_genset:
            action["genset"] = (
                action["genset"].at[0, 0].set(jnp.round(x[0] > 0).astype(dtype))
                .at[0, 1].set(x[0])
            )
        return action


class BatchedMPC:
    def __init__(self, microgrid, batch_size=1, iters=30, dtype=np.float64,
                 relax_genset=False):
        self.batch_size = batch_size
        self.template = ProblemTemplate(
            microgrid, iters=iters, dtype=dtype, relax_genset=relax_genset
        )
        self._host_mpc = self.template.host_mpc
        self.spec = self.template.spec
        self.params = self.template.params
        self.horizon = self.template.horizon
        self._solver = self.template.solver
        self._dtype = self.template.dtype

        self._step_fn = self._build_step()

    # ------------------------------------------------------------------ build
    def _build_step(self):
        import jax
        import jax.numpy as jnp
        from jax import lax

        from pymgrid_tpu.core.engine import make_step_fn

        tpl = self.template
        H = self.horizon
        dtype = self._dtype
        engine_step = make_step_fn(tpl.spec, normalized=False)

        def build_problem(params, state):
            t = state["step"]
            zero_i = jnp.zeros((), t.dtype)
            load_vec = -lax.dynamic_slice(
                params["load"]["ts"][tpl.load_ref.slot], (t, zero_i), (H, 1)
            )[:, 0].astype(dtype)
            pv_vec = lax.dynamic_slice(
                params["renewable"]["ts"][tpl.pv_ref.slot], (t, zero_i), (H, 1)
            )[:, 0].astype(dtype)
            grid = tpl.grid_windows(params, t)
            # modular path uses an always-up grid status over the horizon
            # (reference mpc.py:914)
            grid_status = jnp.ones(H, dtype)
            return tpl.assemble(
                params, load_vec, pv_vec, grid, grid_status, tpl.soc_0(params, state)
            )

        def batched_step(params, states):
            c, b, h = jax.vmap(lambda s: build_problem(params, s))(states)
            x, info = self._solver(c, b, h)
            actions = jax.vmap(tpl.extract_action)(x)
            new_states, outs = jax.vmap(
                lambda s, a: engine_step(params, s, a)
            )(states, actions)
            return new_states, outs, info

        return jax.jit(batched_step)

    # -------------------------------------------------------------------- api
    def reset(self, seed=0):
        import jax

        from pymgrid_tpu.core.engine import make_reset_fn

        keys = jax.random.split(jax.random.PRNGKey(seed), self.batch_size)
        reset_fn = make_reset_fn(self.spec)
        return jax.jit(
            lambda p, ks: jax.vmap(reset_fn, in_axes=(None, 0))(p, ks)
        )(self.params, keys)

    def step(self, states):
        """Plan + act for every replica; returns (states, StepOutput, lp_info)."""
        return self._step_fn(self.params, states)

    def run(self, n_steps, seed=0, collect_rewards=True):
        """Receding-horizon MPC for all replicas; returns stacked rewards
        (n_steps, B) and the final states."""
        import numpy as np

        states = self.reset(seed)
        rewards = []
        for _ in range(n_steps):
            states, outs, info = self.step(states)
            if collect_rewards:
                rewards.append(np.asarray(outs.reward))
        return (np.stack(rewards) if collect_rewards else None), states
