#!/usr/bin/env python
"""End-to-end RL training on the compiled engine.

Actor-critic (A2C-style) training of an MLP policy on the discrete
priority-list environment, fully on device:

* B env replicas step in lockstep inside ``lax.scan`` (policy forward +
  table-driven priority-list dispatch + three-phase microgrid dispatch +
  auto-reset, all one fused program per step);
* the learner is data-parallel over a ``batch`` mesh axis: replicas shard
  across chips, the MLP replicates, and XLA inserts the gradient psum — the
  "env batch feeds a sharded learner via collectives" layout from SURVEY §2.7.

Run: python examples/train_rl.py [--scenario 1] [--batch 1024] [--iters 40]
"""
import argparse
import functools
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def build_training(scenario=1, batch=1024, rollout_len=64, lr=3e-4,
                   gamma=0.99, dtype=np.float32, mesh=None,
                   entropy_coef=0.01):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pymgrid_tpu.core.engine import make_reset_fn, make_step_fn
    from pymgrid_tpu.core.rollout import make_table_policy
    from pymgrid_tpu.core.spec import extract_spec
    from pymgrid_tpu.envs import DiscreteMicrogridEnv

    env = DiscreteMicrogridEnv.from_scenario(scenario)
    spec, params, _ = extract_spec(env, dtype=dtype)
    from pymgrid_tpu.core.tables import ensure_tables

    params = ensure_tables(spec, params)  # one fused row gather per step
    params = jax.tree.map(jnp.asarray, params)

    n_actions = env.action_space.n
    obs_dim = spec.obs_dim
    # integer actions index a precomputed priority-ordering table: compile
    # cost stays O(n_controllable) regardless of the action-space size
    table_policy = make_table_policy(spec, [list(pl) for pl in env.actions_list])
    step_fn = make_step_fn(spec, normalized=False)
    reset_fn = make_reset_fn(spec)

    # ---------------------------------------------------------------- model
    def init_mlp(key, sizes):
        keys = jax.random.split(key, len(sizes) - 1)
        return [
            {
                "w": jax.random.normal(k, (m, n), jnp.float32)
                * np.sqrt(2.0 / m),
                "b": jnp.zeros((n,), jnp.float32),
            }
            for k, m, n in zip(keys, sizes[:-1], sizes[1:])
        ]

    def mlp(layers, x):
        for layer in layers[:-1]:
            x = jax.nn.tanh(x @ layer["w"] + layer["b"])
        return x @ layers[-1]["w"] + layers[-1]["b"]

    def init_theta(key):
        kp, kv = jax.random.split(key)
        return {
            "policy": init_mlp(kp, [obs_dim, 64, 64, n_actions]),
            "value": init_mlp(kv, [obs_dim, 64, 64, 1]),
        }

    # ------------------------------------------------------------- rollout
    # reward normalization keeps the gradient scale sane (costs are O(1e4))
    reward_scale = 1e-4

    def env_step(params, state, action_idx, out_done):
        action = table_policy(params, state, action_idx)
        new_state, out = step_fn(params, state, action)
        fresh = reset_fn(params, new_state["rng"])
        new_state = jax.tree.map(
            lambda f, n: jnp.where(out.done, f, n), fresh, new_state
        )
        return new_state, out

    def loss_fn(theta, params, states, obses, keys):
        """One A2C rollout + loss over the whole env batch.

        The scan over rollout steps sits OUTSIDE the env vmap (r4 layout
        playbook): the policy/value MLPs run as ONE (B, obs)-matmul per
        step (MXU work instead of B vmapped matvecs) and the stacked
        (T, B) buffers store one contiguous slab per step — vmapping a
        per-env scan wrote strided (B, T) columns and capped training at
        ~0.1M env-steps/s."""
        # all replicas share the simulated time (same reset start, and
        # auto-resets fire simultaneously since done depends only on t):
        # carrying `step`/deterministic forecast UNBATCHED turns every
        # per-replica time-row gather into one broadcast row (the
        # shared-step trick, parallel/batched_env.py rollout)
        env_axes = {"step": None, "battery_charge": 0, "genset": 0,
                    "rng": 0, "forecast": None}
        batched_env_step = jax.vmap(
            env_step, in_axes=(None, env_axes, 0, None),
            out_axes=(env_axes, 0),
        )

        def body(carry, _):
            states, obses, keys = carry
            sp = jax.vmap(jax.random.split)(keys)          # (B, 2, 2)
            keys, subs = sp[:, 0], sp[:, 1]
            x = obses.astype(jnp.float32)
            logits = mlp(theta["policy"], x)               # (B, A)
            actions = jax.vmap(jax.random.categorical)(subs, logits)
            logp_all = jax.nn.log_softmax(logits)
            onehot = jax.nn.one_hot(actions, logp_all.shape[-1])
            logp = (onehot * logp_all).sum(axis=-1)
            # categorical entropy: exploration pressure away from the
            # RBC-mimicking local optimum
            entropy = -(jnp.exp(logp_all) * logp_all).sum(axis=-1)
            values = mlp(theta["value"], x)[:, 0]
            states, outs = batched_env_step(params, states, actions, None)
            return (states, outs.obs, keys), (
                logp, values, outs.reward * reward_scale, outs.done, entropy
            )

        (states, obses, _), (logps, values, rewards, dones, entropies) = (
            lax.scan(body, (states, obses, keys), None, length=rollout_len)
        )

        # reward-to-go (no bootstrapping past done); all buffers (T, B)
        def disc(carry, x):
            r, d = x
            carry = r + gamma * carry * (1.0 - d.astype(jnp.float32))
            return carry, carry

        _, returns = lax.scan(
            disc, jnp.zeros(rewards.shape[1], jnp.float32),
            (rewards, dones), reverse=True,
        )
        adv = lax.stop_gradient(returns) - values
        policy_loss = -(logps * lax.stop_gradient(adv)).mean()
        value_loss = (adv**2).mean()
        loss = (policy_loss + 0.5 * value_loss
                - entropy_coef * entropies.mean())
        return loss, (states, obses, returns.mean())

    import optax

    optimizer = optax.adam(lr)

    @jax.jit
    def train_step(theta, opt_state, params, states, obses, keys):
        (loss, (states, obses, mean_ret)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(theta, params, states, obses, keys)
        updates, opt_state = optimizer.update(grads, opt_state)
        theta = optax.apply_updates(theta, updates)
        return theta, opt_state, states, obses, loss, mean_ret

    @functools.partial(jax.jit, static_argnums=(7,))
    def train_chunk(theta, opt_state, params, states, obses, keys, start,
                    n_iters):
        """n_iters A2C iterations as ONE device program (lax.scan over the
        whole rollout+grad+Adam update) — r4 trained at 0.07M env-steps/s
        because every iteration paid a host/relay round trip (VERDICT r4
        item 4); chunking keeps the learner device-resident."""
        def body(carry, it):
            theta, opt_state, states, obses, keys = carry
            keys = jax.vmap(lambda k: jax.random.fold_in(k, it))(keys)
            (loss, (states, obses, mean_ret)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(theta, params, states, obses, keys)
            updates, opt_state = optimizer.update(grads, opt_state)
            theta = optax.apply_updates(theta, updates)
            return (theta, opt_state, states, obses, keys), (loss, mean_ret)

        carry = (theta, opt_state, states, obses, keys)
        carry, (losses, mean_rets) = lax.scan(
            body, carry, start + jnp.arange(n_iters)
        )
        theta, opt_state, states, obses, keys = carry
        return theta, opt_state, states, obses, keys, losses, mean_rets

    @jax.jit
    def init_envs(params, keys):
        states = jax.vmap(reset_fn, in_axes=(None, 0))(params, keys)
        # one no-op observation bootstrap: obs comes from a zero-action step
        zero = {
            "battery": jnp.zeros(spec.n_battery, dtype),
            "genset": jnp.zeros((spec.n_genset, 2), dtype),
            "grid": jnp.zeros(spec.n_grid, dtype),
        }
        states, outs = jax.vmap(lambda s: step_fn(params, s, zero))(states)
        # shared-step layout: one scalar simulated time for the whole batch
        states = dict(states)
        states["step"] = states["step"][0]
        states["forecast"] = jax.tree.map(lambda x: x[0], states["forecast"])
        return states, outs.obs

    # ------------------------------------------------------------ evaluation
    from pymgrid_tpu.core.rollout import make_marginal_cost_policy, make_rollout_fn

    @jax.jit
    def _eval_start(params, key):
        """Shared eval start state + first observation (one zero-action
        bootstrap step, same as init_envs, so policy and RBC evaluations
        begin from the identical state)."""
        state = reset_fn(params, key)
        zero = {
            "battery": jnp.zeros(spec.n_battery, dtype),
            "genset": jnp.zeros((spec.n_genset, 2), dtype),
            "grid": jnp.zeros(spec.n_grid, dtype),
        }
        state, out = step_fn(params, state, zero)
        return state, out.obs

    @functools.partial(jax.jit, static_argnums=(2,))
    def _eval_policy(theta, params, n_steps, key):
        """Full-slice return of the GREEDY learned policy (raw rewards,
        no auto-reset) — the verdict's policy-vs-RBC comparison surface."""
        state, obs = _eval_start(params, key)

        def body(carry, _):
            state, obs = carry
            logits = mlp(theta["policy"], obs.astype(jnp.float32))
            action = jnp.argmax(logits)
            pl_action = table_policy(params, state, action)
            state, out = step_fn(params, state, pl_action)
            return (state, out.obs), out.reward

        _, rewards = lax.scan(body, (state, obs), None, length=n_steps)
        return rewards.sum()

    def eval_greedy(theta, n_steps=1000, seed=123):
        return float(_eval_policy(theta, params, n_steps,
                                  jax.random.PRNGKey(seed)))

    def rbc_baseline(n_steps=1000, seed=123):
        """RBC return on the identical eval slice (same start state)."""
        rbc_policy = make_marginal_cost_policy(spec)
        state, _ = _eval_start(params, jax.random.PRNGKey(seed))
        fn = make_rollout_fn(spec, rbc_policy, n_steps, auto_reset=False,
                             collect=False)
        _, (rewards, _) = fn(params, state)
        return float(rewards.sum())

    def run(iters=40, seed=0, log_every=10, theta=None, opt_state=None):
        """Train ``iters`` iterations; dispatches the device-resident
        ``train_chunk`` once per ``log_every`` iterations.  Returns
        ``(theta, opt_state, history)`` so continuation blocks resume the
        Adam moments instead of re-initializing them (ADVICE r4)."""
        key = jax.random.PRNGKey(seed)
        if theta is None:
            theta = init_theta(key)
        if opt_state is None:
            opt_state = optimizer.init(theta)

        env_keys = jax.random.split(jax.random.fold_in(key, 1), batch)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            shard = NamedSharding(mesh, P("batch"))
            env_keys = jax.device_put(env_keys, shard)
            theta = jax.device_put(theta, NamedSharding(mesh, P()))

        states, obses = init_envs(params, env_keys)
        rollout_keys = jax.random.split(jax.random.fold_in(key, 2), batch)

        history = []
        chunk = max(1, min(log_every, iters))
        it = 0
        while it < iters:
            n = min(chunk, iters - it)
            (theta, opt_state, states, obses, rollout_keys, losses,
             mean_rets) = train_chunk(theta, opt_state, params, states,
                                      obses, rollout_keys, it, n)
            mean_rets = np.asarray(mean_rets)
            history.extend(float(r) for r in mean_rets)
            print(
                f"iter {it}..{it + n - 1}: loss={float(np.asarray(losses)[-1]):.4f} "
                f"mean_return={float(mean_rets[-1]):.4f}", flush=True,
            )
            it += n
        return theta, opt_state, history

    run.eval_greedy = eval_greedy
    run.rbc_baseline = rbc_baseline
    return run


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--scenario", type=int, default=1)
    parser.add_argument("--batch", type=int, default=1024)
    parser.add_argument("--rollout-len", type=int, default=64)
    parser.add_argument("--iters", type=int, default=40)
    parser.add_argument("--mesh", action="store_true", help="shard over all devices")
    parser.add_argument("--cpu", action="store_true",
                        help="pin the CPU backend (safe to run while another "
                             "process holds the TPU relay)")
    parser.add_argument("--eval-steps", type=int, default=1000,
                        help="greedy-policy vs RBC evaluation slice length")
    parser.add_argument("--until-beats-rbc", action="store_true",
                        help="keep training in --iters blocks until the "
                             "greedy policy's eval return exceeds RBC on "
                             "the same slice (or --max-blocks)")
    parser.add_argument("--max-blocks", type=int, default=20)
    parser.add_argument("--entropy-coef", type=float, default=0.01)
    parser.add_argument("--log-every", type=int, default=10,
                        help="iterations per device dispatch (one "
                             "train_chunk lax.scan) and per progress line")
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    mesh = None
    if args.mesh:
        from pymgrid_tpu.parallel import make_batch_mesh

        mesh = make_batch_mesh()

    run = build_training(
        scenario=args.scenario, batch=args.batch, rollout_len=args.rollout_len,
        mesh=mesh, entropy_coef=args.entropy_coef,
    )
    rbc_ret = run.rbc_baseline(n_steps=args.eval_steps)
    print(f"RBC return over {args.eval_steps} eval steps: {rbc_ret:,.2f}",
          flush=True)

    t0 = time.time()
    if args.until_beats_rbc:
        theta = opt_state = history = None
        total_iters = 0
        for block in range(args.max_blocks):
            theta, opt_state, hist = run(iters=args.iters, seed=block,
                                         theta=theta, opt_state=opt_state,
                                         log_every=args.log_every)
            history = (history or []) + hist
            total_iters += args.iters
            pol_ret = run.eval_greedy(theta, n_steps=args.eval_steps)
            dt = time.time() - t0
            print(f"after {total_iters} iters ({dt:.1f}s): greedy policy "
                  f"return {pol_ret:,.2f} vs RBC {rbc_ret:,.2f} "
                  f"({'BEATS' if pol_ret > rbc_ret else 'below'})",
                  flush=True)
            if pol_ret > rbc_ret:
                break
        iters_done = total_iters
    else:
        theta, _, history = run(iters=args.iters, log_every=args.log_every)
        iters_done = args.iters
        pol_ret = run.eval_greedy(theta, n_steps=args.eval_steps)
        print(f"greedy policy return over {args.eval_steps} eval steps: "
              f"{pol_ret:,.2f} vs RBC {rbc_ret:,.2f}", flush=True)
    steps = args.batch * args.rollout_len * iters_done
    dt = time.time() - t0
    print(
        f"trained {iters_done} iters ({steps:,} env steps) in {dt:.1f}s "
        f"({steps/dt/1e6:.2f}M steps/s); return {history[0]:.3f} -> {history[-1]:.3f}"
    )


if __name__ == "__main__":
    main()
