#!/usr/bin/env python
"""Throughput benchmark: batched env-steps/s/chip on pymgrid25.

Rolls out the rule-based-control policy over B replicas of pymgrid25
microgrid_0 inside one jitted ``lax.scan`` program (policy + three-phase
dispatch + observation construction fused per step), with episode auto-reset.
Observations are consumed (checksummed) every step so the RL-facing obs path
is part of the measured work, not dead code.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "env_steps/s/chip", "vs_baseline": N}
vs_baseline is relative to the 1M env-steps/s/chip target (BASELINE.md).

Env knobs: PYMGRID_BENCH_BATCH (default 4096), PYMGRID_BENCH_STEPS (1000),
PYMGRID_BENCH_REPEATS (3).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_rollout(batch_size, n_steps, dtype=np.float32):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pymgrid_tpu import Microgrid
    from pymgrid_tpu.algos import RuleBasedControl
    from pymgrid_tpu.core.engine import make_reset_fn, make_step_fn
    from pymgrid_tpu.core.rollout import make_priority_policy
    from pymgrid_tpu.core.spec import extract_spec

    mg = Microgrid.from_scenario(0)
    rbc = RuleBasedControl(mg)
    spec, params, _ = extract_spec(rbc.microgrid, dtype=dtype)
    params = jax.tree.map(jnp.asarray, params)

    policy = make_priority_policy(spec, rbc.priority_list)
    step_fn = make_step_fn(spec, normalized=False)
    reset_fn = make_reset_fn(spec)

    def single_rollout(params, key):
        state = reset_fn(params, key)

        def body(carry, _):
            state, acc = carry
            action = policy(params, state)
            new_state, out = step_fn(params, state, action)
            fresh = reset_fn(params, new_state["rng"])
            new_state = jax.tree.map(
                lambda f, n: jnp.where(out.done, f, n), fresh, new_state
            )
            # consume reward and obs so neither is dead code
            acc = acc + out.reward + out.obs.sum()
            return (new_state, acc), None

        (final_state, acc), _ = lax.scan(
            body, (state, jnp.asarray(0.0, jnp.dtype(spec.dtype))), None,
            length=n_steps,
        )
        return acc

    @jax.jit
    def batch_rollout(params, keys):
        return jax.vmap(lambda k: single_rollout(params, k))(keys)

    keys = jax.random.split(jax.random.PRNGKey(0), batch_size)
    return batch_rollout, params, keys


def main():
    import jax

    batch_size = int(os.environ.get("PYMGRID_BENCH_BATCH", 131072))
    n_steps = int(os.environ.get("PYMGRID_BENCH_STEPS", 2000))
    repeats = int(os.environ.get("PYMGRID_BENCH_REPEATS", 3))

    backend = jax.default_backend()
    n_chips = len(jax.devices())

    rollout, params, keys = build_rollout(batch_size, n_steps)

    # compile + warmup
    np.asarray(rollout(params, keys))

    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        # np.asarray forces execution AND the host fetch — block_until_ready
        # alone under-reports on relayed backends
        np.asarray(rollout(params, keys))
        best = min(best, time.perf_counter() - t0)

    steps_per_sec = batch_size * n_steps / best
    per_chip = steps_per_sec  # single-program on one chip

    result = {
        "metric": "batched_env_steps_per_sec_per_chip_pymgrid25_mg0_rbc",
        "value": round(per_chip, 1),
        "unit": "env_steps/s/chip",
        "vs_baseline": round(per_chip / 1e6, 3),
        "batch": batch_size,
        "n_steps": n_steps,
        "backend": backend,
        "n_chips_visible": n_chips,
        "wall_s": round(best, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
