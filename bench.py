#!/usr/bin/env python
"""Throughput benchmark: batched env-steps/s/chip on the pymgrid25 suite.

All 25 benchmark scenarios are normalized onto one shared spec (neutral
padding, bit-exact — see pymgrid_tpu/parallel/suite.py) and run as ONE jitted
program: priority-list policy + three-phase dispatch + observation
construction fused per step, scan over time, vmapped over replicas, vmapped
over configs, with episode auto-reset.  Observations are consumed
(checksummed) every step so the RL-facing obs path is measured work.

HONESTY FIX (round 4): every replica now starts at a key-derived random
initial step (``randomize_initial_step=True``).  Through round 3 all
replicas of a config were bitwise-identical (same start, same in-engine
policy), and inspection of the compiled HLO showed XLA *eliminating the
replica dimension entirely* — the old headline (1.45B env-steps/s) largely
measured broadcastable work, not per-replica simulation.  Numbers from
BENCH_r01..r03 are therefore NOT comparable to r04+; the honest per-replica
engine throughput is what this file now reports.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "env_steps/s/chip", "vs_baseline": N}
vs_baseline is relative to the 1M env-steps/s/chip target (BASELINE.md).

Besides the headline suite number, the same line carries the RL-facing
paths a user would actually train on: ``rl_fused_steps_per_sec`` (the
engine figure: BatchedDiscreteEnv.rollout, one device program, obs
returned), ``rl_env_steps_per_sec`` / ``continuous_env_steps_per_sec``
(python ``step()`` loops — these measure PER-CALL RELAY DISPATCH LATENCY,
one device round trip per step, NOT engine throughput; quote the fused
number for the engine), and ``collect_steps_per_sec`` (log-materializing
rollout, full StepOutput incl. log rows written to HBM).

Env knobs: PYMGRID_BENCH_REPLICAS (default 20480 per config -> 512k envs),
PYMGRID_BENCH_STEPS (default 1000), PYMGRID_BENCH_REPEATS (3),
PYMGRID_BENCH_CONFIGS (default 25), PYMGRID_BENCH_SKIP_EXTRAS=1 to print the
suite number alone.  Extras: PYMGRID_BENCH_RL_BATCH (65536),
PYMGRID_BENCH_RL_STEPS (100; fused — the (T,B,obs) episode buffer bounds T at B=65536), PYMGRID_BENCH_RL_LOOP_STEPS (100), PYMGRID_BENCH_COLLECT_REPLICAS (256),
PYMGRID_BENCH_COLLECT_STEPS (250), PYMGRID_BENCH_COLLECT_CONFIGS (=CONFIGS).
Every code path here is exercised at tiny sizes by tests/test_bench_smoke.py.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _mark(msg):
    """Stage marker on stderr: stdout stays one JSON line, but a wedged TPU
    relay (or a slow compile) is diagnosable from the log."""
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def build_suite_rollout(n_configs, replicas, n_steps, dtype=np.float32):
    from pymgrid_tpu import Microgrid
    from pymgrid_tpu.core.rollout import make_marginal_cost_policy
    from pymgrid_tpu.parallel.suite import SuiteRunner

    microgrids = [Microgrid.from_scenario(n) for n in range(n_configs)]
    runner = SuiteRunner(microgrids, batch_per_config=replicas, dtype=dtype)

    # per-config rule-based control: deployment order from each config's
    # marginal costs at runtime (bitwise-equal to the host RBC, tested)
    policy = make_marginal_cost_policy(runner.spec)

    fn = runner.rollout_fn(
        policy, n_steps, auto_reset=True, collect=False,
        randomize_initial_step=True,   # honest mode: distinct replicas
    )
    keys = runner.make_keys(seed=0)
    return fn, runner.params, keys


def bench_rl_env_step(batch_size=65536, n_steps=100, dtype=np.float32, seed=0):
    """User-facing RL path: BatchedDiscreteEnv.step with obs returned."""
    import jax
    from pymgrid_tpu import Microgrid
    from pymgrid_tpu.envs import DiscreteMicrogridEnv
    from pymgrid_tpu.parallel.batched_env import BatchedDiscreteEnv

    import jax.numpy as jnp

    env = DiscreteMicrogridEnv.from_scenario(0)
    batched = BatchedDiscreteEnv(env, batch_size=batch_size, dtype=dtype)
    rng = np.random.RandomState(seed)
    # on device up front: through the TPU relay a per-call host->device
    # transfer of the action block would dominate the measurement
    action_seq = jnp.asarray(
        rng.randint(batched.n_actions, size=(n_steps, batch_size)), jnp.int32
    )

    states = batched.reset(seed=seed)
    states, out = batched.step(states, action_seq[0])  # compile
    np.asarray(out.obs)

    t0 = time.perf_counter()
    for k in range(n_steps):
        states, out = batched.step(states, action_seq[k])
    np.asarray(out.obs[:2])  # force completion; avoid a 38MB tunnel fetch
    wall = time.perf_counter() - t0
    return batch_size * n_steps / wall


def bench_rl_fused_rollout(batch_size=65536, n_steps=100, dtype=np.float32,
                           seed=0):
    """Same work as bench_rl_env_step but via BatchedDiscreteEnv.rollout:
    the whole action sequence runs as ONE device program (lax.scan), so the
    number reflects engine throughput instead of per-step dispatch latency
    (which dominates the python step() loop on a relayed TPU)."""
    from pymgrid_tpu import Microgrid
    from pymgrid_tpu.envs import DiscreteMicrogridEnv
    from pymgrid_tpu.parallel.batched_env import BatchedDiscreteEnv

    import jax.numpy as jnp

    env = DiscreteMicrogridEnv.from_scenario(0)
    batched = BatchedDiscreteEnv(env, batch_size=batch_size, dtype=dtype)
    rng = np.random.RandomState(seed)
    action_seq = jnp.asarray(
        rng.randint(batched.n_actions, size=(n_steps, batch_size)), jnp.int32
    )

    def fetch_probe(outs):
        # tiny on-device reduction; fetching it forces completion of the
        # whole program without pulling the episode buffers through the
        # relay tunnel (a (T,B) reward fetch alone costs ~1s at tunnel
        # bandwidth and would swamp the engine time being measured)
        import jax.numpy as _jnp

        return np.asarray(_jnp.sum(outs.reward[-1, :8]))

    states = batched.reset(seed=seed)
    _, outs = batched.rollout(states, action_seq, shared_step=True)  # compile
    fetch_probe(outs)

    t0 = time.perf_counter()
    _, outs = batched.rollout(states, action_seq, shared_step=True)
    fetch_probe(outs)
    wall = time.perf_counter() - t0
    return batch_size * n_steps / wall


def bench_continuous_env_step(batch_size=65536, n_steps=100, dtype=np.float32,
                              seed=0):
    """Continuous RL path: BatchedContinuousEnv.step with obs returned."""
    from pymgrid_tpu.envs import ContinuousMicrogridEnv
    from pymgrid_tpu.parallel.batched_env import BatchedContinuousEnv

    import jax.numpy as jnp

    env = ContinuousMicrogridEnv.from_scenario(1)  # genset + weak grid
    batched = BatchedContinuousEnv(env, batch_size=batch_size, dtype=dtype)
    rng = np.random.RandomState(seed)
    action_seq = jnp.asarray(
        rng.rand(n_steps, batch_size, batched.action_dim).astype(dtype)
    )

    states = batched.reset(seed=seed)
    states, out = batched.step(states, action_seq[0])  # compile
    np.asarray(out.obs)

    t0 = time.perf_counter()
    for k in range(n_steps):
        states, out = batched.step(states, action_seq[k])
    np.asarray(out.obs[:2])  # force completion; avoid a 38MB tunnel fetch
    wall = time.perf_counter() - t0
    return batch_size * n_steps / wall


def bench_pallas_rollout(batch_size=131072, n_steps=2000, seed=0):
    """Pallas fused-rollout kernel vs the XLA engine on the SAME workload.

    Workload: an init-charge sweep of the scenario-0 (grid-only) family —
    every replica starts from a different battery charge, so trajectories
    are genuinely distinct per replica (no XLA replica dedup possible) and
    each is a full marginal-cost-RBC rollout.  Returns
    (pallas_steps_per_sec, engine_steps_per_sec).
    """
    import jax
    import jax.numpy as jnp

    from pymgrid_tpu import Microgrid
    from pymgrid_tpu.core.engine import make_reset_fn
    from pymgrid_tpu.core.rollout import make_marginal_cost_policy, make_rollout_fn
    from pymgrid_tpu.core.spec import extract_spec
    from pymgrid_tpu.ops.pallas_rollout import make_pallas_rbc_rollout

    mg = Microgrid.from_scenario(0)
    spec, params, _ = extract_spec(mg, dtype=np.float32)
    pb = params["battery"]
    init = np.linspace(
        float(pb["min_capacity"][0]), float(pb["max_capacity"][0]),
        batch_size, dtype=np.float32,
    )

    interpret = jax.default_backend() == "cpu"
    pallas_fn = make_pallas_rbc_rollout(spec, params, n_steps,
                                        interpret=interpret)
    init_j = jnp.asarray(init)
    np.asarray(pallas_fn(init_j))  # compile
    t0 = time.perf_counter()
    np.asarray(pallas_fn(init_j)[:8])
    pallas_rate = batch_size * n_steps / (time.perf_counter() - t0)

    # identical workload through the XLA engine: the general lockstep-sweep
    # path (scalar shared step in the scan carry, rewards accumulated, no
    # episode buffers — core/rollout.py make_lockstep_sweep_fn; bitwise
    # equal to vmap(make_rollout_fn) per step, tests/test_engine_equivalence)
    from pymgrid_tpu.core.rollout import lockstep_states, make_lockstep_sweep_fn

    jparams = jax.tree.map(jnp.asarray, params)
    reset_fn = make_reset_fn(spec)
    keys = jax.random.split(jax.random.PRNGKey(seed), batch_size)
    states = jax.jit(jax.vmap(reset_fn, in_axes=(None, 0)))(jparams, keys)
    states = {**states, "battery_charge": init_j[:, None]}
    policy = make_marginal_cost_policy(spec)
    sweep = make_lockstep_sweep_fn(spec, policy, n_steps)
    ls = lockstep_states(spec, jparams, states)
    _, acc = sweep(jparams, ls)
    np.asarray(acc[:8])  # compile + run
    t0 = time.perf_counter()
    _, acc = sweep(jparams, ls)
    np.asarray(acc[:8])
    engine_rate = batch_size * n_steps / (time.perf_counter() - t0)
    return pallas_rate, engine_rate


def bench_collect_rollout(replicas=1024, n_steps=100, n_configs=25,
                          dtype=np.float32):
    """Log-materializing rollout: the full time-major StepOutput pytree
    (obs/reward/shaped_reward/done/log rows/balance scalars) written to HBM
    every step, as a data-collection run would.  The episode buffer is one
    packed 384-lane row per env-step (suite.py collect mode), so 25
    configs x 1024 replicas x 100 steps ~ 3.9 GB of HBM — big enough that
    per-step op latency amortizes (r4 ran 6400 envs and was latency-bound
    at 1.9 ms/step), small enough to fit comfortably."""
    from pymgrid_tpu import Microgrid
    from pymgrid_tpu.core.rollout import make_marginal_cost_policy
    from pymgrid_tpu.parallel.suite import SuiteRunner

    microgrids = [Microgrid.from_scenario(n) for n in range(n_configs)]
    runner = SuiteRunner(microgrids, batch_per_config=replicas, dtype=dtype)
    policy = make_marginal_cost_policy(runner.spec)
    fn = runner.rollout_fn(
        policy, n_steps, auto_reset=True, collect=True,
        randomize_initial_step=True,
    )
    keys = runner.make_keys(seed=0)

    def fetch_probe(outs):
        import jax.numpy as _jnp

        return np.asarray(_jnp.sum(outs.reward[..., -1]))

    _, outs = fn(runner.params, keys)
    assert outs.obs.shape[-2] == n_steps and outs.log_row.ndim == 4
    fetch_probe(outs)  # compile + execute; avoid a 13MB tunnel fetch

    t0 = time.perf_counter()
    _, outs = fn(runner.params, keys)
    fetch_probe(outs)
    wall = time.perf_counter() - t0
    return n_configs * replicas * n_steps / wall


def main():
    import jax

    n_configs = int(os.environ.get("PYMGRID_BENCH_CONFIGS", 25))
    replicas = int(os.environ.get("PYMGRID_BENCH_REPLICAS", 20480))
    n_steps = int(os.environ.get("PYMGRID_BENCH_STEPS", 1000))
    repeats = int(os.environ.get("PYMGRID_BENCH_REPEATS", 3))

    _mark("initializing backend (first TPU contact ~70s through the relay)")
    backend = jax.default_backend()
    n_chips = len(jax.devices())
    _mark(f"backend={backend} devices={n_chips}")

    rollout, params, keys = build_suite_rollout(n_configs, replicas, n_steps)
    _mark("suite built; compiling + warmup run")

    # compile + warmup (np.asarray forces execution AND the host fetch —
    # block_until_ready alone under-reports on relayed backends)
    np.asarray(rollout(params, keys))
    _mark("warmup done; timing")

    best = float("inf")
    for r in range(repeats):
        t0 = time.perf_counter()
        np.asarray(rollout(params, keys))
        best = min(best, time.perf_counter() - t0)
        _mark(f"repeat {r}: {time.perf_counter() - t0:.2f}s")

    total_envs = n_configs * replicas
    steps_per_sec = total_envs * n_steps / best

    result = {
        "metric": "batched_env_steps_per_sec_per_chip_pymgrid25_suite",
        "value": round(steps_per_sec, 1),
        "unit": "env_steps/s/chip",
        "vs_baseline": round(steps_per_sec / 1e6, 3),
        "n_configs": n_configs,
        "replicas_per_config": replicas,
        "total_envs": total_envs,
        "n_steps": n_steps,
        "backend": backend,
        "n_chips_visible": n_chips,
        "wall_s": round(best, 4),
    }

    result["note"] = (
        "replicas start at randomized steps (honest per-replica work); "
        "r01-r03 suite numbers measured XLA-deduplicated identical replicas "
        "and are not comparable.  Auto-resets are sequential-wrap "
        "((t+1) mod max_start; parallel/suite.py block-prefetch — bitwise-"
        "tested vs the per-step path): per-replica time rows then come as "
        "one contiguous (8, W) slice per 8 steps instead of 8 tile-"
        "amplified row gathers, which bounded the rollout at ~50M.  The "
        "remaining cost is the block-row buffer's HBM round trips; "
        "engine_sweep_steps_per_sec shows the shared-time compute ceiling "
        "on the same dispatch math"
    )

    if not int(os.environ.get("PYMGRID_BENCH_SKIP_EXTRAS", 0)):
        _mark("extras: BatchedDiscreteEnv RL path")
        result["rl_env_steps_per_sec"] = round(
            bench_rl_env_step(
                batch_size=int(os.environ.get("PYMGRID_BENCH_RL_BATCH", 65536)),
                n_steps=int(os.environ.get("PYMGRID_BENCH_RL_LOOP_STEPS", 100)),
            ),
            1,
        )
        _mark("extras: fused BatchedDiscreteEnv rollout")
        result["rl_fused_steps_per_sec"] = round(
            bench_rl_fused_rollout(
                batch_size=int(os.environ.get("PYMGRID_BENCH_RL_BATCH", 65536)),
                n_steps=int(os.environ.get("PYMGRID_BENCH_RL_STEPS", 100)),
            ),
            1,
        )
        _mark("extras: BatchedContinuousEnv path")
        result["continuous_env_steps_per_sec"] = round(
            bench_continuous_env_step(
                batch_size=int(os.environ.get("PYMGRID_BENCH_RL_BATCH", 65536)),
                n_steps=int(os.environ.get("PYMGRID_BENCH_RL_LOOP_STEPS", 100)),
            ),
            1,
        )
        result["loop_numbers_note"] = (
            "rl_env_steps_per_sec and continuous_env_steps_per_sec time "
            "python step() loops: per-call relay dispatch latency, not "
            "engine throughput (rl_fused_steps_per_sec is the engine figure)"
        )
        _mark("extras: pallas kernel vs engine (init-charge sweep)")
        pallas_rate, engine_rate = bench_pallas_rollout(
            batch_size=int(os.environ.get("PYMGRID_BENCH_PALLAS_BATCH", 131072)),
            n_steps=int(os.environ.get("PYMGRID_BENCH_PALLAS_STEPS", 2000)),
        )
        result["pallas_steps_per_sec"] = round(pallas_rate, 1)
        result["engine_sweep_steps_per_sec"] = round(engine_rate, 1)
        _mark("extras: collect rollout")
        result["collect_steps_per_sec"] = round(
            bench_collect_rollout(
                replicas=int(os.environ.get("PYMGRID_BENCH_COLLECT_REPLICAS", 1024)),
                n_steps=int(os.environ.get("PYMGRID_BENCH_COLLECT_STEPS", 100)),
                n_configs=int(os.environ.get("PYMGRID_BENCH_COLLECT_CONFIGS", n_configs)),
            ),
            1,
        )

    print(json.dumps(result))


if __name__ == "__main__":
    main()
