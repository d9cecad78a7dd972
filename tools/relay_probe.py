#!/usr/bin/env python
"""Bisect the TPU-relay worker-kill boundary (VERDICT r4 item 7).

One probe per process invocation (a worker crash wedges the relay ~3 min,
so the orchestration lives OUTSIDE this script: run, read the JSON line,
sleep if it died, run the next probe).

Modes:
  f64    --steps N   one jitted f64 engine scan of N steps (r3 folklore:
                     kernel fault for N > 1000)
  f32dur --steps N --batch B   one f32 engine-scan execution sized to a
                     target duration (r3 folklore: the relay kills device
                     executions beyond ~2 minutes)

Prints exactly one JSON line: {"mode", "steps", "batch", "ok", "wall_s"}.
A worker kill surfaces as a raised exception (reported with ok=false) or
a process death (the orchestrator treats a missing JSON line as a kill).
"""
import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def mpc_probe(args):
    """Solver-in-the-loop scan (the r3 crash workload class): SuiteMPC on
    scenario 0, one chunked year segment per device execution.  The relay
    guard is bypassed on purpose — this script exists to measure the
    boundary the guard encodes."""
    import numpy as np

    from pymgrid_tpu.utils import relay_guard

    relay_guard.check_relay_scan = lambda *a, **k: None  # probing the edge

    from pymgrid_tpu import Microgrid
    from pymgrid_tpu.algos.mpc_suite import SuiteMPC

    dtype = np.float64 if args.mode == "f64mpc" else np.float32
    if dtype == np.float64:
        import jax

        jax.config.update("jax_enable_x64", True)

    mg = Microgrid.from_scenario(0)
    suite = SuiteMPC([mg], dtype=dtype, enum_bits=0)
    result = {"mode": args.mode, "steps": args.steps,
              "chunk": args.chunk or args.steps}
    try:
        t0 = time.time()
        rewards, _ = suite.run_scanned(
            args.steps, chunk=args.chunk or args.steps
        )
        result.update(ok=True, wall_s=round(time.time() - t0, 2),
                      cost=float(-rewards.sum()))
    except Exception as exc:
        result.update(ok=False, error=repr(exc)[:300])
    print(json.dumps(result), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["f64", "f32dur", "f64mpc", "f32mpc"],
                   required=True)
    p.add_argument("--steps", type=int, required=True)
    p.add_argument("--batch", type=int, default=131072)
    p.add_argument("--chunk", type=int, default=None)
    args = p.parse_args()

    if args.mode in ("f64mpc", "f32mpc"):
        return mpc_probe(args)

    import numpy as np

    import jax
    import jax.numpy as jnp

    from pymgrid_tpu import Microgrid
    from pymgrid_tpu.core.engine import make_reset_fn
    from pymgrid_tpu.core.rollout import (
        make_marginal_cost_policy,
        make_rollout_fn,
    )
    from pymgrid_tpu.core.spec import extract_spec

    dtype = np.float64 if args.mode == "f64" else np.float32
    if args.mode == "f64":
        jax.config.update("jax_enable_x64", True)

    mg = Microgrid.from_scenario(0)
    spec, params, _ = extract_spec(mg, dtype=dtype)
    jparams = jax.tree.map(jnp.asarray, params)
    reset_fn = make_reset_fn(spec)
    B = args.batch if args.mode == "f32dur" else 1024
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states = jax.jit(jax.vmap(reset_fn, in_axes=(None, 0)))(jparams, keys)
    policy = make_marginal_cost_policy(spec)
    # the r3 crash workloads were per-replica-step scans (chip table runs),
    # so probe the same structure: vmapped rollout, scan inside
    fn = make_rollout_fn(spec, policy, args.steps, auto_reset=True,
                         collect=False)
    vfn = jax.jit(jax.vmap(fn, in_axes=(None, 0)))

    result = {"mode": args.mode, "steps": args.steps, "batch": B}
    try:
        t0 = time.time()
        out = vfn(jparams, states)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        compile_wall = time.time() - t0
        t0 = time.time()
        out = vfn(jparams, states)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        result.update(ok=True, wall_s=round(time.time() - t0, 2),
                      compile_s=round(compile_wall, 2))
    except Exception as exc:  # worker kill / kernel fault
        result.update(ok=False, error=repr(exc)[:300])
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
