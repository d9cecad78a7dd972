"""Pallas TPU kernel: fused multi-step microgrid rollout.

A hand-written kernel for the throughput-critical inner loop of every
pymgrid25 family (grid-less configs get a neutral zero-capacity grid
slot): rule-based policy + three-phase dispatch + battery state update,
stepping the *entire horizon* inside one kernel invocation with the
config's time series resident in VMEM.

Layout: the grid is tiled over replicas; each program instance owns a
``(8, 128)`` replica tile whose battery charges live in registers/VMEM for
all ``n_steps``, so per-step HBM traffic is zero — the time series
(~250 KB/config) is loaded once.  Measured on a real chip (``bench.py``
init-charge sweep, genuinely distinct per-replica trajectories): **620M
env-steps/s** (docs/captures/bench_r5_builder.log), full-year cost
matching the f64 reference to 1e-4 (tests/test_pallas_rollout.py,
verified on hardware).  History: in r4 this was 17x the then-general
engine path (31.5M, BENCH_r04.json); the r5 lockstep sweep
(:func:`pymgrid_tpu.core.rollout.make_lockstep_sweep_fn` — shared
simulated time in the scan carry, zero per-step HBM) reaches 1.81B on the
same workload, so the kernel now serves as the hand-written reference
point rather than the fast path.
"""
import functools

import numpy as np

__all__ = ["make_pallas_rbc_rollout", "supported_spec"]

TILE = (8, 128)  # replicas per program instance (f32 VPU tile)


def supported_spec(spec):
    """Covers the load+pv+battery[+genset][+grid]+balancing families —
    every pymgrid25 shape (the genset machine runs branchless per lane;
    grid-less configs get a zero-capacity neutral grid slot whose deploys
    and rewards are exactly 0)."""
    return (
        spec.n_load == 1
        and spec.n_renewable == 1
        and spec.n_battery == 1
        and spec.n_grid <= 1
        and spec.n_genset <= 1
        and spec.n_balancing == 1
        and all(m.custom_fn is None for m in spec.modules)
    )


def make_pallas_rbc_rollout(spec, params, n_steps, interpret=False):
    """Build ``rollout(init_charge (B,)) -> cumulative_reward (B,)``.

    ``B`` must be a multiple of 1024.  Uses the marginal-cost RBC policy
    (static deployment order by marginal cost, as the host RBC orders it;
    genset state machine branchless per lane via
    :func:`pymgrid_tpu.core.physics.genset_update_status`) and accumulates
    the per-step balance reward.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if not supported_spec(spec):
        raise NotImplementedError(
            "pallas rollout supports the single load+pv+battery+grid config"
        )

    f32 = jnp.float32
    load_ts = np.asarray(params["load"]["ts"][0], np.float32)        # (T,1) negative
    pv_ts = np.asarray(params["renewable"]["ts"][0], np.float32)     # (T,1)
    has_grid = spec.n_grid == 1
    if has_grid:
        grid_ts = np.asarray(params["grid"]["ts"][0], np.float32)    # (T,4)
    else:
        # neutral zero-capacity grid slot (parallel/suite.py semantics):
        # zero prices/CO2, always up — caps of 0 make every deploy and
        # reward term exactly +/-0.0
        grid_ts = np.zeros((load_ts.shape[0], 4), np.float32)
        grid_ts[:, 3] = 1.0

    pb = params["battery"]
    min_cap = float(pb["min_capacity"][0])
    max_cap = float(pb["max_capacity"][0])
    max_charge = float(pb["max_charge"][0])
    max_discharge = float(pb["max_discharge"][0])
    eff = float(pb["efficiency"][0])
    cycle = float(pb["battery_cost_cycle"][0])

    if has_grid:
        max_imp = float(params["grid"]["max_import"][0])
        max_exp = float(params["grid"]["max_export"][0])
        cost_co2 = float(params["grid"]["cost_per_unit_co2"][0])
    else:
        max_imp = max_exp = cost_co2 = 0.0

    loss_cost = float(params["balancing"]["loss_load_cost"][0])
    over_cost = float(params["balancing"]["overgeneration_cost"][0])

    has_genset = spec.n_genset == 1
    if has_genset:
        pg = params["genset"]
        g_min = float(pg["running_min_production"][0])
        g_max = float(pg["running_max_production"][0])
        g_cost = float(pg["genset_cost"][0])
        g_co2 = float(pg["co2_per_unit"][0])
        g_cost_co2 = float(pg["cost_per_unit_co2"][0])
        g_start_up = int(pg["start_up_time"][0])
        g_wind_down = int(pg["wind_down_time"][0])
        g_abort = bool(pg["allow_abortion"][0])
        g_init_status = int(pg["init_status"][0])
        # reference dedupe keeps the genset-ON element only when
        # running_min_production == 0 (priority_list.py:40-67)
        g_goal = 1 if g_min == 0 else 0

    t0 = int(params["initial_step"])
    # static marginal-cost deployment order (rbc.py:31-44 semantics)
    costs = []
    if has_genset:
        costs.append(("genset", g_cost + g_cost_co2 * g_co2))
    costs.append(("battery", cycle))
    costs.append(("grid", float(grid_ts[t0, 0])))
    deploy_order = [k for k, _ in sorted(costs, key=lambda kv: kv[1])]

    from pymgrid_tpu.core import physics

    def kernel(load_ref, pv_ref, grid_ref, charge_ref, out_ref):
        def body(t, carry):
            charge, gcur, ggoal, gup, gdown, acc = carry
            load = -load_ref[t, 0]
            pv = pv_ref[t, 0]
            price_imp = grid_ref[t, 0]
            price_exp = grid_ref[t, 1]
            co2k = grid_ref[t, 2]
            status = grid_ref[t, 3]

            # ---- marginal-cost RBC policy (vectorized over the tile) ----
            remaining = jnp.full(TILE, load - pv, f32)
            max_prod_b = jnp.minimum(max_discharge, charge - min_cap) * eff
            max_cons_b = jnp.minimum(max_charge, max_cap - charge) / eff
            max_prod_g = max_imp * status
            max_cons_g = max_exp * status

            def deploy(remaining, max_p, max_c):
                near0 = jnp.abs(remaining) <= 1e-4
                produce = jnp.minimum(remaining, max_p)
                consume = jnp.maximum(remaining, -max_c)
                return jnp.where(
                    near0, 0.0, jnp.where(remaining > 0, produce, consume)
                )

            a_b = a_g = a_gen = jnp.zeros(TILE, f32)
            if has_genset:
                # next-status predictor (policy side, rollout.py semantics)
                nsf = physics.genset_next_status(
                    gcur, gup, gdown, jnp.int32(g_goal), xp=jnp
                ).astype(f32)
            for kind in deploy_order:
                if kind == "battery":
                    a_b = deploy(remaining, max_prod_b, max_cons_b)
                    remaining = remaining - a_b
                elif kind == "grid":
                    a_g = deploy(remaining, max_prod_g, max_cons_g)
                    remaining = remaining - a_g
                else:  # genset: produce-only, within predicted status bounds
                    near0 = jnp.abs(remaining) <= 1e-4
                    produce = jnp.clip(remaining, nsf * g_min, nsf * g_max)
                    a_gen = jnp.where(
                        near0, 0.0, jnp.where(remaining > 0, produce, 0.0)
                    )
                    remaining = remaining - a_gen

            # ---- dispatch ----
            gen_prov = jnp.zeros(TILE, f32)
            r_gen = jnp.zeros(TILE, f32)
            if has_genset:
                gcur, ggoal, gup, gdown = physics.genset_update_status(
                    gcur, ggoal, gup, gdown,
                    jnp.int32(g_goal),
                    jnp.int32(g_start_up), jnp.int32(g_wind_down),
                    g_abort, xp=jnp,
                )
                statusf = gcur.astype(f32)
                gen_prov = physics.clip_source(
                    a_gen, statusf * g_min, statusf * g_max, xp=jnp
                )
                r_gen = -(g_cost * gen_prov + g_cost_co2 * (g_co2 * gen_prov))
            # battery
            b_prov = jnp.maximum(a_b, 0.0)
            b_abs = jnp.maximum(-a_b, 0.0)
            internal = jnp.where(a_b < 0, b_abs * eff, -b_prov / eff)
            new_charge = jnp.maximum(charge + internal, min_cap)
            r_batt = -jnp.abs(internal) * cycle
            # grid
            g_prov = jnp.maximum(a_g, 0.0)
            g_abs = jnp.maximum(-a_g, 0.0)
            r_grid = -(price_imp + cost_co2 * co2k) * g_prov + price_exp * g_abs
            # flex: renewable then balancing
            diff = (gen_prov + b_prov + g_prov) - (load + b_abs + g_abs)
            needed = -diff
            pv_used = jnp.where(diff > 0, 0.0, jnp.minimum(pv, needed))
            resid = needed - pv_used
            r_bal = jnp.where(
                diff > 0, -over_cost * diff, -loss_cost * jnp.maximum(resid, 0.0)
            )

            acc = acc + r_gen + r_batt + r_grid + r_bal
            return new_charge, gcur, ggoal, gup, gdown, acc

        charge0 = charge_ref[0]
        acc0 = jnp.zeros(TILE, f32)
        init_status = jnp.int32(g_init_status if has_genset else 0)
        gcur0 = jnp.full(TILE, init_status, jnp.int32)
        ggoal0 = jnp.full(TILE, init_status, jnp.int32)
        gup0 = jnp.full(
            TILE,
            jnp.where(init_status == 1, 0,
                      jnp.int32(g_start_up if has_genset else 0)),
            jnp.int32,
        )
        gdown0 = jnp.full(
            TILE,
            jnp.where(init_status == 1,
                      jnp.int32(g_wind_down if has_genset else 0), 0),
            jnp.int32,
        )
        charge, _, _, _, _, acc = jax.lax.fori_loop(
            t0, t0 + n_steps, body,
            (charge0, gcur0, ggoal0, gup0, gdown0, acc0),
        )
        out_ref[0] = acc

    def rollout(init_charge):
        B = init_charge.shape[0]
        n_tiles = B // (TILE[0] * TILE[1])
        assert n_tiles * TILE[0] * TILE[1] == B, "B must be a multiple of 1024"
        charges = init_charge.reshape(n_tiles, *TILE).astype(f32)

        out = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(load_ts.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(pv_ts.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(grid_ts.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, *TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, *TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n_tiles, *TILE), f32),
            interpret=interpret,
        )(load_ts, pv_ts, grid_ts, charges)
        return out.reshape(B)

    return jax.jit(rollout)
