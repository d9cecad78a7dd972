#!/usr/bin/env python
"""Full-year control benchmarks over the pymgrid25 suite -> RESULTS.md.

Runs rule-based control (compiled engine, f64) and optionally MPC (HiGHS)
over all 8759 steps of each scenario and records total annual costs.

Usage: python tools/run_benchmarks.py [--mpc] [--scenarios 0,1,2]
"""
import argparse
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

os.environ.setdefault("JAX_ENABLE_X64", "1")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--mpc", action="store_true", help="also run MPC (slow)")
    parser.add_argument("--tight-mpc", action="store_true",
                        help="use tight battery bounds in the MPC model")
    parser.add_argument("--scenarios", default=None)
    parser.add_argument("--out", default=REPO / "RESULTS.md", type=Path)
    parser.add_argument("--saa", action="store_true",
                        help="run on-chip BatchedSAA over ALL 25 scenarios "
                             "(genset MILPs via on-chip enumeration) for the "
                             "three published forecast-accuracy presets -> "
                             "RESULTS_SAA.md (uses the TPU when available)")
    parser.add_argument("--saa-samples", type=int, default=10)
    parser.add_argument("--saa-percentile", type=float, default=0.5)
    parser.add_argument("--saa-presets", default="85,70,50")
    parser.add_argument("--enum-bits", type=int, default=3,
                        help="genset MILP enumeration bits for on-chip runs")
    parser.add_argument("--mpc-chip", action="store_true",
                        help="regenerate the full-year MPC table ON CHIP "
                             "(BatchedMPC, one lax.scan per scenario) -> "
                             "RESULTS_CHIP.md")
    args = parser.parse_args()

    import jax

    if args.saa:
        return run_saa(args)
    if args.mpc_chip:
        return run_mpc_chip(args)

    # run on CPU: full-year f64 scans are fast there and this avoids
    # contending for the (single, tunneled) TPU with other work
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from pymgrid_tpu import Microgrid
    from pymgrid_tpu.algos import RuleBasedControl, ModelPredictiveControl

    scenarios = (
        [int(s) for s in args.scenarios.split(",")]
        if args.scenarios
        else list(range(25))
    )

    rows = []
    for n in scenarios:
        mg = Microgrid.from_scenario(n)
        t0 = time.time()
        log = RuleBasedControl(mg).run_compiled()
        rbc_cost = -log[("balance", 0, "reward")].sum()
        rbc_time = time.time() - t0

        mpc_cost, mpc_time = None, None
        if args.mpc:
            mg2 = Microgrid.from_scenario(n)
            t0 = time.time()
            mpc_log = ModelPredictiveControl(
                mg2, tight_battery_bounds=args.tight_mpc
            ).run()
            mpc_cost = -mpc_log[("balance", 0, "reward")].sum()
            mpc_time = time.time() - t0

        rows.append((n, rbc_cost, rbc_time, mpc_cost, mpc_time))
        msg = f"scenario {n}: RBC {rbc_cost:,.2f} ({rbc_time:.1f}s)"
        if mpc_cost is not None:
            msg += f"  MPC {mpc_cost:,.2f} ({mpc_time:.1f}s)"
        print(msg, flush=True)

    lines = [
        "# RESULTS — pymgrid25 full-year control benchmarks",
        "",
        "Total annual operating cost (= negative cumulative balance reward) over",
        "8759 hourly steps per scenario.  RBC runs on the compiled engine in",
        "float64 (bitwise-equal to the host/reference simulation, see",
        "tests/test_envs_algos.py); MPC uses perfect (oracle) forecasts with",
        f"horizon 24, solved by HiGHS"
        + (", with tight (simulator-true) battery bounds" if args.tight_mpc else
           " (reference-faithful battery bounds; see --tight-mpc)")
        + ".",
        "",
        "Note: the published `pymgrid 25 - benchmarks.xlsx` totals were produced",
        "by the *legacy nonmodular* pipeline and differ from the reference's own",
        "modular implementation; our correctness gate is exact parity with the",
        "reference modular implementation (verified: ALL 25 scenarios' full-year",
        "RBC reward streams match recorded reference runs bit-for-bit —",
        "tests/test_golden_year.py).",
        "",
        "| scenario | RBC cost | RBC s | MPC cost | MPC s |",
        "|---|---|---|---|---|",
    ]
    for n, rbc_cost, rbc_time, mpc_cost, mpc_time in rows:
        mpc_str = f"{mpc_cost:,.2f}" if mpc_cost is not None else "—"
        mpc_t = f"{mpc_time:.1f}" if mpc_time is not None else "—"
        lines.append(f"| {n} | {rbc_cost:,.2f} | {rbc_time:.1f} | {mpc_str} | {mpc_t} |")

    total_rbc = sum(r[1] for r in rows)
    lines.append(f"| **total** | **{total_rbc:,.2f}** | | " + (
        f"**{sum(r[3] for r in rows):,.2f}** | |" if args.mpc and all(r[3] is not None for r in rows) else "| |"
    ))
    args.out.write_text("\n".join(lines) + "\n")
    print(f"wrote {args.out}")


def run_saa(args):
    """Full-year on-chip stochastic MPC, all 25 scenarios, three presets.

    Mirrors the published benchmark protocol (BASELINE.md rows 3-5): the
    SAA-85/70/50 labels are *forecast accuracy presets* (``preset_to_use``;
    reference ``Benchmarks.run_saa_benchmark``), optimal percentile 0.5.
    Genset scenarios solve every sample's horizon MILP on chip.
    """
    import warnings

    import numpy as np

    warnings.filterwarnings("ignore")

    from pymgrid_tpu import Microgrid
    from pymgrid_tpu.algos import BatchedSAA

    scenarios = (
        [int(s) for s in args.scenarios.split(",")]
        if args.scenarios
        else list(range(25))
    )
    presets = [int(p) for p in args.saa_presets.split(",")]
    pct = args.saa_percentile

    rows = {n: {} for n in scenarios}
    for preset in presets:
        for n in scenarios:
            np.random.seed(1000 + n)  # sampler RNG, reproducible per scenario
            mg = Microgrid.from_scenario(n)
            t0 = time.time()
            saa = BatchedSAA(mg, n_samples=args.saa_samples,
                             optimal_percentile=pct,
                             preset_to_use=preset, dtype=np.float32,
                             enum_bits=args.enum_bits)
            rewards, _ = saa.run_scanned()
            cost, dt = float(-rewards.sum()), time.time() - t0
            rows[n][preset] = (cost, len(rewards), dt)
            print(f"scenario {n}: SAA-{preset} {cost:,.2f} "
                  f"({len(rewards)} steps, {dt:.1f}s)", flush=True)

    out = args.out if str(args.out).endswith("_SAA.md") or "SAA" in str(args.out) else REPO / "RESULTS_SAA.md"
    lines = [
        "# RESULTS — on-chip stochastic MPC (SAA) full-year costs",
        "",
        f"BatchedSAA over all 25 pymgrid25 scenarios, n_samples="
        f"{args.saa_samples}, optimal percentile {pct}; SAA-85/70/50 are the",
        "published forecast-accuracy presets (BASELINE.md rows 3-5).  Float32",
        "interior-point solves on the TPU, one lax.scan per scenario-year; a",
        "step's sample LPs (and, on genset scenarios, every sample's MILP",
        "status-pattern enumeration) run as one batched program",
        "(pymgrid_tpu/algos/saa_jax.py).  The reference loops cvxpy solves on",
        "CPU for this benchmark (hours per scenario).",
        "",
        "Note: sampled futures draw from this package's seeded samplers;",
        "totals are comparable to, not bitwise-reproductions of, the xlsx",
        "numbers (which also came from the legacy nonmodular pipeline — see",
        "RESULTS.md).",
        "",
        "| scenario | " + " | ".join(f"SAA-{p} cost" for p in presets) + " | s/run |",
        "|---|" + "---|" * (len(presets) + 1),
    ]
    for n in scenarios:
        costs = " | ".join(f"{rows[n][p][0]:,.2f}" for p in presets)
        dt = max(rows[n][p][2] for p in presets)
        lines.append(f"| {n} | {costs} | {dt:.1f} |")
    totals = " | ".join(
        f"**{sum(rows[n][p][0] for n in scenarios):,.2f}**" for p in presets
    )
    lines.append(f"| **total** | {totals} | |")
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out}")


def run_mpc_chip(args):
    """Regenerate the full-year MPC table on chip (BatchedMPC + lax.scan)."""
    import warnings

    import numpy as np

    warnings.filterwarnings("ignore")

    from pymgrid_tpu import Microgrid
    from pymgrid_tpu.algos.mpc_jax import BatchedMPC

    scenarios = (
        [int(s) for s in args.scenarios.split(",")]
        if args.scenarios
        else list(range(25))
    )

    rows = []
    for n in scenarios:
        mg = Microgrid.from_scenario(n)
        n_steps = int(mg.final_step) - int(mg.initial_step)
        t0 = time.time()
        bm = BatchedMPC(mg, batch_size=1, dtype=np.float32, host_fallback=False,
                        enum_bits=args.enum_bits)
        # chunked: the relay kills device executions beyond ~2 minutes
        # (surfaces as "TPU worker crashed"), so keep each scan segment short
        chunk = 500 if bm.template.has_genset else 4000
        rewards, _ = bm.run_scanned(n_steps, chunk=chunk)
        cost, dt = float(-rewards[:, 0].sum()), time.time() - t0
        rows.append((n, cost, n_steps, dt))
        print(f"scenario {n}: chip-MPC {cost:,.2f} ({n_steps} steps, {dt:.1f}s)",
              flush=True)

    out = REPO / "RESULTS_CHIP.md"
    lines = [
        "# RESULTS — on-chip MPC full-year costs (TPU, float32)",
        "",
        "BatchedMPC: the horizon problem (LP; genset scenarios a MILP via",
        "on-chip LP-relaxation + batched status-pattern enumeration) solves on",
        "the TPU and the first-step control feeds the compiled engine — the",
        "whole year is ONE lax.scan program per scenario.  Compare the",
        "wall-clock to the host HiGHS pipeline's 45-445 s/scenario",
        "(RESULTS.md); f32 totals track the f64 host table to ~1e-3 relative",
        "(f64 parity is gated at 1e-4 in tests/test_lp_mpc.py).",
        "",
        "| scenario | chip MPC cost | steps | s |",
        "|---|---|---|---|",
    ]
    for n, cost, steps, dt in rows:
        lines.append(f"| {n} | {cost:,.2f} | {steps} | {dt:.1f} |")
    lines.append(f"| **total** | **{sum(r[1] for r in rows):,.2f}** | | |")
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
