#!/usr/bin/env python
"""Write RESULTS_SAA.md from the incremental sidecar, with anchor columns.

The on-chip SAA table runs scenario-by-scenario and its sidecar
(RESULTS_SAA.partial.json) survives TPU worker crashes; this writer turns
whatever has completed into the published table, adding the two available
independent anchors per scenario:

* the on-chip deterministic-MPC realized cost (RESULTS_CHIP.md) — SAA plans
  with sampled futures incl. Markov-resampled outages, so on weak-grid
  scenarios it can realize far BELOW the deterministic planner (which
  assumes an always-up grid, reference mpc.py:914);
* the host f64 RBC realized cost (RESULTS.md).

Usage: python tools/saa_report.py
"""
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def parse_costs(path, pattern):
    out = {}
    if not path.exists():
        return out
    for line in path.read_text().splitlines():
        m = re.match(pattern, line)
        if m:
            out[int(m.group(1))] = float(m.group(2).replace(",", ""))
    return out


def main():
    sidecar = REPO / "RESULTS_SAA.partial.json"
    data = json.loads(sidecar.read_text())
    cfg = data["config"]
    rows = data["rows"]

    chip_mpc = parse_costs(
        REPO / "RESULTS_CHIP.md", r"\|\s*(\d+)\s*\|\s*([\d,.]+)\s*\|"
    )
    host_rbc = parse_costs(
        REPO / "RESULTS.md", r"\|\s*(\d+)\s*\|\s*([\d,.]+)\s*\|"
    )

    by_scen = {}
    for key, (cost, steps, dt) in rows.items():
        n, preset = key.split(":")
        by_scen.setdefault(int(n), {})[int(preset)] = (cost, steps, dt)
    presets = sorted({p for d in by_scen.values() for p in d})

    lines = [
        "# RESULTS — on-chip stochastic MPC (SAA) full-year costs",
        "",
        f"BatchedSAA (box-IPM solver, iters={cfg['ipm_iters']}, "
        f"newton_refine={cfg['newton_refine']}, enum_bits={cfg['enum_bits']}, "
        f"n_samples={cfg['saa_samples']}, percentile "
        f"{cfg['saa_percentile']}), float32 on the TPU, one chunked "
        "lax.scan per scenario-year.  Sampled futures come from this "
        "package's seeded samplers (Markov-resampled outages included), so "
        "totals are comparable to, not bitwise reproductions of, the "
        "published xlsx (see RESULTS.md provenance notes).",
        "",
        "Anchor columns: the on-chip deterministic-MPC realized cost "
        "(RESULTS_CHIP.md) and the host f64 RBC cost (RESULTS.md).  On "
        "weak-grid scenarios SAA realizes far BELOW deterministic MPC: its "
        "sampled futures include outages, so the planner commits the "
        "genset defensively, while the deterministic formulation plans "
        "against an always-up grid (reference mpc.py:914) and realizes "
        "loss-load during real outages — the same effect the learned RL "
        "policy exploits (RESULTS_TRAINING.md).",
        "",
        "| scenario | " + " | ".join(f"SAA-{p} cost" for p in presets)
        + " | chip det-MPC | host RBC | s/run |",
        "|---|" + "---|" * (len(presets) + 3),
    ]
    totals = {p: 0.0 for p in presets}
    for n in sorted(by_scen):
        d = by_scen[n]
        costs = " | ".join(
            f"{d[p][0]:,.2f}" if p in d else "—" for p in presets
        )
        for p in presets:
            if p in d:
                totals[p] += d[p][0]
        mpc = f"{chip_mpc[n]:,.2f}" if n in chip_mpc else "—"
        rbc = f"{host_rbc[n]:,.2f}" if n in host_rbc else "—"
        dt = max(d[p][2] for p in d)
        lines.append(f"| {n} | {costs} | {mpc} | {rbc} | {dt:.1f} |")
    lines.append(
        "| **total (rows above)** | "
        + " | ".join(f"**{totals[p]:,.2f}**" for p in presets)
        + " | | | |"
    )
    missing = sorted(set(range(25)) - set(by_scen))
    if missing:
        lines += [
            "",
            f"Scenarios not yet captured (TPU time boundary; resume with "
            f"`tools/run_benchmarks.py --saa --resume`): {missing}.",
        ]
    out = REPO / "RESULTS_SAA.md"
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out} ({len(by_scen)} scenarios)")


if __name__ == "__main__":
    main()
