"""Honest best-vs-best framing for phi^4 64x64 (round 3).

Reads the learned-sampler campaign (phi4_64_r3.json) and the tuned-HMC
grid (phi4_64_hmc_grid.json) and prints the three scorings that PARITY.md
reports:

  1. raw best-vs-best    — best learned ESS_m vs best grid cell, ignoring
                           cost per MH step (favors long-T HMC);
  2. per-leapfrog        — ESS_m / T, the equal-compute ratio (each MH
                           step costs T leapfrogs; the learned sampler
                           additionally pays ~4 net applies + 2 energy
                           grads per leapfrog, so this still flatters
                           neither side perfectly — it is the standard
                           equal-gradient-evaluation MCMC scoring);
  3. matched-(eps, T)    — the campaign's own per-recipe comparison.

Pure-host JSON analysis — runs anywhere, no TPU.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    with open(os.path.join(REPO, "phi4_64_r3.json")) as f:
        runs = json.load(f)
    with open(os.path.join(REPO, "phi4_64_hmc_grid.json")) as f:
        grid = json.load(f)

    # learned-sampler rows: keep entries that carry an eval
    learned = {
        k: {"ess_m": v["ess_m_l2hmc"],
            "tunneling_rate": v.get("tunneling_rate_l2hmc"),
            "leapfrogs": v.get("config", {}).get("leapfrogs", 10),
            "eps": v.get("config", {}).get("eps", 0.03)}
        for k, v in runs.items()
        if isinstance(v, dict) and "ess_m_l2hmc" in v
    }
    if not learned:
        sys.exit("no learned-sampler entries with ess_m in phi4_64_r3.json")

    best_l_name, best_l = max(
        learned.items(), key=lambda kv: kv[1]["ess_m"]
    )
    best_h_name, best_h = max(grid.items(), key=lambda kv: kv[1]["ess_m"])

    def T_of(run, default=10):
        return run.get("leapfrogs", run.get("T", default))

    print(f"learned best : {best_l_name}  ess_m={best_l['ess_m']:.4f} "
          f"T={T_of(best_l)} tunneling={best_l.get('tunneling_rate')}")
    print(f"HMC grid best: {best_h_name}  ess_m={best_h['ess_m']:.4f} "
          f"T={best_h['leapfrogs']} eps={best_h['eps']} "
          f"tunneling={best_h.get('tunneling_rate')}")

    raw = best_l["ess_m"] / best_h["ess_m"]
    print(f"\n1. raw best-vs-best: {raw:.2f}x")

    per_lf_l = best_l["ess_m"] / T_of(best_l)
    # per-leapfrog best may be a different grid cell than the raw best
    best_h_lf_name, best_h_lf = max(
        grid.items(), key=lambda kv: kv[1]["ess_m"] / kv[1]["leapfrogs"]
    )
    per_lf_h = best_h_lf["ess_m"] / best_h_lf["leapfrogs"]
    # and the learned side's per-leapfrog best may differ too
    best_l_lf_name, best_l_lf = max(
        learned.items(), key=lambda kv: kv[1]["ess_m"] / T_of(kv[1])
    )
    per_lf_l_best = best_l_lf["ess_m"] / T_of(best_l_lf)
    print(f"2. per-leapfrog (equal compute): learned best "
          f"{best_l_lf_name} {per_lf_l_best:.2e}/lf vs HMC best "
          f"{best_h_lf_name} {per_lf_h:.2e}/lf -> "
          f"{per_lf_l_best / per_lf_h:.2f}x"
          f"   (raw-best learned row: {per_lf_l:.2e}/lf, "
          f"{per_lf_l / per_lf_h:.2f}x)")

    # matched-(eps, T) per learned recipe, where the grid has the cell
    print("3. matched-(eps, T) rows:")
    for name, run in sorted(learned.items()):
        T = T_of(run)
        eps = run.get("eps", 0.03)
        cell = grid.get(f"eps{eps}_T{T}")
        if cell:
            print(f"   {name}: {run['ess_m']:.4f} vs {cell['ess_m']:.4f} "
                  f"-> {run['ess_m'] / cell['ess_m']:.2f}x")

    # HMC T-saturation curve at each eps (is the grid still rising?)
    print("\nHMC grid (ess_m by eps x T):")
    by_eps: dict = {}
    for v in grid.values():
        by_eps.setdefault(v["eps"], []).append((v["leapfrogs"], v["ess_m"]))
    for eps, cells in sorted(by_eps.items()):
        row = "  ".join(f"T{t}:{e:.3f}" for t, e in sorted(cells))
        print(f"  eps={eps}: {row}")


if __name__ == "__main__":
    main()
