"""Regenerate the README/PARITY suite table from the canonical artifacts.

Reads suite_results.json (seed 42) and suite_results_seed7.json and
prints a markdown table, so every README number traces to one current
artifact (VERDICT r3 item 7). Pure-host JSON analysis.
"""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load(name):
    path = os.path.join(REPO, name)
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        rows = json.load(f)
    return {r["target"]: r for r in rows}


def main():
    s42 = load("suite_results.json")
    s7 = load("suite_results_seed7.json")
    print("| Target | dim | ESS L2HMC | best HMC (eps) | best-vs-best "
          "| at ref eps | accept | s7 best-vs-best |")
    print("|---|---|---|---|---|---|---|---|")
    for t, r in s42.items():
        r7 = s7.get(t, {})
        print(
            f"| {t} | {r['dim']} | {r['ess_l2hmc']:.3g} "
            f"| {r['ess_hmc']:.3g} ({r['hmc_best_eps']}) "
            f"| **{r['ess_ratio']:.3g}x** "
            f"| {r['ess_ratio_at_config_eps']:.3g}x "
            f"| {r['final_accept']:.2f} "
            f"| {r7.get('ess_ratio', float('nan')):.3g}x |"
        )


if __name__ == "__main__":
    main()
