"""Regenerate the README/PARITY suite table from the canonical artifacts.

Reads suite_results.json (seed 42), suite_results_seed7.json and
suite_results_seed13.json and prints a markdown table with a
min-over-seeds column (VERDICT r4 #2), so every README number traces to
one current artifact. Pure-host JSON analysis.
"""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SEED_FILES = [
    ("42", "suite_results.json"),
    ("7", "suite_results_seed7.json"),
    ("13", "suite_results_seed13.json"),
]


def load(name):
    path = os.path.join(REPO, name)
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        rows = json.load(f)
    return {r["target"]: r for r in rows}


def main():
    per_seed = [(s, load(f)) for s, f in SEED_FILES]
    s42 = per_seed[0][1]
    header_seeds = " | ".join(f"s{s}" for s, _ in per_seed[1:])
    print("| Target | dim | ESS L2HMC | best HMC (eps) | best-vs-best "
          f"| at ref eps | accept | {header_seeds} | min/seeds |")
    n_cols = 8 + len(per_seed) - 1  # fixed columns + extra seeds + min
    print("|" + "---|" * n_cols)
    for t, r in s42.items():
        ratios = [r["ess_ratio"]] + [
            d[t]["ess_ratio"] for _, d in per_seed[1:] if t in d
        ]
        others = " | ".join(
            f"{d[t]['ess_ratio']:.3g}x" if t in d else "—"
            for _, d in per_seed[1:]
        )
        print(
            f"| {t} | {r['dim']} | {r['ess_l2hmc']:.3g} "
            f"| {r['ess_hmc']:.3g} ({r['hmc_best_eps']}) "
            f"| **{r['ess_ratio']:.3g}x** "
            f"| {r['ess_ratio_at_config_eps']:.3g}x "
            f"| {r['final_accept']:.2f} "
            f"| {others} "
            f"| {min(ratios):.3g}x |"
        )


if __name__ == "__main__":
    main()
