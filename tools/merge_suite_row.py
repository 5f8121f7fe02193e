"""Merge a single-target suite artifact into a canonical suite artifact.

Used when a recipe refresh re-runs one target (e.g. the round-5 funnel
netfn recipe via ``apps/suite.py --targets funnel``) and the resulting
row must replace that target's row in the canonical three-seed
artifacts (suite_results.json / suite_results_seed7.json /
suite_results_seed13.json) that `tools/readme_suite_table.py` reads.
Pure-host JSON surgery; side artifacts are kept for provenance.

Usage:
    python tools/merge_suite_row.py suite_funnel_r5_seed42.json suite_results.json
"""

from __future__ import annotations

import json
import sys


def main():
    src, dst = sys.argv[1], sys.argv[2]
    with open(src) as f:
        rows = json.load(f)
    with open(dst) as f:
        canon = json.load(f)
    for row in rows:
        target = row["target"]
        idx = [i for i, r in enumerate(canon) if r["target"] == target]
        if idx:
            canon[idx[0]] = row
            print(f"{dst}: replaced {target} row "
                  f"(ess_ratio {row['ess_ratio']:.3g}x)")
        else:
            canon.append(row)
            print(f"{dst}: appended {target} row")
    with open(dst, "w") as f:
        json.dump(canon, f, indent=1)


if __name__ == "__main__":
    main()
