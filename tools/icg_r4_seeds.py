"""Round-4 ICG winner multi-seed follow-up (self-driving).

Reads icg_r4.json, picks the best round-4 arm at the anchor seed, and —
if it clears the evidence threshold — re-runs exactly that arm at the
remaining outer seeds, so the multi-seed evidence always tracks the
measured winner without a human in the loop (same pattern as
tools/icg_r3_seeds.py; the TPU tunnel comes and goes, the queue must be
self-driving).

Usage (TPU, run alone, after tools/icg_r4.py): python tools/icg_r4_seeds.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, default="icg_r4.json")
    p.add_argument("--anchor_seed", type=int, default=42)
    p.add_argument("--seeds", type=int, nargs="*", default=[7, 13, 21])
    p.add_argument("--min_ratio", type=float, default=15.0,
                   help="only chase seeds for a winner at least this good")
    p.add_argument("--top", type=int, default=1,
                   help="follow up on the best N arms")
    args = p.parse_args()

    if not os.path.exists(args.out):
        print(f"no {args.out} yet — run tools/icg_r4.py first")
        return
    with open(args.out) as f:
        results = json.load(f)

    from l2hmc_tpu.apps import suite
    from tools.icg_r4 import EXPERIMENTS

    overrides = dict(EXPERIMENTS)
    ranked = sorted(
        (
            (results[f"{n}_seed{args.anchor_seed}"]["ess_ratio"], n)
            for n in overrides
            if f"{n}_seed{args.anchor_seed}" in results
        ),
        reverse=True,
    )
    if not ranked:
        print("no round-4 arm measured at the anchor seed yet")
        return
    for ratio, name in ranked[: args.top]:
        if ratio < args.min_ratio:
            print(f"{name} ({ratio:.2f}x) below --min_ratio "
                  f"{args.min_ratio} — skipping seed follow-up")
            continue
        print(f"winner: {name} ({ratio:.2f}x at seed {args.anchor_seed})")
        for seed in args.seeds:
            key = f"{name}_seed{seed}"
            if key in results:
                print(f"skip {key} (done: {results[key]['ess_ratio']:.2f}x)")
                continue
            print(f"=== {key}: {overrides[name]}", flush=True)
            r = suite.run_target("icg", seed=seed, **overrides[name])
            keep = {k: r[k] for k in (
                "ess_l2hmc", "ess_hmc", "ess_ratio",
                "ess_ratio_at_config_eps", "final_accept", "train_time_s",
                "hmc_best_eps",
            )}
            keep["overrides"] = overrides[name]
            results[key] = keep
            print(json.dumps({key: keep}), flush=True)
            with open(args.out, "w") as f:
                json.dump(results, f, indent=2)
    print("all done ->", args.out)


if __name__ == "__main__":
    main()
