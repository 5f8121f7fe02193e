"""Round-5 mog2 absolute-mixing attack: PT-assisted training (VERDICT r4 #6).

The shipped mog2 recipe (anneal 25 + k4 select) wins 23-109x over tuned HMC
but the trained sampler's ABSOLUTE full-spectrum ESS is 0.0135 — it still
barely hops the 12-sigma mode gap at eval time, and the round-3 seed floor
was 3.7x before k-select. Annealing only shows the sampler mode-crossing
states while the temperature passes overhead early in training; PT training
(ScgConfig.pt_train_rungs, round 5) keeps a replica-exchange ladder alive
for the WHOLE run, so swap moves inject cross-mode states into the T=1
training chain at every step and mode-hop gradients never disappear.

Arms (vs the shipped anneal recipe as control), each scored by the suite's
best-vs-best protocol at 4 outer seeds {42, 7, 13, 21}:

  ctrl       anneal 25 + k4 (shipped recipe, re-measured for drift)
  pt4        PT ladder K=4, tmax 25, k4 select, no anneal
  pt8        deeper ladder K=8, tmax 50 (the 12-sigma gap may need hotter)
  pt4_k1     PT without seed-selection — does PT alone remove the lottery?

Results append crash-safe to mog2_r5.json.

Usage (TPU, run alone): python tools/mog2_r5.py [--quick] [--seeds ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARMS = [
    # all-rungs loss = persistent annealing (the medium CPU probe showed
    # cold-rung-only PT never learns hops: ratio 0.99 — cross-mode STATES
    # don't teach the kernel, tempered PROPOSALS do)
    ("pt4_all", {"init_temperature": 1.0, "pt_train_rungs": 4,
                 "pt_train_tmax": 25.0, "pt_loss_all_rungs": True}),
    ("ctrl", {}),
    ("pt4", {"init_temperature": 1.0, "pt_train_rungs": 4,
             "pt_train_tmax": 25.0}),
    ("pt8_all", {"init_temperature": 1.0, "pt_train_rungs": 8,
                 "pt_train_tmax": 50.0, "pt_loss_all_rungs": True}),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--seeds", type=int, nargs="*", default=[42, 7, 13, 21])
    p.add_argument("--only", type=str, nargs="*", default=None)
    p.add_argument("--out", type=str, default="mog2_r5.json")
    args = p.parse_args()

    from l2hmc_tpu.apps import suite

    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)

    for name, ov in ARMS:
        if args.only and name not in args.only:
            continue
        for seed in args.seeds:
            key = f"{name}_seed{seed}" + ("_quick" if args.quick else "")
            if key in results:
                print(f"skip {key} (done)")
                continue
            kw = dict(ov)
            if args.quick:
                kw.update(n_steps=1500, n_chains=256, eval_steps=500,
                          n_train_seeds=kw.get("n_train_seeds", 2))
            print(f"=== {key}: {kw}", flush=True)
            r = suite.run_target("mog2", seed=seed, **kw)
            keep = {k: r[k] for k in (
                "ess_l2hmc", "ess_hmc", "ess_ratio",
                "ess_ratio_at_config_eps", "final_accept", "train_time_s",
                "hmc_best_eps",
            )}
            keep["overrides"] = ov
            results[key] = keep
            print(json.dumps({key: keep}), flush=True)
            with open(args.out, "w") as f:
                json.dump(results, f, indent=2)
    print("all done ->", args.out)


if __name__ == "__main__":
    main()
