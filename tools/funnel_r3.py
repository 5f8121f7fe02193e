"""Round-3 funnel recipe experiments (VERDICT r2 weak #5).

The suite funnel recipe (eps 0.05, hidden 20, grad_clip 5) trains to
acceptance 0.12 and wins only 3.3x best-vs-best — barely alive, at the
opposite end of the acceptance band from the ICG's 0.996. The ICG wave
showed the acceptance-targeted penalty (ScgConfig.accept_penalty, target
0.65) is a strong corrective from the too-timid side; here it pulls from
the too-bold side. Multi-seed selection (n_train_seeds) composes.

Each experiment reuses the suite's full protocol (train + best-vs-best
HMC grid scoring); results append to funnel_r3.json (crash-safe).

Usage (TPU, run alone): python tools/funnel_r3.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Ordered by a reduced-scale CPU pre-ranking (256 chains, 1500 steps,
# seed 42 — /tmp/funnel_cpu_probe.json, r3 session 4): pen20 4.15x,
# pen20_k4 3.95x, pen5 3.48x, baseline 2.28x, pen5_eps003 0.62x
# (small eps is a clear negative despite doubling acceptance. The
# penalty improves ESS ~2x while barely moving mean acceptance — it
# regularizes the too-bold tail rather than shifting the mean).
# Likely winners first so a time-boxed TPU window still scores them.
EXPERIMENTS = [
    ("accept_pen20", {"accept_penalty": 20.0}),
    ("pen20_k4", {"accept_penalty": 20.0, "n_train_seeds": 4}),
    ("baseline_r2", {}),
    ("accept_pen50", {"accept_penalty": 50.0}),  # penalty saturation check
    ("accept_pen5", {"accept_penalty": 5.0}),
    ("pen5_k4", {"accept_penalty": 5.0, "n_train_seeds": 4}),
    # smaller step with the penalty: let the trained eps find the neck
    # (CPU pre-rank: strong negative — kept for the measured record)
    ("pen5_eps003", {"accept_penalty": 5.0, "eps": 0.03, "hmc_eps": 0.03}),
    # round 4: per-dimension mixed ESJD (mcmc.loss_mixed_per_dim) — the
    # funnel's slow direction is the single x0 dim (variance 9 vs the
    # state-dependent z dims); the summed loss lets it hide. Unwhitened
    # units on purpose (the funnel has no fixed covariance).
    ("pen20_perdim", {"accept_penalty": 20.0, "per_dim_loss": True}),
    ("pen20_perdim_k4", {"accept_penalty": 20.0, "per_dim_loss": True,
                         "n_train_seeds": 4}),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--only", type=str, nargs="*", default=None)
    p.add_argument("--out", type=str, default="funnel_r3.json")
    args = p.parse_args()

    from l2hmc_tpu.apps import suite

    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)

    for name, ov in EXPERIMENTS:
        if args.only and name not in args.only:
            continue
        key = f"{name}_seed{args.seed}"
        if key in results:
            print(f"skip {key} (done: {results[key]['ess_ratio']:.2f}x)")
            continue
        kw = dict(ov)
        if args.quick:
            kw.update(n_steps=50, n_chains=64, eval_steps=60)
        print(f"=== {key}: {kw}", flush=True)
        r = suite.run_target("funnel", seed=args.seed, **kw)
        keep = {k: r[k] for k in (
            "ess_l2hmc", "ess_hmc", "ess_ratio", "ess_ratio_at_config_eps",
            "final_accept", "train_time_s", "hmc_best_eps",
        )}
        keep["overrides"] = ov
        results[key] = keep
        print(json.dumps({key: keep}), flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    print("all done ->", args.out)


if __name__ == "__main__":
    main()
