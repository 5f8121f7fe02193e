"""Round-5 TPU queue, part 3 — rebalanced after the AB finding.

AB measured accept_penalty 60 as INERT at the 64x64 loss scale (~1.6e5):
acceptance saturates 1.00 regardless. The decisive un-pinning arms are a
loss-scale-matched penalty (AF, pen 1e6) and a bolder step init (AC, eps
0.05). This queue replaces r5_queue2's tail with those first, then the
funnel/mog2/rough/conv waves, ordered so a time cutoff costs the least
valuable stages. All stages are crash-safe re-runnable.

Usage (TPU, run alone, AFTER r5_queue2 is stopped):
    python tools/r5_queue3.py [--skip N] [--only ...]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

STAGES = [
    ("phi4_AC_T96_eps005",
     [sys.executable, "tools/phi4_64_r3.py", "--only", "AC_T96_eps005"],
     7200),
    ("phi4_AF_T96_pen1e6",
     [sys.executable, "tools/phi4_64_r3.py", "--only", "AF_T96_pen1e6"],
     7200),
    ("funnel_r5_seed42",
     [sys.executable, "tools/funnel_r5.py", "--seed", "42"], 10800),
    ("funnel_r5_seed7",
     [sys.executable, "tools/funnel_r5.py", "--seed", "7"], 10800),
    ("mog2_r5",
     [sys.executable, "tools/mog2_r5.py", "--seeds", "42", "7"], 14400),
    ("rough_r5",
     [sys.executable, "tools/rough_r5.py"], 10800),
    ("phi4_conv64_chunked",
     ["bash", "-c",
      "for i in $(seq 1 16); do "
      f"{sys.executable} tools/phi4_conv64_chunked.py --seed 0 || true; "
      "grep -q conv64_chunked_seed0 phi4_conv64_r5.json 2>/dev/null "
      "&& break; done"], 18000),
    ("phi4_conv32_long_chunked",
     ["bash", "-c",
      "for i in $(seq 1 20); do "
      f"{sys.executable} tools/phi4_conv64_chunked.py --seed 0 --L 32 "
      "--eps 0.1 --total 4000 || true; "
      "grep -q conv32_chunked_seed0 phi4_conv64_r5.json 2>/dev/null "
      "&& break; done"], 14400),
    ("phi4_AE_T128",
     [sys.executable, "tools/phi4_64_r3.py", "--only", "AE_T128_pen20"],
     9000),
    ("mog2_r5b",
     [sys.executable, "tools/mog2_r5.py", "--seeds", "13", "21"], 14400),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--skip", type=int, default=0)
    p.add_argument("--only", type=str, nargs="*", default=None)
    args = p.parse_args()

    for label, argv, timeout in STAGES[args.skip:]:
        if args.only and label not in args.only:
            continue
        log = f"/tmp/r5q3_{label}.log"
        print(f"=== stage {label} -> {log}", flush=True)
        t0 = time.perf_counter()
        with open(log, "w") as f:
            try:
                rc = subprocess.run(argv, cwd=REPO, stdout=f,
                                    stderr=subprocess.STDOUT,
                                    timeout=timeout).returncode
            except subprocess.TimeoutExpired:
                rc = "timeout"
        print(f"=== stage {label}: rc={rc} "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
