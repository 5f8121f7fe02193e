"""Round-3 phi^4 64x64 campaign (VERDICT r2 item 6).

Round-2 state (PARITY "Honest scale limit"): at L=64 (dim 4096) the L=32
recipe loses — eps 0.1 diverges, eps 0.03 trains to acceptance 0.33 but
magnetization ESS 0.0013 vs tuned-HMC 0.021. This driver runs the VERDICT
prescription — longer training, wider nets, temperature annealing at small
eps — and records every attempt to phi4_64_r3.json (crash-safe append).
The fused eval at dim 4096 now exists (fori_loop trajectory kernel).

Usage (TPU, run alone): python tools/phi4_64_r3.py [--only A B]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# near-critical couplings as at L=16/32 (m2=-1, lam=0.5)
BASE = dict(L=64, m2=-1.0, lam=0.5, n_chains=256, eval_steps=1000,
            eps=0.03, hmc_eps=0.03)

EXPERIMENTS = {
    # r2 failure point, reproduced with the current code (control)
    "A_control": dict(n_steps=2000, hidden=32, leapfrogs=10),
    # longer + wider + anneal (the VERDICT prescription)
    "B_long_wide_anneal": dict(n_steps=6000, hidden=64, leapfrogs=10,
                               init_temperature=4.0),
    # shorter trajectories: the L=32 lesson from rough_well — the learned
    # sampler only needs to out-jump HMC per MH step
    "C_T5_wide": dict(n_steps=6000, hidden=64, leapfrogs=5,
                      init_temperature=4.0),
    # smaller eps, more headroom for the nets to amplify
    "D_eps02_long": dict(n_steps=8000, hidden=64, leapfrogs=10,
                         init_temperature=4.0, eps=0.02, hmc_eps=0.02),
    # wave 2 (after A-D): B wins tunneling 3.2x but still loses ESS_m
    # (0.48x) — hypothesis: the anneal parks chains near the domain wall
    # (m~0 sign-noise inflates tunneling without mixing). E tests anneal
    # off at B's budget; F pushes eps toward the stability edge (accept
    # 0.73 at 0.03 leaves headroom); G trades eps for trajectory length.
    "E_no_anneal": dict(n_steps=6000, hidden=64, leapfrogs=10),
    "F_eps004": dict(n_steps=6000, hidden=64, leapfrogs=10,
                     init_temperature=4.0, eps=0.04, hmc_eps=0.04),
    "G_T16": dict(n_steps=6000, hidden=64, leapfrogs=16,
                  init_temperature=4.0),
    # wave 3: translation-equivariant conv S/T/Q (nets/lattice.py) — the
    # dense MLP must learn the lattice symmetry from data; the CNN has it
    # by construction and its convs are MXU-native. Tuned-HMC bar at this
    # coupling: ESS_m ~0.020 at eps 0.04 (run F).
    # remat is load-bearing for conv at L=64: un-remat'd backward OOMs
    # HBM (measured 47.4G of 15.75G)
    # conv stability + tunnel notes (measured): chunk lengths >= 50
    # crash the remote TPU worker mid-scan (log_every=25 keeps calls
    # short); the raw distance objective collapses acceptance to 0 with
    # equivariant nets (accept_penalty + grad_clip, the ICG medicine).
    "H_conv": dict(n_steps=6000, net_type="conv", conv_channels=32,
                   leapfrogs=10, init_temperature=4.0, remat=True,
                   compute_dtype="bfloat16", accept_penalty=20.0,
                   grad_clip=5.0, log_every=25),
    "I_conv_eps004": dict(n_steps=6000, net_type="conv", conv_channels=32,
                          leapfrogs=10, init_temperature=4.0,
                          eps=0.04, hmc_eps=0.04, remat=True,
                          compute_dtype="bfloat16", accept_penalty=20.0,
                          grad_clip=5.0, log_every=25),
    "J_conv_deep": dict(n_steps=8000, net_type="conv", conv_channels=64,
                        conv_depth=3, leapfrogs=10, init_temperature=4.0,
                        eps=0.04, hmc_eps=0.04, remat=True,
                        compute_dtype="bfloat16", accept_penalty=20.0,
                        grad_clip=5.0, log_every=25),
    # G (T=16) is the first 64x64 win: ESS_m 0.0753 vs 0.0302 matched-T
    # HMC (2.5x). Combine the winning trajectory length with the conv nets
    # and with the dense recipe at yet-longer T.
    "K_conv_T16": dict(n_steps=6000, net_type="conv", conv_channels=32,
                       leapfrogs=16, init_temperature=4.0, remat=True,
                       compute_dtype="bfloat16", accept_penalty=20.0,
                       grad_clip=5.0, log_every=25),
    "L_T24": dict(n_steps=6000, hidden=64, leapfrogs=24,
                  init_temperature=4.0),
    # L_T24 doubled G: ESS_m 0.149 vs matched-T HMC 0.063 (2.35x; also
    # 2.4x per-leapfrog). Keep riding the T axis.
    "M_T32": dict(n_steps=6000, hidden=64, leapfrogs=32,
                  init_temperature=4.0, log_every=100),
    # wave 4: conv rescue. H/K measured acceptance collapse to 0.00 by
    # step 25 at LR 1e-3 (then exp-suppressed gradients — no recovery);
    # init is healthy (0.63-0.84 acceptance, CPU probe). Lower LR +
    # tighter clip keeps the net inside the accepting region while it
    # learns; T=16 is the dense winning trajectory length.
    "N_conv_rescue_T16": dict(
        n_steps=6000, net_type="conv", conv_channels=32, leapfrogs=16,
        init_temperature=4.0, remat=True, compute_dtype="bfloat16",
        accept_penalty=20.0, grad_clip=1.0, learning_rate=1e-4,
        log_every=25),
    "O_conv_rescue_lr3e5": dict(
        n_steps=6000, net_type="conv", conv_channels=32, leapfrogs=16,
        init_temperature=4.0, remat=True, compute_dtype="bfloat16",
        accept_penalty=20.0, grad_clip=1.0, learning_rate=3e-5,
        log_every=25),
    # round 4 (VERDICT r3 missing #2): the honest HMC grid rises in T at
    # the edge of the round-3 sweep (ESS_m 0.108 at T=32, eps 0.03); if
    # tuned HMC's optimum lands at T>=48 the learned sampler answers on
    # the same trajectory-length axis.
    "P_T48": dict(n_steps=6000, hidden=64, leapfrogs=48,
                  init_temperature=4.0, log_every=100),
    # the completed honest grid (phi4_64_hmc_grid.json) peaks at
    # eps 0.04 / T=64 (ESS_m 0.259, still rising at the edge) — above the
    # shipped T=24 learned recipe (0.151). Answer at matched T=64, and at
    # HMC's preferred eps.
    "Q_T64": dict(n_steps=6000, hidden=64, leapfrogs=64,
                  init_temperature=4.0, log_every=100),
    "R_T48_eps004": dict(n_steps=6000, hidden=64, leapfrogs=48, eps=0.04,
                         hmc_eps=0.04, init_temperature=4.0, log_every=100),
    # round-4 long-T rescue: the un-remat'd P/Q/R arms all crashed the
    # remote compile helper (HTTP 500) at first compile — T=32 is the last
    # un-remat'd dense config that compiles at dim 4096. The conv arms
    # compiled fine at L=64 WITH remat (they died later, at runtime), so
    # per-substep rematerialization is the candidate fix: it cuts the
    # backward's live-activation set ~T-fold, which is also what the
    # helper must lay out at compile time. bf16 variant as second lever.
    "U_T48_remat": dict(n_steps=6000, hidden=64, leapfrogs=48,
                        init_temperature=4.0, remat=True, log_every=100),
    "V_T64_remat": dict(n_steps=6000, hidden=64, leapfrogs=64,
                        init_temperature=4.0, remat=True, log_every=100),
    "W_T48_remat_bf16": dict(n_steps=6000, hidden=64, leapfrogs=48,
                             init_temperature=4.0, remat=True,
                             compute_dtype="bfloat16", log_every=100),
    # remat FIXED the T>=48 compile-helper crash, but the un-stabilized
    # arms collapse in training (acceptance 0.00 by ~step 4000 at T=48 —
    # a long trajectory amplifies one over-bold step; same trap class as
    # the conv arms). Stability wave: the ICG/conv medicine.
    "X_T48_pen20": dict(n_steps=6000, hidden=64, leapfrogs=48,
                        init_temperature=4.0, remat=True,
                        accept_penalty=20.0, grad_clip=1.0,
                        log_every=100),
    "Y_T48_lr1e4": dict(n_steps=6000, hidden=64, leapfrogs=48,
                        init_temperature=4.0, remat=True,
                        accept_penalty=20.0, grad_clip=1.0,
                        learning_rate=1e-4, log_every=100),
    "Z_T64_pen20": dict(n_steps=6000, hidden=64, leapfrogs=64,
                        init_temperature=4.0, remat=True,
                        accept_penalty=20.0, grad_clip=1.0,
                        learning_rate=1e-4, log_every=100),
    # Y broke the learned plateau (0.151 @T32 -> 0.196 @T48, 1.09x
    # matched-T HMC): the stabilized recipe SCALES with T. Chase HMC's
    # own optimum trajectory length.
    "AA_T96_pen20": dict(n_steps=6000, hidden=64, leapfrogs=96,
                         init_temperature=4.0, remat=True,
                         accept_penalty=20.0, grad_clip=1.0,
                         learning_rate=1e-4, log_every=100),
    # Round 5: AA landed 0.359 vs matched-T HMC 0.396 (0.91x; 0.88x of
    # the grid's global optimum 0.408) with acceptance SATURATED at
    # 0.9998 — the pen20 pull toward 0.65 never moved it, i.e. the
    # sampler stayed step-timid and the remaining gap is headroom, not a
    # wall. Three levers to un-pin acceptance at T=96:
    "AB_T96_pen60": dict(n_steps=6000, hidden=64, leapfrogs=96,
                         init_temperature=4.0, remat=True,
                         accept_penalty=60.0, grad_clip=1.0,
                         learning_rate=1e-4, log_every=100),
    "AC_T96_eps005": dict(n_steps=6000, hidden=64, leapfrogs=96,
                          init_temperature=4.0, remat=True, eps=0.05,
                          accept_penalty=20.0, grad_clip=1.0,
                          learning_rate=1e-4, log_every=100),
    "AD_T96_lr3e4": dict(n_steps=6000, hidden=64, leapfrogs=96,
                         init_temperature=4.0, remat=True,
                         accept_penalty=20.0, grad_clip=1.0,
                         learning_rate=3e-4, log_every=100),
    # does the learned ladder keep scaling past HMC's optimum T?
    "AE_T128_pen20": dict(n_steps=6000, hidden=64, leapfrogs=128,
                          init_temperature=4.0, remat=True,
                          accept_penalty=20.0, grad_clip=1.0,
                          learning_rate=1e-4, log_every=100),
    # AB measured: pen60 is INERT at this scale — the 64x64 mixed-ESJD
    # loss sits at ~1.6e5, so a penalty of 20-60 is six orders too small
    # to move the optimum (acceptance saturates 1.00 again). Scale the
    # penalty to the loss: 1e6 * (p-0.65)^2 ~ 1.2e5 at p=1, comparable
    # to the ESJD term — the optimizer is actually forced off p=1.
    "AF_T96_pen1e6": dict(n_steps=6000, hidden=64, leapfrogs=96,
                          init_temperature=4.0, remat=True,
                          accept_penalty=1e6, grad_clip=1.0,
                          learning_rate=1e-4, log_every=100),
    # round-4 conv fallback: BOTH L=64 rescue arms (N/O) died to the
    # remote-TPU-worker crash (long conv scans kill the worker even at
    # chunk 25 — infra ceiling, recorded in phi4_64_r3.json). The
    # conv-vs-dense question moves to L=32, where the stack survives and
    # the dense bar is known (phi4_results.json: ESS_m 0.090, 1.57x tuned
    # HMC, 1500 steps). Same stability knobs the CPU probe validated.
    "S_conv_L32": dict(L=32, n_steps=1500, net_type="conv",
                       conv_channels=32, leapfrogs=10, eps=0.1,
                       hmc_eps=0.1, remat=True, compute_dtype="bfloat16",
                       accept_penalty=20.0, grad_clip=1.0,
                       learning_rate=1e-4, log_every=25),
    "T_conv_L32_long": dict(L=32, n_steps=4000, net_type="conv",
                            conv_channels=32, leapfrogs=10, eps=0.1,
                            hmc_eps=0.1, remat=True,
                            compute_dtype="bfloat16", accept_penalty=20.0,
                            grad_clip=1.0, learning_rate=1e-4,
                            log_every=25),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--only", type=str, nargs="*", default=None)
    p.add_argument("--quick", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default="phi4_64_r3.json")
    args = p.parse_args()

    from l2hmc_tpu.apps import phi4

    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)

    for name, ov in EXPERIMENTS.items():
        if args.only and name not in args.only:
            continue
        key = f"{name}_seed{args.seed}"
        if key in results:
            print(f"skip {key}")
            continue
        kw = {**BASE, **ov, "seed": args.seed}
        if args.quick:
            kw.update(L=8, n_steps=30, n_chains=32, eval_steps=40)
        print(f"=== {key}: {kw}")
        try:
            r = phi4.run(**kw)
        except Exception as e:  # OOM / compile failure: record, continue
            print(f"!! {key} failed: {type(e).__name__}: {str(e)[:300]}")
            results[key] = {"failed": str(e)[:500], "config": kw}
            with open(args.out, "w") as f:
                json.dump(results, f, indent=2)
            continue
        r["config"] = kw
        results[key] = r
        print(json.dumps({key: {k: r[k] for k in (
            'tunneling_rate_l2hmc', 'tunneling_rate_hmc',
            'ess_m_l2hmc', 'ess_m_hmc', 'final_accept')}}))
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    print("done ->", args.out)


if __name__ == "__main__":
    main()
