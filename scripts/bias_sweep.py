"""Stale-window posterior bias sweep (VERDICT r1 item 3).

Quantifies what the window/sync-rate relaxation does to the posterior: runs
BayesRRm on the reference-size simulated problem (M=10K x N=5K, true h2=0.5)
for W in {1, 8, 64, 256, 1024} stale plus exact mode, and reports posterior
mean / CI of h2 and the per-component mixture masses against the exact chain.

The reference exposes the same trade-off as --sync-rate (options.cpp:213-216)
and never quantifies it; its production strong-scaling runs use sync-rate 5
across 83-332 ranks = hundreds of stale markers per sync window.

Usage: python scripts/bias_sweep.py [--iters 1200] [--burn 400] [--m 10000]
       [--n 5000] [--out BIAS_SWEEP.md]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_chain(ds, window, exact, iters, burn, seed=101, schedule="auto"):
    import jax
    from hydra_tpu.parallel.mesh import make_mesh
    from hydra_tpu.samplers.bayesrrm import BayesRRm

    sampler = BayesRRm(ds, window=window, exact=exact, seed=seed,
                       mesh=make_mesh(1), schedule=schedule)
    state = sampler.init_state()
    h2s, m0s = [], []
    t0 = time.time()
    for it in range(iters):
        state, stats = sampler.step(state, it)
        if it >= burn and it % 5 == 0:
            sg = float(np.asarray(state.sigma_g).sum())
            se = float(state.sigma_e)
            h2s.append(sg / (sg + se))
            m0s.append(int(np.asarray(stats.m0).sum()))
    jax.block_until_ready(state.eps)
    dt = time.time() - t0
    h2s = np.asarray(h2s)
    return dict(window=window, exact=exact,
                h2_mean=float(h2s.mean()), h2_sd=float(h2s.std()),
                h2_lo=float(np.percentile(h2s, 5)),
                h2_hi=float(np.percentile(h2s, 95)),
                m0_mean=float(np.mean(m0s)), seconds=dt,
                ms_per_sweep=dt / iters * 1e3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=10_000)
    ap.add_argument("--n", type=int, default=5_000)
    ap.add_argument("--iters", type=int, default=1200)
    ap.add_argument("--burn", type=int, default=400)
    ap.add_argument("--windows", default="1,8,64,256,1024")
    ap.add_argument("--schedules", default="marker",
                    help="comma-separated schedules to sweep per window "
                         "(marker,block — quantifies the block schedule's "
                         "fixed-partition relaxation)")
    ap.add_argument("--skip-exact", action="store_true")
    ap.add_argument("--out", default="")
    ap.add_argument("--device", default="")
    args = ap.parse_args()

    import jax
    if args.device:
        jax.config.update("jax_platforms", args.device)

    from bench import make_problem

    ds = make_problem(args.m, args.n)
    results = []
    if not args.skip_exact:
        r = run_chain(ds, 64, True, args.iters, args.burn)
        r["label"] = "exact (W=64 Gram)"
        print(json.dumps(r), flush=True)
        results.append(r)
    for w in [int(x) for x in args.windows.split(",") if x]:
        for sched in [x for x in args.schedules.split(",") if x]:
            r = run_chain(ds, w, False, args.iters, args.burn,
                          schedule=sched)
            r["label"] = (f"stale W={w}" if sched == "marker"
                          else f"stale W={w} ({sched})")
            print(json.dumps(r), flush=True)
            results.append(r)

    if args.out:
        with open(args.out, "w") as fh:
            fh.write(f"# Stale-window bias sweep (M={args.m}, N={args.n}, "
                     f"true h2=0.5, {args.iters} iters, burn {args.burn})\n\n")
            fh.write("| config | h2 mean | h2 5-95% | m0 | ms/sweep |\n")
            fh.write("|---|---|---|---|---|\n")
            for r in results:
                fh.write(f"| {r['label']} | {r['h2_mean']:.4f} "
                         f"| [{r['h2_lo']:.4f}, {r['h2_hi']:.4f}] "
                         f"| {r['m0_mean']:.0f} | {r['ms_per_sweep']:.1f} |\n")
        print(f"# wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
