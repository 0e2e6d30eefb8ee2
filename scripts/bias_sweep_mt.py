"""Multi-trait stale-window posterior bias sweep (BIAS_SWEEP.md companion).

The multi-trait sampler (samplers/bayesrrm_mt.py — present-but-disabled in
the reference, src/BayesRRm_mt.cpp) uses the same window/sync-rate
relaxation as BayesRRm; this sweeps W in {1, 8, 64, 256} on simulated
T-trait data with known per-trait h2 and reports the posterior h2 mean/CI
per trait. W=1 is sequential sync-rate=1 semantics.

Usage: python scripts/bias_sweep_mt.py [--iters 800] [--burn 300]
       [--m 2000] [--n 2000] [--traits 3] [--out BIAS_SWEEP_MT.md]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H2_TRUE = 0.5


def simulate_mt(m, n, n_traits, seed=3):
    from hydra_tpu.data.genotypes import (Dataset, GenotypeData,
                                          make_default_groups)
    from tests.test_bayesrrm import _pack

    rs = np.random.RandomState(seed)
    maf = rs.uniform(0.1, 0.5, m)
    geno = (rs.binomial(1, maf[:, None], (m, n))
            + rs.binomial(1, maf[:, None], (m, n)))
    keep = geno.std(axis=1) > 0
    geno = geno[keep]
    m = geno.shape[0]
    x = (geno - geno.mean(1, keepdims=True)) / geno.std(1, keepdims=True)
    ncausal = max(10, m // 20)
    phenos = np.zeros((n_traits, n))
    for t in range(n_traits):
        causal = rs.choice(m, ncausal, replace=False)
        beta = np.zeros(m)
        beta[causal] = rs.randn(ncausal) * np.sqrt(H2_TRUE / ncausal)
        g = x.T @ beta
        phenos[t] = g + rs.randn(n) * np.sqrt(np.var(g) * (1 - H2_TRUE)
                                              / H2_TRUE)
    gd = GenotypeData.from_packed(_pack(geno), n, np.array([], np.int64))
    groups, mS = make_default_groups(m, [0.001, 0.01, 0.1])
    return Dataset(geno=gd, y=phenos[0], groups=groups, num_groups=1,
                   mS=mS), phenos


def run_chain(ds, phenos, window, iters, burn, seed=101):
    import jax
    from hydra_tpu.parallel.mesh import make_mesh
    from hydra_tpu.samplers.bayesrrm_mt import BayesRRmMT

    T = phenos.shape[0]
    s = BayesRRmMT(ds, phenos, window=window, seed=seed, mesh=make_mesh(1))
    state = s.init_state()
    h2s = []
    t0 = time.time()
    for it in range(iters):
        state, _ = s.step(state, it)
        if it >= burn and it % 5 == 0:
            sg = np.asarray(state.sigma_g).sum(axis=1)      # (T,)
            se = np.asarray(state.sigma_e)
            h2s.append(sg / (sg + se))
    jax.block_until_ready(state.sigma_e)
    dt = time.time() - t0
    h2s = np.asarray(h2s)                                    # (S, T)
    return dict(window=window,
                h2_mean=[float(v) for v in h2s.mean(0)],
                h2_lo=[float(v) for v in np.percentile(h2s, 5, axis=0)],
                h2_hi=[float(v) for v in np.percentile(h2s, 95, axis=0)],
                seconds=dt, ms_per_sweep=dt / iters * 1e3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=2_000)
    ap.add_argument("--n", type=int, default=2_000)
    ap.add_argument("--traits", type=int, default=3)
    ap.add_argument("--iters", type=int, default=800)
    ap.add_argument("--burn", type=int, default=300)
    ap.add_argument("--windows", default="1,8,64,256")
    ap.add_argument("--out", default="")
    ap.add_argument("--device", default="")
    args = ap.parse_args()

    import jax
    if args.device:
        jax.config.update("jax_platforms", args.device)

    ds, phenos = simulate_mt(args.m, args.n, args.traits)
    results = []
    for w in [int(x) for x in args.windows.split(",") if x]:
        r = run_chain(ds, phenos, w, args.iters, args.burn)
        r["label"] = f"stale W={w}"
        print(json.dumps(r), flush=True)
        results.append(r)

    if args.out:
        with open(args.out, "w") as fh:
            fh.write(f"# Multi-trait stale-window bias sweep (M={args.m}, "
                     f"N={args.n}, T={args.traits}, true h2={H2_TRUE}, "
                     f"{args.iters} iters, burn {args.burn})\n\n")
            fh.write("| config | h2 mean per trait | h2 5-95% (trait 0) "
                     "| ms/sweep |\n|---|---|---|---|\n")
            for r in results:
                means = ", ".join(f"{v:.3f}" for v in r["h2_mean"])
                fh.write(f"| {r['label']} | {means} "
                         f"| [{r['h2_lo'][0]:.3f}, {r['h2_hi'][0]:.3f}] "
                         f"| {r['ms_per_sweep']:.1f} |\n")
        print(f"# wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    import jax
    jax.config.update("jax_platforms", os.environ.get("BIAS_DEVICE", "cpu"))
    main()
