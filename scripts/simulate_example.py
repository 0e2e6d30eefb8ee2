"""Generate an example dataset like the reference's example/ directory.

Produces <out>.bed/.bim/.fam/.dim plus normal.{phen,group,mS,beta,g,h2} and
Weibull.{phen,fail,beta,h2} analogues with known truth — the reference ships
t_M10K_N_5K (M=10,000, N=5,000, 2 annotation groups, h2 ~ 0.51) but without
the .bed; this regenerates a statistically matching dataset end-to-end.

Usage: python scripts/simulate_example.py --out /tmp/example [--m 10000] [--n 5000]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--m", type=int, default=10000)
    ap.add_argument("--n", type=int, default=5000)
    ap.add_argument("--h2-g0", type=float, default=0.389)   # example/normal.h2
    ap.add_argument("--h2-g1", type=float, default=0.122)
    ap.add_argument("--frac-causal", type=float, default=0.05)
    ap.add_argument("--alpha-weibull", type=float, default=10.0)
    ap.add_argument("--mu-weibull", type=float, default=4.1)
    ap.add_argument("--seed", type=int, default=1)
    args = ap.parse_args()

    from hydra_tpu.io.plink import write_bed
    from hydra_tpu.samplers.bayesw import EULER_MASCHERONI

    os.makedirs(args.out, exist_ok=True)
    rs = np.random.RandomState(args.seed)
    m, n = args.m, args.n
    base = os.path.join(args.out, f"t_M{m // 1000}K_N_{n // 1000}K")

    maf = rs.uniform(0.05, 0.5, m)
    geno = (rs.random((m, n)) < maf[:, None]).astype(np.int8)
    geno += (rs.random((m, n)) < maf[:, None]).astype(np.int8)
    write_bed(base + ".bed", geno.astype(np.int64))
    with open(base + ".fam", "w") as fh:
        for i in range(n):
            fh.write(f"per{i}\tper{i}\t0\t0\t0\t-9\n")
    with open(base + ".bim", "w") as fh:
        for j in range(m):
            fh.write(f"1\t{10 * (j + 1)}\t0\t{10 * (j + 1)}\tD\td\n")
    with open(base + ".dim", "w") as fh:
        fh.write(f"{n} {m}\n")

    groups = rs.randint(0, 2, m)
    np.savetxt(os.path.join(args.out, "normal.group"), groups, fmt="%d")
    with open(os.path.join(args.out, "normal.mS"), "w") as fh:
        fh.write("0.001,0.01,0.1;0.001,0.01,0.1\n")

    x = (geno - geno.mean(1, keepdims=True)) / np.maximum(geno.std(1, keepdims=True), 1e-9)
    beta = np.zeros(m)
    for g, h2 in ((0, args.h2_g0), (1, args.h2_g1)):
        idx = np.nonzero(groups == g)[0]
        causal = rs.choice(idx, max(1, int(len(idx) * args.frac_causal)), False)
        beta[causal] = rs.randn(len(causal)) * np.sqrt(h2 / len(causal))
    gval = x.T @ beta
    e = rs.randn(n) * np.sqrt(max(1e-6, 1.0 - gval.var()))
    y = gval + e
    with open(os.path.join(args.out, "normal.phen"), "w") as fh:
        for i in range(n):
            fh.write(f"per{i} per{i} {y[i]:.15f}\n")
    np.savetxt(os.path.join(args.out, "normal.beta"), beta)
    np.savetxt(os.path.join(args.out, "normal.g"), gval)
    h2_tot = gval.var() / y.var()
    with open(os.path.join(args.out, "normal.h2"), "w") as fh:
        va = [np.var(x[groups == g].T @ beta[groups == g]) for g in (0, 1)]
        fh.write(f"h2_est {h2_tot}\na1 {va[0] / y.var()}\na2 {va[1] / y.var()}\n"
                 f"var_g {gval.var()}\nvar_e {e.var()}\n")

    # second normal phenotype (independent causal set, same h2 split) for
    # multi-trait validation — validate_example.py --model mt
    beta2 = np.zeros(m)
    for g, h2 in ((0, args.h2_g0), (1, args.h2_g1)):
        idx = np.nonzero(groups == g)[0]
        causal = rs.choice(idx, max(1, int(len(idx) * args.frac_causal)), False)
        beta2[causal] = rs.randn(len(causal)) * np.sqrt(h2 / len(causal))
    gval2 = x.T @ beta2
    e2 = rs.randn(n) * np.sqrt(max(1e-6, 1.0 - gval2.var()))
    y2 = gval2 + e2
    with open(os.path.join(args.out, "normal2.phen"), "w") as fh:
        for i in range(n):
            fh.write(f"per{i} per{i} {y2[i]:.15f}\n")
    np.savetxt(os.path.join(args.out, "normal2.beta"), beta2)
    with open(os.path.join(args.out, "normal2.h2"), "w") as fh:
        fh.write(f"h2_est {gval2.var() / y2.var()}\n")

    # Weibull survival phenotype (BayesW generative model)
    alpha = args.alpha_weibull
    noise_var = (np.pi**2 / 6.0) / alpha**2
    bw = np.zeros(m)
    causal = rs.choice(m, max(1, m // 20), False)
    bw[causal] = rs.randn(len(causal)) * np.sqrt(noise_var / len(causal))
    w = np.log(rs.exponential(1.0, n)) + EULER_MASCHERONI
    yw = args.mu_weibull + x.T @ bw + w / alpha
    with open(os.path.join(args.out, "Weibull.phen"), "w") as fh:
        for i in range(n):
            fh.write(f"per{i} per{i} {yw[i]:.15f}\n")
    with open(os.path.join(args.out, "Weibull.fail"), "w") as fh:
        fh.write("\n".join("1" for _ in range(n)) + "\n")
    np.savetxt(os.path.join(args.out, "Weibull.beta"), bw)
    gw = x.T @ bw
    with open(os.path.join(args.out, "Weibull.h2"), "w") as fh:
        fh.write(f"h2 {gw.var() / (gw.var() + noise_var)}\nalpha {alpha}\n"
                 f"mu {args.mu_weibull}\n")
    print(f"wrote example dataset to {args.out} (h2 = {h2_tot:.4f})")


if __name__ == "__main__":
    main()
