"""End-to-end validation on the example dataset — plot_example.R's check in
text form: per-annotation genetic variance estimates vs simulated truth.

Usage:
  python scripts/simulate_example.py --out /tmp/ex --m 2000 --n 2000
  python scripts/validate_example.py --dir /tmp/ex --chain 600 --burn 300
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", required=True)
    ap.add_argument("--chain", type=int, default=600)
    ap.add_argument("--burn", type=int, default=300)
    ap.add_argument("--window", type=int, default=32)
    ap.add_argument("--seed", type=int, default=5)
    ap.add_argument("--device", default="",
                    help="jax platform override (e.g. cpu); the "
                         "sitecustomize forces the axon TPU otherwise")
    args = ap.parse_args()

    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)

    import glob
    bed = glob.glob(os.path.join(args.dir, "*.bed"))[0][:-4]
    out = os.path.join(args.dir, "mcmc")

    from hydra_tpu.options import parse_args as popt
    from hydra_tpu.runner import run_bayesrrm

    opt = popt([
        "--mpibayes", "bayesMPI", "--bfile", bed,
        "--pheno", os.path.join(args.dir, "normal.phen"),
        "--groupIndexFile", os.path.join(args.dir, "normal.group"),
        "--groupMixtureFile", os.path.join(args.dir, "normal.mS"),
        "--chain-length", str(args.chain), "--thin", "5", "--save", "20",
        "--window", str(args.window), "--stale",
        "--mcmc-out-dir", out, "--mcmc-out-name", "ex",
        "--seed", str(args.seed),
    ])
    run_bayesrrm(opt, verbose=True)

    # posterior means from the csv, post burn-in
    rows = []
    with open(os.path.join(out, "ex.csv")) as fh:
        for line in fh:
            tok = [t.strip() for t in line.split(",")]
            if int(tok[0]) >= args.burn:
                g = int(tok[1])
                rows.append([float(v) for v in tok[2:2 + g]] + [float(tok[2 + g])])
    rows = np.asarray(rows)
    sg = rows[:, :-1].mean(axis=0)
    se = rows[:, -1].mean()

    truth = {}
    with open(os.path.join(args.dir, "normal.h2")) as fh:
        for line in fh:
            k, v = line.split()
            truth[k] = float(v)
    h2_est = sg.sum() / (sg.sum() + se)
    print(f"\nper-annotation variance: sigmaG = {sg}, sigmaE = {se:.4f}")
    print(f"h2 estimate = {h2_est:.4f} vs truth {truth['h2_est']:.4f}")
    print(f"a1 = {sg[0] / (sg.sum() + se):.4f} vs truth {truth['a1']:.4f}")
    print(f"a2 = {sg[1] / (sg.sum() + se):.4f} vs truth {truth['a2']:.4f}")
    ok = abs(h2_est - truth["h2_est"]) < 0.1
    print("VALIDATION:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
