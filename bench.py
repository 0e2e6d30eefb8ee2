"""Benchmark: BayesRRm Gibbs sweep on the reference's example problem size.

Problem: M=10,000 markers x N=5,000 individuals (example/t_M10K_N_5K.dim) —
the reference's correctness/benchmark dataset. Metric (BASELINE.md): marker
updates/s per chip and wall-clock per full Gibbs sweep.

Baseline: the reference publishes no numbers and its binary cannot run here
(Intel MPI runtime absent). `vs_baseline` therefore compares against a
measured run of hydra_tpu's own faithful sequential NumPy implementation
(hydra_tpu/testing/reference_bayesrrm.py — same math, same per-marker order
the reference executes, BLAS-vectorized dot products) on this host's CPU,
cached in BASELINE_MEASURED.json. That is a *favorable* stand-in for the
single-rank C++ reference.

Usage: python bench.py [--m 10000] [--n 5000] [--iters 12] [--window 64]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

M_DEFAULT, N_DEFAULT = 10_000, 5_000
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BASELINE_MEASURED.json")


def make_problem(m, n, seed=1):
    from hydra_tpu.data.genotypes import Dataset, GenotypeData, make_default_groups
    from hydra_tpu.io.plink import MISSING_CODE, bed_bytes_per_marker

    rs = np.random.RandomState(seed)
    maf = rs.uniform(0.05, 0.5, m)
    # pack directly from Binomial(2, maf) without materializing huge floats
    geno = (rs.random((m, n)) < maf[:, None]).astype(np.uint8)
    geno += (rs.random((m, n)) < maf[:, None]).astype(np.uint8)
    code = np.select([geno == 0, geno == 1, geno == 2], [0b11, 0b10, 0b00]).astype(np.uint8)
    nbytes = bed_bytes_per_marker(n)
    padded = np.full((m, nbytes * 4), MISSING_CODE, dtype=np.uint8)
    padded[:, :n] = code
    packed = (padded[:, 0::4] | (padded[:, 1::4] << 2)
              | (padded[:, 2::4] << 4) | (padded[:, 3::4] << 6)).astype(np.uint8)
    gd = GenotypeData.from_packed(packed, n, np.array([], dtype=np.int64))

    ncausal = m // 10
    causal = rs.choice(m, ncausal, replace=False)
    beta = np.zeros(m)
    beta[causal] = rs.randn(ncausal) * np.sqrt(0.5 / ncausal)
    xs = (geno.astype(np.float64) - gd.mave[:, None]) * gd.mstd[:, None]
    y = xs.T @ beta + rs.randn(n) * np.sqrt(0.5)
    groups, mS = make_default_groups(m, [0.0001, 0.001, 0.01])
    return Dataset(geno=gd, y=y, groups=groups, num_groups=1, mS=mS)


def measure_numpy_baseline(ds, sweeps=2):
    """Sequential reference-math sweep timing (cached)."""
    key = f"numpy_seq_m{ds.m}_n{ds.n}"
    if os.path.exists(CACHE):
        with open(CACHE) as fh:
            cache = json.load(fh)
        if key in cache:
            return cache[key], False
    else:
        cache = {}
    from hydra_tpu.io.pheno import center_and_scale
    from hydra_tpu.io.plink import decode_bed_numpy
    from hydra_tpu.testing.reference_bayesrrm import sweep

    y = center_and_scale(ds.y)
    g, mask = decode_bed_numpy(ds.geno.packed, ds.geno.n_pad)
    xt = ((g - ds.geno.mave[:, None] * mask) * ds.geno.mstd[:, None])[:, : ds.n]
    rng = np.random.RandomState(5)
    st = dict(eps=y.copy(), beta=np.zeros(ds.m), mu=0.0,
              sigma_g=np.array([0.5]), sigma_e=0.5,
              est_pi=np.tile([[0.5, 0.17, 0.17, 0.16]], (1, 1)))
    t0 = time.time()
    for _ in range(sweeps):
        out = sweep(xt, st["eps"], st["beta"], ds.groups, ds.mS,
                    st["sigma_g"], st["sigma_e"], st["mu"], st["est_pi"], rng)
        st.update(eps=out["eps"], beta=out["beta"], mu=out["mu"],
                  sigma_g=out["sigma_g"], sigma_e=out["sigma_e"],
                  est_pi=out["est_pi"])
    per_sweep = (time.time() - t0) / sweeps
    cache[key] = per_sweep
    with open(CACHE, "w") as fh:
        json.dump(cache, fh, indent=1)
    return per_sweep, True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=M_DEFAULT)
    ap.add_argument("--n", type=int, default=N_DEFAULT)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--window", type=int, default=64)
    # Default = stale-window relaxation (the reference's production
    # configuration: CSCS strong-scaling runs use --sync-rate 5 across
    # 83-332 ranks => hundreds of stale markers per window). --exact runs
    # Gram-corrected sequential Gibbs (sync-rate=1 semantics).
    ap.add_argument("--exact", action="store_true")
    ap.add_argument("--skip-baseline", action="store_true")
    args = ap.parse_args()

    import jax
    from hydra_tpu.parallel.mesh import make_mesh
    from hydra_tpu.samplers.bayesrrm import BayesRRm

    ds = make_problem(args.m, args.n)

    baseline_s = None
    if not args.skip_baseline:
        baseline_s, fresh = measure_numpy_baseline(ds)
        print(f"# numpy sequential baseline: {baseline_s:.3f} s/sweep"
              f"{' (measured now)' if fresh else ' (cached)'}", file=sys.stderr)

    mesh = make_mesh(1)
    sampler = BayesRRm(ds, window=args.window, exact=args.exact,
                       seed=11, mesh=mesh)
    state = sampler.init_state()
    # warmup/compile
    state, _ = sampler.step(state, 0)
    jax.block_until_ready(state.eps)
    t0 = time.time()
    for it in range(1, args.iters + 1):
        state, stats = sampler.step(state, it)
    jax.block_until_ready(state.eps)
    per_sweep = (time.time() - t0) / args.iters
    markers_per_s = args.m / per_sweep

    sg = float(np.asarray(state.sigma_g).sum())
    se = float(state.sigma_e)
    print(f"# per-sweep: {per_sweep * 1e3:.2f} ms  |  h2 = {sg / (sg + se):.3f}  "
          f"| device: {jax.devices()[0].platform}", file=sys.stderr)

    vs = (baseline_s / per_sweep) if baseline_s else 1.0
    print(json.dumps({
        "metric": f"BayesRRm marker updates/s/chip (M={args.m}, N={args.n}, "
                  f"window={args.window}, {'exact' if args.exact else 'stale'})",
        "value": round(markers_per_s, 1),
        "unit": "markers/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
