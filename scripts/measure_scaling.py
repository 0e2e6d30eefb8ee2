"""Strong-scaling measurement over the marker mesh.

The analogue of the reference's CSCS strong-scaling runs
(CSCS/strong_scaling_fullSim/*.sh): fixed problem, growing shard count,
reporting sweep time and parallel efficiency. On a real pod slice this
measures ICI scaling; on the CPU test mesh it validates SPMD overhead
structurally.

Usage: python scripts/measure_scaling.py [--m 20000] [--n 2000] [--devices 1,2,4,8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=20000)
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--window", type=int, default=64)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--devices", default="")
    ap.add_argument("--ind-shards", type=int, default=1,
                    help="fixed inds-axis size: each entry of --devices is "
                         "the total device count of a (d/K, K) mesh")
    ap.add_argument("--cpu", action="store_true",
                    help="force the virtual CPU mesh")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    import jax

    from bench import make_problem
    from hydra_tpu.parallel.mesh import make_mesh
    from hydra_tpu.samplers.bayesrrm import BayesRRm

    n_avail = len(jax.devices())
    counts = ([int(d) for d in args.devices.split(",") if d]
              or [d for d in (1, 2, 4, 8, 16, 32) if d <= n_avail])
    ds = make_problem(args.m, args.n)

    base_time = None
    print(f"# devices available: {n_avail} ({jax.devices()[0].platform})")
    print(f"{'devices':>8} {'ms/sweep':>10} {'markers/s':>12} {'efficiency':>10}")
    for nd in counts:
        s = BayesRRm(ds, window=args.window, exact=False, seed=3,
                     mesh=make_mesh(nd, n_ind=args.ind_shards))
        st = s.init_state()
        st, _ = s.step(st, 0)
        jax.block_until_ready(st.eps)
        t0 = time.time()
        for it in range(1, args.iters + 1):
            st, _ = s.step(st, it)
        jax.block_until_ready(st.eps)
        dt = (time.time() - t0) / args.iters
        if base_time is None:
            base_time = dt
        eff = base_time / (dt * nd)
        print(f"{nd:>8} {dt * 1e3:>10.2f} {args.m / dt:>12.0f} {eff:>10.2%}")


if __name__ == "__main__":
    main()
