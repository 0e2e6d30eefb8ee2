"""Decompose the per-window cost of the BayesRRm sweep on real hardware.

Times, as separate jitted scans over the same window schedule:
  1. gather-only        : pk = take(packed, idx) per window
  2. slice-only         : pk = dynamic_slice rows (no permutation semantics)
  3. stats-kernel-only  : window_stats on sliced rows
  4. stats+axpy kernels : both Pallas kernels, eps carried
  5. full sweep         : sampler.step (reference point)

Usage: python scripts/profile_window.py [--m 10000] [--n 50000] [--window 64]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, reps=5):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=10_000)
    ap.add_argument("--n", type=int, default=50_000)
    ap.add_argument("--window", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import make_problem
    from hydra_tpu.ops.window_kernels import window_axpy, window_stats
    from hydra_tpu.parallel.mesh import make_mesh
    from hydra_tpu.samplers.bayesrrm import BayesRRm

    ds = make_problem(args.m, args.n)
    W = args.window
    sampler = BayesRRm(ds, window=W, exact=False, seed=11, mesh=make_mesh(1))
    packed = np.asarray(sampler.packed)
    packed = jax.device_put(packed)
    M, NB = packed.shape
    nw = M // W
    print(f"# M={M} NB={NB} windows={nw} W={W}", flush=True)
    key = jax.random.key(0)
    perm = jax.random.permutation(key, M)
    eps0 = jnp.zeros((NB * 4,), jnp.float32)

    @jax.jit
    def gather_only(perm):
        def body(acc, w):
            idx = jax.lax.dynamic_slice(perm, (w * W,), (W,))
            pk = jnp.take(packed, idx, axis=0)
            return acc + jnp.sum(pk.astype(jnp.int32)), None
        acc, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(nw))
        return acc

    @jax.jit
    def slice_only():
        def body(acc, w):
            pk = jax.lax.dynamic_slice(packed, (w * W, 0), (W, NB))
            return acc + jnp.sum(pk.astype(jnp.int32)), None
        acc, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(nw))
        return acc

    mave = jnp.asarray(np.asarray(sampler.mave))
    mstd = jnp.asarray(np.asarray(sampler.mstd))

    @jax.jit
    def stats_only(eps):
        eps_d = eps.reshape(-1, 4)
        def body(acc, w):
            pk = jax.lax.dynamic_slice(packed, (w * W, 0), (W, NB))
            mv = jax.lax.dynamic_slice(mave, (w * W,), (W,))
            ms = jax.lax.dynamic_slice(mstd, (w * W,), (W,))
            s1, s2, _ = window_stats(pk, eps_d, mv, ms, False)
            return acc + jnp.sum(s1) + jnp.sum(s2), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(nw))
        return acc

    @jax.jit
    def stats_gather(eps, perm):
        eps_d = eps.reshape(-1, 4)
        def body(acc, w):
            idx = jax.lax.dynamic_slice(perm, (w * W,), (W,))
            pk = jnp.take(packed, idx, axis=0)
            mv = jnp.take(mave, idx)
            ms = jnp.take(mstd, idx)
            s1, s2, _ = window_stats(pk, eps_d, mv, ms, False)
            return acc + jnp.sum(s1) + jnp.sum(s2), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(nw))
        return acc

    @jax.jit
    def stats_axpy(eps):
        def body(eps, w):
            pk = jax.lax.dynamic_slice(packed, (w * W, 0), (W, NB))
            mv = jax.lax.dynamic_slice(mave, (w * W,), (W,))
            ms = jax.lax.dynamic_slice(mstd, (w * W,), (W,))
            s1, s2, _ = window_stats(pk, eps.reshape(-1, 4), mv, ms, False)
            c1 = s1 * 1e-6
            d = window_axpy(pk, c1, -c1 * mv).T.reshape(-1)
            return eps + d, None
        eps, _ = jax.lax.scan(body, eps, jnp.arange(nw))
        return eps

    t = timeit(gather_only, perm)
    print(f"gather-only      : {t*1e3:8.1f} ms/sweep  {t/nw*1e6:8.1f} us/window", flush=True)
    t = timeit(slice_only)
    print(f"slice-only       : {t*1e3:8.1f} ms/sweep  {t/nw*1e6:8.1f} us/window", flush=True)
    t = timeit(stats_only, eps0)
    print(f"slice+stats      : {t*1e3:8.1f} ms/sweep  {t/nw*1e6:8.1f} us/window", flush=True)
    t = timeit(stats_gather, eps0, perm)
    print(f"gather+stats     : {t*1e3:8.1f} ms/sweep  {t/nw*1e6:8.1f} us/window", flush=True)
    t = timeit(stats_axpy, eps0)
    print(f"slice+stats+axpy : {t*1e3:8.1f} ms/sweep  {t/nw*1e6:8.1f} us/window", flush=True)

    state = sampler.init_state()
    state, _ = sampler.step(state, 0)
    jax.block_until_ready(state.eps)
    best = float("inf")
    for it in range(1, 4):
        t0 = time.time()
        state, _ = sampler.step(state, it)
        jax.block_until_ready(state.eps)
        best = min(best, time.time() - t0)
    print(f"full sweep       : {best*1e3:8.1f} ms/sweep  {best/nw*1e6:8.1f} us/window", flush=True)


if __name__ == "__main__":
    main()
