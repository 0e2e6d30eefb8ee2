"""Attribute the planes-path slowdown: gather vs stats kernel vs axpy kernel.

hw_battery 5b measured 1759 us/window for the planes path at M=10K x
N=50K W=256 (vs 116 us packed). Times each piece in a fused 40-window
loop (one dispatch, host-fetch fence) to find where the time goes.
"""
import sys

sys.path.insert(0, ".")

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=3):
    r = fn(*args)
    jax.block_until_ready(r)
    float(jnp.sum(r[0] if isinstance(r, tuple) else r))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*args)
        float(jnp.sum(r[0] if isinstance(r, tuple) else r))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print("backend:", jax.default_backend())
    from hydra_tpu.ops.planes import window_axpy_planes, window_stats_planes

    rs = np.random.RandomState(0)
    M, N, W = 10000, 50000, 256
    NB = -(-N // 4)
    n_pad = -(-N // 512) * 512
    NP = 4 * (n_pad // 4)
    n_win = M // W

    planes = jnp.asarray(rs.randint(0, 3, (M, NP)).astype(np.int8))
    eps = jnp.asarray(rs.normal(0, 1, (1, NP)).astype(np.float32))
    c1 = jnp.asarray(rs.normal(0, 0.1, W).astype(np.float32))
    perm = jnp.asarray(rs.permutation(M).astype(np.int32))

    # A: gather only (40 windows)
    @jax.jit
    def gather_only(planes, perm):
        def body(acc, w):
            idx = jax.lax.dynamic_slice(perm, (w * W,), (W,))
            pw = jnp.take(planes, idx, axis=0)
            return acc + jnp.float32(pw[0, 0]), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n_win))
        return acc

    # B: gather + stats
    @jax.jit
    def gather_stats(planes, perm, eps):
        def body(acc, w):
            idx = jax.lax.dynamic_slice(perm, (w * W,), (W,))
            pw = jnp.take(planes, idx, axis=0)
            s1 = window_stats_planes(pw, eps)
            return acc + jnp.sum(s1), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n_win))
        return acc

    # C: gather + axpy
    @jax.jit
    def gather_axpy(planes, perm, eps, c1):
        def body(e, w):
            idx = jax.lax.dynamic_slice(perm, (w * W,), (W,))
            pw = jnp.take(planes, idx, axis=0)
            return e + window_axpy_planes(pw, c1), None
        e, _ = jax.lax.scan(body, eps, jnp.arange(n_win))
        return jnp.sum(e)

    # D: stats on a CONTIGUOUS window slice (no gather). The slice start
    # varies with the loop counter so XLA cannot hoist the kernel out of
    # the scan (a fixed (0, 0) slice body is loop-invariant and would time
    # one window, not n_win).
    @jax.jit
    def stats_only(planes, eps):
        def body(acc, w):
            pw = jax.lax.dynamic_slice(planes, (w * W, 0), (W, NP))
            s1 = window_stats_planes(pw, eps)
            return acc + jnp.sum(s1), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n_win))
        return acc

    for name, fn, args in [
            ("A gather only ", gather_only, (planes, perm)),
            ("B gather+stats", gather_stats, (planes, perm, eps)),
            ("C gather+axpy ", gather_axpy, (planes, perm, eps, c1)),
            ("D stats only  ", stats_only, (planes, eps))]:
        t = timeit(fn, *args)
        print(f"{name}: {t * 1e3:7.1f} ms total, {t / n_win * 1e6:8.1f} us/window")


if __name__ == "__main__":
    main()
