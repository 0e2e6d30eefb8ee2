"""Phase attribution for the EXACT-mode mega kernel (VERDICT r4 item 3).

Times sweep_exact on the real chip with compile-time stubs:
  empty     -> grid + DMA floor
  no_gram   -> decode + stats VPU (+ recurrence w/o real Gram) + axpy
  no_recur  -> everything except the sequential W-step loop
  full      -> the shipped kernel
plus a window sweep and a tile sweep at the best W. Synthetic complete-data
bytes at M=100K x N=50K equivalents (the ESS_CERT scale; mirrors
scripts/profile_phases.py's methodology for the stale kernel).

Usage: python scripts/profile_exact.py [--m 100352] [--n 50000] [--w 128]
"""

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax                              # noqa: E402
import jax.numpy as jnp                 # noqa: E402

from hydra_tpu.data.genotypes import pad_individuals   # noqa: E402
from hydra_tpu.ops.decode import hpack_bytes           # noqa: E402
from hydra_tpu.ops.sweep_kernel import mrow_width, sweep_exact  # noqa: E402


def build(m_loc, n, w, seed=0):
    rng = np.random.Generator(np.random.SFC64(seed))
    n_pad = pad_individuals(n)
    nb = n_pad // 4
    # complete data: bytes with no code 01 (missing); build from 2-bit codes
    codes = rng.integers(0, 3, size=(m_loc, n_pad), dtype=np.uint8)
    codes = np.where(codes == 1, 3, codes)  # {0,2,3} -> valid PLINK codes
    pk = (codes[:, 0::4] | (codes[:, 1::4] << 2) | (codes[:, 2::4] << 4)
          | (codes[:, 3::4] << 6)).astype(np.uint8)
    pk = hpack_bytes(pk)
    K = 4
    C = mrow_width(K)
    mrow = rng.random((m_loc, C), dtype=np.float32)
    mcol = rng.random((m_loc, 2), dtype=np.float32)
    eps = rng.random((4, nb), dtype=np.float32)
    mask = np.ones((4, nb), np.float32)
    return (jnp.asarray(pk), jnp.asarray(eps), jnp.asarray(mrow),
            jnp.asarray(mcol), jnp.asarray(mask))


def timeit(fn, args, k=12, reps=3):
    f = jax.jit(lambda *a: fn(*a))
    out = f(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(k):
            out = f(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / k)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=100_352)
    ap.add_argument("--n", type=int, default=50_000)
    ap.add_argument("--w", type=int, default=128)
    ap.add_argument("--tile", type=int, default=0)
    ap.add_argument("--windows", default="")
    ap.add_argument("--stubs", default="empty,no_gram,no_recur,full")
    args = ap.parse_args()

    w = args.w
    pk, eps, mrow, mcol, mask = build(args.m, args.n, w)
    n_windows = args.m // w
    print(f"# M={args.m} N={args.n} (NB={pk.shape[1]}) "
          f"W={w} -> {n_windows} windows, backend={jax.default_backend()}")

    def run(stub="", window=w, tile=0):
        def fn(pk_, eps_, mrow_, mcol_):
            e, o = sweep_exact(pk_, eps_, mrow_, mcol_, 0.5, float(args.n - 1),
                               window=window, n_mix=4, complete=True,
                               ind_mask4=mask, stub=stub, tile_bytes=tile)
            return e[0, :8], o[:8]
        return timeit(fn, (pk, eps, mrow, mcol))

    for stub in args.stubs.split(","):
        s = "" if stub == "full" else stub
        dt = run(stub=s)
        print(f"  {stub:10s}: {dt * 1e3:8.2f} ms/sweep "
              f"({dt / n_windows * 1e6:6.1f} us/window)")

    if args.windows:
        for ww in map(int, args.windows.split(",")):
            if args.m % ww:
                continue
            pk2, eps2, mrow2, mcol2, mask2 = build(args.m, args.n, ww)
            mask = mask2

            def fn(pk_, eps_, mrow_, mcol_, ww=ww):
                e, o = sweep_exact(pk_, eps_, mrow_, mcol_, 0.5,
                                   float(args.n - 1), window=ww, n_mix=4,
                                   complete=True, ind_mask4=mask2)
                return e[0, :8], o[:8]
            dt = timeit(fn, (pk2, eps2, mrow2, mcol2))
            print(f"  W={ww:4d}: {dt * 1e3:8.2f} ms/sweep "
                  f"({dt / (args.m // ww) * 1e6:6.1f} us/window, "
                  f"{dt / args.m * 1e9:5.1f} ns/marker)")


if __name__ == "__main__":
    main()
