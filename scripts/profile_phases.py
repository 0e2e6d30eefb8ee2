"""Phase attribution + tile-size sweep for the whole-sweep mega kernel.

VERDICT r3 #2: the STATUS roofline predates the h-decode kernels (it was
derived from 11-15 VPU ops/genotype; the current complete-data decode is
3 ops/plane) and nothing attributes the measured per-window time to a
resource. This script measures both, on hardware, with the REAL
sweep_stale launch path:

1. Tile-size sweep: time the full kernel at every VMEM-feasible byte
   tile. The grid has 2 * NB/tb steps per window and each Mosaic grid
   step carries a fixed cost (~1.4 us measured at 512-byte tiles), so
   per-window time vs n_steps fits a line whose intercept is the true
   compute+DMA cost and whose slope is the per-step overhead.

2. Phase stubs at a fixed tile: cumulative kernel variants (empty ->
   stats-only -> stats+axpy -> full) timed by monkeypatching the module
   kernel body under sweep_stale's own wrapper (the partial resolves the
   module global at trace time). Deltas attribute the window to
   step+DMA floor / stats (decode+reduce) / axpy (decode+MXU) / draw.
   NOTE: Mosaic DMAs every BlockSpec'd operand regardless of whether the
   body reads it, so the "empty" variant measures grid overhead PLUS the
   packed-byte HBM->VMEM streams — the glue floor, not zero.

Timing uses random packed bytes (timing is data-independent on VPU/MXU;
crumb value 3 decodes to a finite h, no NaNs) and bench.py's fused
k-sweep dispatch pattern (the tunneled backend costs ~25 ms per
dispatch+fetch).

Usage:
  python scripts/profile_phases.py [--m 100352] [--n 50000] [--window 256]
      [--device cpu] [--sweeps 20] [--blocks 5] [--wide]
"""

import argparse
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=100352)        # 256 * 392
    ap.add_argument("--n", type=int, default=50000)
    ap.add_argument("--window", type=int, default=256)
    ap.add_argument("--device", default="")
    ap.add_argument("--sweeps", type=int, default=20)
    ap.add_argument("--blocks", type=int, default=5)
    ap.add_argument("--tiles", default="",
                    help="comma-separated tile sizes (default: divisors)")
    ap.add_argument("--skip-stubs", action="store_true")
    ap.add_argument("--interpret", action="store_true",
                    help="interpret-mode smoke (CPU correctness of the "
                         "harness, not a timing run)")
    args = ap.parse_args()

    import jax
    if args.device:
        jax.config.update("jax_platforms", args.device)
    import jax.numpy as jnp
    from hydra_tpu.data.genotypes import pad_individuals
    import hydra_tpu.ops.sweep_kernel as sk
    from hydra_tpu.ops.sweep_kernel import mrow_width, sweep_stale
    from jax.experimental import pallas as pl

    f32 = jnp.float32
    interp = args.interpret
    M, N, W = args.m, args.n, args.window
    K = 3                      # mixture components incl. zero (example grid)
    n_pad = pad_individuals(N)
    NB = n_pad // 4
    rng = np.random.default_rng(7)

    print(f"# M={M} N={N} (n_pad={n_pad}, NB={NB}) W={W} K={K}",
          file=sys.stderr, flush=True)
    pk = rng.integers(0, 256, (M, NB), dtype=np.uint8)
    # plane-major residual and pad-lane mask
    eps0 = rng.standard_normal((4, NB)).astype(np.float32)
    mask4 = np.zeros((4, NB), np.float32)
    flat = np.zeros(n_pad, np.float32)
    flat[:N] = 1.0
    mask4[:] = flat.reshape(NB, 4).T
    # mrow with draw-realistic magnitudes (finite exp args)
    C = mrow_width(K)
    mrow_np = np.zeros((M, C), np.float32)
    mrow_np[:, 0] = rng.uniform(0.05, 1.9, M)        # mave
    mrow_np[:, 1] = 1.0 / rng.uniform(0.3, 1.4, M)   # mstd
    mrow_np[:, 2] = 0.0                              # beta_old
    mrow_np[:, 3] = rng.uniform(0, 1, M)             # u
    mrow_np[:, 4] = rng.standard_normal(M)           # nrm
    mrow_np[:, 5] = 1.0                              # act
    mrow_np[:, 6:6 + K] = -1.0                       # logl_static
    mrow_np[:, 6 + K:6 + 2 * K - 1] = 1e-5           # inv_denomk
    mrow_np[:, 6 + 2 * K - 1:] = 1e-2                # sd_k
    i2se = np.float32(1e-5)
    dnm1 = np.float32(N - 1)

    pk_d = jax.device_put(pk)
    eps_d0 = jax.device_put(eps0)
    mrow_d = jax.device_put(mrow_np)
    mask_d = jax.device_put(mask4)
    jax.block_until_ready(pk_d)

    def timed(tb, label):
        # big arrays ride as ARGUMENTS: closed-over device constants made
        # the lowered MLIR scale with M and broke remote compiles (r2)
        @jax.jit
        def ksweeps(pk_a, eps_d, mrow_a, mask_a):
            def body(carry, _):
                eps_new, out = sweep_stale(
                    pk_a, carry, mrow_a, i2se, dnm1, window=W, n_mix=K,
                    complete=True, ind_mask4=mask_a, tile_bytes=tb,
                    interpret=interp)
                return eps_new, jnp.sum(out[:, 0])
            eps_f, outs = jax.lax.scan(body, eps_d, None,
                                       length=args.sweeps)
            return eps_f, outs
        t0 = time.time()
        eps_f, outs = ksweeps(pk_d, eps_d0, mrow_d, mask_d)
        jax.block_until_ready(outs)
        compile_s = time.time() - t0
        blocks = []
        for _ in range(args.blocks):
            t0 = time.time()
            eps_f, outs = ksweeps(pk_d, eps_d0, mrow_d, mask_d)
            float(jnp.sum(outs))
            blocks.append(time.time() - t0)
        per_sweep = float(np.median(blocks)) / args.sweeps
        nw = M // W
        n_steps = 2 * (NB // tb)
        print(f"{label:28s} tb={tb:6d} steps/win={n_steps:3d} "
              f"sweep={per_sweep * 1e3:8.2f} ms  "
              f"window={per_sweep / nw * 1e6:7.1f} us  "
              f"(compile {compile_s:.0f} s)", flush=True)
        return per_sweep / nw

    # ---- 1. tile-size sweep on the full kernel ----
    if args.tiles:
        tiles = [int(t) for t in args.tiles.split(",")]
    else:
        # divisors of NB that are 128-multiples, smallest feasible count
        tiles = [d for d in range(128, NB + 1, 128) if NB % d == 0]
        # keep pk32+planes VMEM plausible: W * tb * (1 + 4 + 4) <= ~14 MB
        tiles = [t for t in tiles if W * t * 9 <= 14 * 2 ** 20]
        if len(tiles) > 6:
            tiles = tiles[:: max(1, len(tiles) // 6)][-6:]
    print(f"# tile sweep: {tiles}", flush=True)
    results = {}
    for tb in tiles:
        try:
            results[tb] = timed(tb, "full")
        except Exception as e:  # noqa: BLE001 — VMEM overflow is expected
            print(f"full tb={tb}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:120]})", flush=True)
    if len(results) >= 2:
        xs = np.array([2 * (NB // tb) for tb in results])
        ys = np.array([results[tb] for tb in results])
        slope, intercept = np.polyfit(xs, ys, 1)
        print(f"# fit: per-step overhead {slope * 1e6:.2f} us, "
              f"compute+DMA intercept {intercept * 1e6:.1f} us/window",
              flush=True)

    if args.skip_stubs or not results:
        return
    tb = min(results, key=results.get)
    print(f"# phase stubs at best tile tb={tb}", flush=True)

    real_kernel = sk._sweep_kernel

    def stub(mode):
        def kern(Kk, n_tiles, complete, PREC, pk_ref, mrow_ref, eps_in_ref,
                 mask_ref, sc_ref, out_ref, eps_ref, s1_s, s2_s, c_s,
                 csum_s):
            w = pl.program_id(0)
            ph = pl.program_id(1)
            t = pl.program_id(2)

            @pl.when((w == 0) & (ph == 0))
            def _():
                eps_ref[t] = eps_in_ref[t]
                if mode >= 2:   # defined axpy coefficients, draw stubbed
                    c_s[:, :] = jnp.zeros_like(c_s)
                    csum_s[:, :] = jnp.zeros_like(csum_s)

            if mode == 0:       # empty: grid + DMA floor
                return
            pk32 = pk_ref[:, :].astype(jnp.int32)

            @pl.when(ph == 0)
            def _stats():
                @pl.when(t == 0)
                def _():
                    s1_s[:, :] = jnp.zeros_like(s1_s)
                    s2_s[:, :] = jnp.zeros_like(s2_s)
                et = eps_ref[t]
                s1 = None
                s2 = None
                for k in range(4):
                    e = et[k:k + 1, :]
                    g = sk._decode_h_int(pk32, k)
                    a = jnp.sum(g * e, axis=1, keepdims=True)
                    b = jnp.sum(e).reshape(1, 1)
                    s1 = a if s1 is None else s1 + a
                    s2 = b if s2 is None else s2 + b
                s1_s[:, :] += s1
                s2_s[0:1, 0:1] += s2

            if mode >= 2:       # + axpy (decode + MXU dots), no draw
                @pl.when(ph == 1)
                def _axpy():
                    c1h = c_s[0:1, :]
                    c1l = c_s[1:2, :]
                    for k in range(4):
                        h = sk._decode_h_int(pk32, k)
                        d = (csum_s[0:1, 0:1]
                             - jnp.dot(c1h, h, preferred_element_type=f32)
                             - jnp.dot(c1l, h, preferred_element_type=f32))
                        eps_ref[t, k:k + 1, :] += d * mask_ref[t, k:k + 1, :]
        return kern

    names = {0: "V0 empty (grid+DMA)", 1: "V1 +stats (decode+reduce)",
             2: "V2 +axpy (decode+MXU)"}
    phase = {}
    try:
        for mode in (0, 1, 2):
            sk._sweep_kernel = lambda *a, _m=mode: stub(_m)(*a)
            phase[mode] = timed(tb, names[mode])
    finally:
        sk._sweep_kernel = real_kernel
    full = results[tb]
    if len(phase) == 3:
        print(f"# attribution (us/window): grid+DMA {phase[0] * 1e6:.1f} | "
              f"stats {(phase[1] - phase[0]) * 1e6:.1f} | "
              f"axpy {(phase[2] - phase[1]) * 1e6:.1f} | "
              f"draw {(full - phase[2]) * 1e6:.1f} | full {full * 1e6:.1f}",
              flush=True)


if __name__ == "__main__":
    main()
