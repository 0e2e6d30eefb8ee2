"""Phase attribution of the per-window sweep cost (VERDICT r3 item 2).

Measures, on the real chip, a ladder of Pallas kernels over the SAME window
schedule so each step isolates one phase of the production kernels:

  byteread   read the packed tile, widen u8->i32, one lane reduce
             (HBM stream + widen floor — no decode)
  decode     + decode all 4 h-planes (3 ops each), reduce sum(g)
             (the pure decode increment)
  stats      the real window_stats kernel (complete data: decode + e-mult
             + lane reduce)
  axpy       the real window_axpy kernel (decode + bf16-split MXU vecmat)
  stats+axpy both chained with the eps carry (per-window compute path)
  full sweep sampler.step reference point (mega kernel when gated on)

Each variant runs as ONE jitted lax.scan over all windows (the tunnel costs
~25 ms/dispatch; per-window numbers divide by the window count), repeated
with the median taken.

Usage: python scripts/profile_phases.py [--m 20480] [--n 50000] [--window 256]
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, reps=5):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=20_480)
    ap.add_argument("--n", type=int, default=50_000)
    ap.add_argument("--window", type=int, default=256)
    ap.add_argument("--problem-cache", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from bench import load_or_make_problem
    from hydra_tpu.ops.decode import hpack_bytes
    from hydra_tpu.ops.window_kernels import (_auto_tile, _decode_h_int,
                                              window_axpy, window_stats)
    from hydra_tpu.parallel.mesh import make_mesh
    from hydra_tpu.samplers.bayesrrm import BayesRRm

    f32 = jnp.float32
    ds = load_or_make_problem(args.m, args.n, args.problem_cache)
    W = args.window
    sampler = BayesRRm(ds, window=W, exact=False, seed=11, mesh=make_mesh(1))
    assert sampler.cfg.complete, "phase ladder assumes complete data"
    packed = sampler.packed  # h-packed device bytes
    M, NB = packed.shape
    nw = M // W
    tb = _auto_tile(NB, W, 3.0)
    print(f"# M={M} NB={NB} windows={nw} W={W} tile={tb} "
          f"({NB // tb} grid steps/window)", flush=True)

    # --- probe kernels (same grid/tiling as the production stats kernel) ---
    def probe_call(kern):
        grid_spec = pl.GridSpec(
            grid=(NB // tb,),
            in_specs=[pl.BlockSpec((W, tb), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((W, 1), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(kern, grid_spec=grid_spec,
                              out_shape=jax.ShapeDtypeStruct((W, 1), f32))

    def byteread_kernel(pk_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:, :] = jnp.zeros_like(out_ref)
        pk32 = pk_ref[:, :].astype(jnp.int32)
        out_ref[:, :] += jnp.sum(pk32, axis=1, keepdims=True).astype(f32)

    def decode_kernel(pk_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:, :] = jnp.zeros_like(out_ref)
        pk32 = pk_ref[:, :].astype(jnp.int32)
        acc = None
        for k in range(4):
            h = _decode_h_int(pk32, k)
            a = jnp.sum(h, axis=1, keepdims=True)
            acc = a if acc is None else acc + a
        out_ref[:, :] += acc

    byteread = probe_call(byteread_kernel)
    decode = probe_call(decode_kernel)

    def scan_probe(call):
        @jax.jit
        def run():
            def body(acc, w):
                pk = jax.lax.dynamic_slice(packed, (w * W, 0), (W, NB))
                return acc + jnp.sum(call(pk)), None
            acc, _ = jax.lax.scan(body, f32(0), jnp.arange(nw))
            return acc
        return run

    mave = sampler.mave
    mstd = sampler.mstd
    eps0 = jnp.zeros((4, NB), f32)
    n_real = ds.geno.n

    @jax.jit
    def stats_scan(eps_d):
        def body(acc, w):
            pk = jax.lax.dynamic_slice(packed, (w * W, 0), (W, NB))
            mv = jax.lax.dynamic_slice(mave, (w * W,), (W,))
            ms = jax.lax.dynamic_slice(mstd, (w * W,), (W,))
            s1, _, _ = window_stats(pk, eps_d, mv, ms, False, complete=True,
                                    n_real=n_real)
            return acc + jnp.sum(s1), None
        acc, _ = jax.lax.scan(body, f32(0), jnp.arange(nw))
        return acc

    @jax.jit
    def axpy_scan(eps_d):
        def body(eps_d, w):
            pk = jax.lax.dynamic_slice(packed, (w * W, 0), (W, NB))
            c1 = jnp.full((W,), 1e-7, f32)
            d = window_axpy(pk, c1, -c1, complete=True)
            return eps_d + d, None
        eps_d, _ = jax.lax.scan(body, eps_d, jnp.arange(nw))
        return eps_d

    @jax.jit
    def stats_axpy_scan(eps_d):
        def body(eps_d, w):
            pk = jax.lax.dynamic_slice(packed, (w * W, 0), (W, NB))
            mv = jax.lax.dynamic_slice(mave, (w * W,), (W,))
            ms = jax.lax.dynamic_slice(mstd, (w * W,), (W,))
            s1, _, _ = window_stats(pk, eps_d, mv, ms, False, complete=True,
                                    n_real=n_real)
            c1 = s1 * 1e-9
            d = window_axpy(pk, c1, -c1 * mv, complete=True)
            return eps_d + d, None
        eps_d, _ = jax.lax.scan(body, eps_d, jnp.arange(nw))
        return eps_d

    rows = []
    for name, fn, fargs in [("byteread", scan_probe(byteread), ()),
                            ("decode", scan_probe(decode), ()),
                            ("stats", stats_scan, (eps0,)),
                            ("axpy", axpy_scan, (eps0,)),
                            ("stats+axpy", stats_axpy_scan, (eps0,))]:
        t = timeit(fn, *fargs)
        rows.append((name, t))
        print(f"{name:12s}: {t * 1e3:8.2f} ms/sweep  "
              f"{t / nw * 1e6:8.1f} us/window", flush=True)

    state = sampler.init_state()
    state, _ = sampler.step(state, 0)
    jax.block_until_ready(state.eps)
    ts = []
    for it in range(1, 6):
        t0 = time.time()
        state, _ = sampler.step(state, it)
        jax.block_until_ready(state.eps)
        ts.append(time.time() - t0)
    t = float(np.median(ts))
    print(f"{'full sweep':12s}: {t * 1e3:8.2f} ms/sweep  "
          f"{t / nw * 1e6:8.1f} us/window "
          f"(mega={sampler.cfg.use_mega})", flush=True)


if __name__ == "__main__":
    main()
