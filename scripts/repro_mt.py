"""Standalone repro for the sweep_mt.eps compiled-vs-interpret divergence.

Drives sweep_stale_mt ONCE with fixed inputs (both paths see bit-identical
arrays) and reports per-output max-rel-err, to separate a single-invocation
Mosaic lowering issue from chain accumulation across sampler iterations.
"""
import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp


def relerr(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    d = np.abs(a - b)
    s = np.maximum(np.abs(b).max(), 1e-30)
    return d.max() / s


def main():
    print("backend:", jax.default_backend())
    from hydra_tpu.ops.sweep_kernel_mt import mt_mrow_width, sweep_stale_mt
    from hydra_tpu.ops.window_kernels import deinterleave_mt, interleave_mt
    from bench import _pack_block
    from hydra_tpu.io.plink import bed_bytes_per_marker

    rs = np.random.RandomState(3)
    M, N, T, K, W = 128, 320, 2, 4, 32
    geno = rs.binomial(2, 0.3, size=(M, N)).astype(np.uint8)
    pk = _pack_block(geno, bed_bytes_per_marker(N))
    NB = pk.shape[1]
    n_pad = 4 * NB

    eps = np.zeros((T, n_pad), np.float32)
    eps[:, :N] = rs.normal(0, 1, (T, N)).astype(np.float32)
    tm = np.zeros((T, n_pad), np.float32)
    tm[:, :N] = 1.0
    # trait-mask a few individuals on trait 1 (NaN phenotypes)
    tm[1, 5:9] = 0.0
    eps[1, 5:9] = 0.0

    C = mt_mrow_width(K, T)
    mrow = np.zeros((M, C), np.float32)
    mave = geno.mean(axis=1)
    mstd = 1.0 / np.maximum(geno.std(axis=1), 1e-3)
    for tt in range(T):
        mrow[:, 0 * T + tt] = mave
        mrow[:, 1 * T + tt] = mstd
        mrow[:, 2 * T + tt] = rs.normal(0, 0.05, M)   # bold
        mrow[:, 3 * T + tt] = rs.uniform(0, 1, M)     # u
        mrow[:, 4 * T + tt] = rs.normal(0, 1, M)      # nrm
        mrow[:, 5 * T + tt] = 1.0                     # act
    bl, bi, bs = 6 * T, (6 + K) * T, (6 + 2 * K - 1) * T
    mrow[:, bl:bl + T] = -0.7
    for j in range(K - 1):
        mrow[:, bl + (j + 1) * T: bl + (j + 2) * T] = rs.uniform(-3, -1, (M, T))
        mrow[:, bi + j * T: bi + (j + 1) * T] = rs.uniform(1e-4, 3e-4, (M, T))
        mrow[:, bs + j * T: bs + (j + 1) * T] = rs.uniform(0.01, 0.05, (M, T))
    i2se = np.full(T, 0.7, np.float32)
    dNm1 = np.full(T, float(N - 1), np.float32)

    eps_t = deinterleave_mt(jnp.asarray(eps.T))   # expects (n_pad, T)
    tm_t = deinterleave_mt(jnp.asarray(tm.T))

    def run(interp, complete):
        f = jax.jit(lambda p, e, m_, r: sweep_stale_mt(
            p, e, m_, r, jnp.asarray(i2se), jnp.asarray(dNm1),
            window=W, n_mix=K, n_traits=T, complete=complete,
            interpret=interp))
        e, o = f(jnp.asarray(pk), eps_t, tm_t, jnp.asarray(mrow))
        return np.asarray(e), np.asarray(o)

    def run_with(mrow_np, interp, complete):
        f = jax.jit(lambda p, e, m_, r: sweep_stale_mt(
            p, e, m_, r, jnp.asarray(i2se), jnp.asarray(dNm1),
            window=W, n_mix=K, n_traits=T, complete=complete,
            interpret=interp))
        e, o = f(jnp.asarray(pk), eps_t, tm_t, jnp.asarray(mrow_np))
        return np.asarray(e), np.asarray(o)

    # NumPy f64 reference of the pure axpy with act=0 (bnew=0, compf=0,
    # c1 = bold*mstd deterministic): eps' = eps + sum_w c1.g + c2.m
    def axpy_ref(mrow_np):
        g = geno.astype(np.float64)
        gm = np.ones_like(g)
        e = np.zeros((T, n_pad))
        e[:, :N] = eps[:, :N]
        for tt in range(T):
            c1 = (mrow_np[:, 2 * T + tt] * mrow_np[:, 1 * T + tt]
                  ).astype(np.float64)
            c2 = -c1 * mrow_np[:, 0 * T + tt].astype(np.float64)
            d = c1 @ g + c2 @ gm                      # (N,)
            e[tt, :N] += d * tm[tt, :N]
        return e

    for complete in (False, True):
        ec, oc = run(False, complete)
        ei, oi = run(True, complete)
        print(f"complete={complete}: eps rel-err {relerr(ec, ei):.3e}, "
              f"bnew {relerr(oc[:, :T], oi[:, :T]):.3e}, "
              f"comp {relerr(oc[:, T:], oi[:, T:]):.3e}")

    # ---- case B: act=0 -> deterministic c1, isolates the axpy dots ----
    mrow_b = mrow.copy()
    mrow_b[:, 5 * T:6 * T] = 0.0                      # act=0
    ref = axpy_ref(mrow_b)
    for complete in (False, True):
        ec, _ = run_with(mrow_b, False, complete)
        ei, _ = run_with(mrow_b, True, complete)
        from hydra_tpu.ops.window_kernels import interleave_mt
        ecn = np.asarray(interleave_mt(jnp.asarray(ec), T)).T  # (T, n_pad)
        ein = np.asarray(interleave_mt(jnp.asarray(ei), T)).T
        print(f"B complete={complete}: c-vs-i {relerr(ec, ei):.3e}, "
              f"c-vs-np {relerr(ecn[:, :N], ref[:, :N]):.3e}, "
              f"i-vs-np {relerr(ein[:, :N], ref[:, :N]):.3e}")


if __name__ == "__main__":
    main()
