"""Split the flagship-config sweep into kernel vs XLA-glue time on hardware.

Times, at M=10K x N=5K W=64 (the driver bench config):
  A. full sampler run_steps (k sweeps fused)          -> ms/sweep (reference)
  B. bare mega-kernel scan (sweep_stale only, eps carried) -> kernel ms/sweep
  C. glue-only scan (everything run_steps does per sweep EXCEPT the kernel)
     approximated by the big pieces: perm+gathers+mrow build+scatters

A - B ~= glue cost; C cross-checks which glue piece dominates.

Usage: timeout 900 python scripts/profile_sweep.py [--m 10000 --n 5000 -w 64]
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=3, k=100):
    float(fn(*args))  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(out)  # host fetch fences the tunnel (block_until_ready doesn't)
        best = min(best, (time.perf_counter() - t0))
    return best / k * 1e3  # ms per sweep


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=10000)
    ap.add_argument("--n", type=int, default=5000)
    ap.add_argument("-w", "--window", type=int, default=64)
    ap.add_argument("-k", type=int, default=100)
    args = ap.parse_args()
    M, N, W, k = args.m, args.n, args.window, args.k

    import sys as _sys
    _sys.path.insert(0, ".")
    from bench import _pack_block
    from hydra_tpu.io.plink import bed_bytes_per_marker
    from hydra_tpu.ops.sweep_kernel import mrow_width, sweep_stale
    from hydra_tpu.ops.window_kernels import deinterleave, interleave

    rs = np.random.RandomState(0)
    geno = rs.binomial(2, 0.3, size=(M, N)).astype(np.uint8)
    from hydra_tpu.ops.decode import hpack_bytes
    packed = jnp.asarray(hpack_bytes(_pack_block(geno, bed_bytes_per_marker(N))))
    NB = packed.shape[1]
    n_pad = NB * 4
    K = 4
    eps = jnp.asarray(
        np.concatenate([rs.normal(0, 1, N), np.zeros(n_pad - N)]).astype(np.float32))
    ind_mask = jnp.asarray((np.arange(n_pad) < N).astype(np.float32))
    mrow = jnp.asarray(rs.normal(0, 0.1, (M, mrow_width(K))).astype(np.float32))
    # make draw sane: u in (0,1), act=1, mave/mstd positive
    mrow = mrow.at[:, 0].set(0.6).at[:, 1].set(1.0).at[:, 3].set(0.5).at[:, 5].set(1.0)
    key = jax.random.PRNGKey(0)

    # ---- B: bare kernel scan (at several window sizes: the W-scaling
    # separates per-window fixed cost — grid steps, draw — from the
    # W-independent per-byte decode/compute cost) ----
    def make_kernel_only(w):
        # pad M to a multiple of w like the sampler does (zero mrow rows
        # have act=0 and bold=0, so the padded markers are exact no-ops)
        m_pad = -(-M // w) * w
        pk_p = jnp.concatenate(
            [packed, jnp.full((m_pad - M, NB), 0xFF, jnp.uint8)]
        ) if m_pad != M else packed
        mrow_p = jnp.concatenate(
            [mrow, jnp.zeros((m_pad - M, mrow.shape[1]), jnp.float32)]
        ) if m_pad != M else mrow

        @jax.jit
        def kernel_only(eps0, packed):
            del packed
            def step(carry, _):
                eps_d = carry
                eps_new, out = sweep_stale(
                    pk_p, eps_d, mrow_p, jnp.float32(0.5),
                    jnp.float32(float(N - 1)), window=w, n_mix=K,
                    complete=True, ind_mask4=deinterleave(ind_mask))
                return eps_new, jnp.sum(out[:, 0])
            eps_fin, outs = jax.lax.scan(step, deinterleave(eps0), None,
                                         length=k)
            return jnp.sum(eps_fin) + jnp.sum(outs)
        return kernel_only
    kernel_only = make_kernel_only(W)

    # ---- C1: shuffle-gather glue only ----
    @jax.jit
    def gather_only(eps0, packed):
        def step(carry, i):
            acc = carry
            perm = jax.random.permutation(jax.random.fold_in(key, i), M)
            pk_shuf = jnp.take(packed, perm, axis=0)
            mrow_s = jnp.take(mrow, perm, axis=0)
            return acc + jnp.float32(pk_shuf[0, 0]) + mrow_s[0, 0], None
        acc, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(k))
        return acc

    # ---- C2: per-marker RNG glue only ----
    @jax.jit
    def rng_only(eps0):
        def step(carry, i):
            kk = jax.random.fold_in(key, i)
            u = jax.random.uniform(jax.random.fold_in(kk, 1), (M,))
            n = jax.random.normal(jax.random.fold_in(kk, 2), (M,))
            return carry + u[0] + n[0], None
        acc, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(k))
        return acc

    # ---- C3: scatter-back + segment-sum glue ----
    @jax.jit
    def scatter_only(eps0):
        beta = jnp.zeros((M,), jnp.float32)
        groups = jnp.zeros((M,), jnp.int32)
        def step(carry, i):
            b = carry
            perm = jax.random.permutation(jax.random.fold_in(key, i), M)
            vals = jnp.take(b, perm) + 1e-6
            b = b.at[perm].set(vals)
            cass = jax.ops.segment_sum(vals, groups * K, num_segments=K)
            return b, jnp.sum(cass)
        b, c = jax.lax.scan(step, beta, jnp.arange(k))
        return jnp.sum(b) + jnp.sum(c)

    print(f"# config M={M} N={N} W={W} k={k} backend={jax.default_backend()}")
    runs = [("B kernel-only", kernel_only, (eps, packed))]
    for w2 in (128, 256):
        if w2 != W:
            runs.append((f"B kernel W={w2}", make_kernel_only(w2),
                         (eps, packed)))
    runs += [
        ("C1 shuffle-gather", gather_only, (eps, packed)),
        ("C2 per-marker RNG", rng_only, (eps,)),
        ("C3 scatter+segsum", scatter_only, (eps,))]
    for name, fn, fargs in runs:
        ms = timeit(fn, *fargs, k=k)
        print(f"{name:20s} {ms:8.3f} ms/sweep", flush=True)

    # ---- A: full sampler (same construction as bench.py) ----
    from bench import make_problem
    from hydra_tpu.parallel.mesh import make_mesh
    from hydra_tpu.samplers.bayesrrm import BayesRRm
    ds = make_problem(M, N)
    smp = BayesRRm(ds, window=W, exact=False, seed=11, mesh=make_mesh(1))
    st = smp.init_state()
    st = smp.run_steps(st, 0, k)[0]
    float(jnp.sum(st.eps))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        st = smp.run_steps(st, 1, k)[0]
        float(jnp.sum(st.eps))
        best = min(best, time.perf_counter() - t0)
    print(f"{'A full sampler':20s} {best / k * 1e3:8.3f} ms/sweep", flush=True)


if __name__ == "__main__":
    main()
