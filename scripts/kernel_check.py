"""Compiled-kernel hardware check (run each round on the real chip).

CI tests the Pallas kernels in interpret mode on CPU only; one bad Mosaic
relayout would pass CI. This runs every kernel COMPILED on the live backend
against the XLA/jnp decode path and asserts agreement — the on-hardware
counterpart of tests/test_window_kernels.py and test_gibbs_kernel.py.

Usage: python scripts/kernel_check.py [--w 64] [--nb 2048] [--tol 1e-4]
Exits non-zero on any mismatch; prints one PASS line per kernel.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--w", type=int, default=64)
    ap.add_argument("--nb", type=int, default=2048)   # bytes => N = 4*nb
    ap.add_argument("--tol", type=float, default=1e-4)
    ap.add_argument("--device", default="")
    args = ap.parse_args()

    import jax
    if args.device:
        jax.config.update("jax_platforms", args.device)
    import jax.numpy as jnp
    from hydra_tpu.ops.decode import decode_planes, hpack_bytes
    from hydra_tpu.ops.gibbs_kernel import window_gibbs
    from hydra_tpu.ops.window_kernels import (
        deinterleave, interleave, window_axpy, window_level_sums, window_stats)

    print(f"INFO   : backend = {jax.default_backend()}, "
          f"device = {jax.devices()[0]}", flush=True)
    W, NB = args.w, args.nb
    N = 4 * NB
    rs = np.random.RandomState(3)
    packed = jnp.asarray(rs.randint(0, 256, (W, NB), dtype=np.uint8))
    # kernels consume the H-PACKED device format; the jnp golden path
    # decodes the original PLINK bytes
    packed_hp = jnp.asarray(hpack_bytes(np.asarray(packed)))
    eps = jnp.asarray(rs.randn(N).astype(np.float32))
    mave = jnp.asarray(rs.uniform(0.2, 1.8, W).astype(np.float32))
    mstd = jnp.asarray(rs.uniform(0.5, 2.0, W).astype(np.float32))

    # jnp reference path — force true-f32 matmuls: XLA's DEFAULT matmul
    # precision on TPU rounds inputs to bf16, which would put ~3e-3 of
    # error in the REFERENCE (observed; the fused kernel was right).
    hi = jax.lax.Precision.HIGHEST
    G, Mk = decode_planes(packed, jnp.float32)
    xt = (G - mave[:, None] * Mk) * mstd[:, None]
    s1_ref = jnp.matmul(G, eps, precision=hi)
    s2_ref = jnp.matmul(Mk, eps, precision=hi)
    gram_ref = jnp.matmul(xt, xt.T, precision=hi)

    fails = 0

    def check(name, got, ref, tol=args.tol):
        nonlocal fails
        got, ref = np.asarray(got), np.asarray(ref)
        scale = max(1.0, float(np.abs(ref).max()))
        err = float(np.abs(got - ref).max()) / scale
        ok = err <= tol
        fails += 0 if ok else 1
        print(f"{'PASS' if ok else 'FAIL'}   : {name:<22s} rel-err = {err:.2e}",
              flush=True)

    s1, s2, gram = jax.jit(
        lambda p, e, a, s: window_stats(p, deinterleave(e), a, s, True)
    )(packed_hp, eps, mave, mstd)
    check("window_stats.s1", s1, s1_ref)
    check("window_stats.s2", s2, s2_ref)
    check("window_stats.gram", gram, gram_ref)

    c1 = jnp.asarray(rs.randn(W).astype(np.float32) * 0.1)
    c2 = jnp.asarray(rs.randn(W).astype(np.float32) * 0.1)
    de = jax.jit(lambda p, a, b: interleave(window_axpy(p, a, b)))(packed_hp, c1, c2)
    check("window_axpy", de, c1 @ G + c2 @ Mk)

    vi = jnp.abs(eps) + 0.1
    l1, l2, lm = jax.jit(
        lambda p, v: window_level_sums(p, deinterleave(v))
    )(packed_hp, vi)
    check("level_sums.s1", l1, ((G == 1.0) & (Mk == 1.0)).astype(np.float32) @ vi)
    check("level_sums.s2", l2, ((G == 2.0) & (Mk == 1.0)).astype(np.float32) @ vi)
    check("level_sums.sm", lm, Mk @ vi)

    # complete-data fast paths (no missing codes): rewrite 01 -> 00 host-side
    pk_np = np.asarray(packed)
    comp = np.zeros_like(pk_np)
    for shift in (0, 2, 4, 6):
        code = (pk_np >> shift) & 0b11
        comp |= np.where(code == 0b01, 0b00, code).astype(np.uint8) << shift
    pkc = jnp.asarray(hpack_bytes(comp))
    Gc, _ = decode_planes(jnp.asarray(comp), jnp.float32)   # PLINK golden
    s1c, s2c, _ = jax.jit(
        lambda p, e, a, s: window_stats(p, deinterleave(e), a, s, False,
                                        complete=True)
    )(pkc, eps, mave, mstd)
    assert s2c is None
    check("stats.complete.s1", s1c, jnp.matmul(Gc, eps, precision=hi))
    dec = jax.jit(lambda p, a, b: interleave(
        window_axpy(p, a, b, complete=True) + jnp.sum(b)))(pkc, c1, c2)
    check("axpy.complete", dec,
          jnp.matmul(c1, Gc, precision=hi) + jnp.sum(c2))
    lc1, lc2, lcm = jax.jit(
        lambda p, v: window_level_sums(p, deinterleave(v), complete=True)
    )(pkc, vi)
    assert lcm is None
    check("levels.complete.s1", lc1,
          jnp.matmul((Gc == 1.0).astype(np.float32), vi, precision=hi))
    check("levels.complete.s2", lc2,
          jnp.matmul((Gc == 2.0).astype(np.float32), vi, precision=hi))

    # cached decoded-plane kernels (ops/planes.py) vs the same golden dots
    from hydra_tpu.ops.planes import (build_planes_host,
                                      window_axpy_planes,
                                      window_stats_planes)
    planes = jnp.asarray(build_planes_host(comp))
    ef = jax.jit(lambda e: deinterleave(e).reshape(1, -1))(eps)
    s1p = jax.jit(window_stats_planes)(planes, ef)
    check("planes.stats.s1", s1p, jnp.matmul(Gc, eps, precision=hi))
    dep = jax.jit(lambda p, a: interleave(
        (window_axpy_planes(p, a)).reshape(4, -1)))(planes, c1)
    check("planes.axpy", dep, jnp.matmul(c1, Gc, precision=hi))

    # fused exact-recurrence kernel vs the jnp scan it replaces
    K = 4
    num0 = jnp.asarray(rs.randn(W).astype(np.float32))
    logl = jnp.asarray(rs.randn(W, K).astype(np.float32))
    invd = jnp.asarray(rs.uniform(1e-4, 2e-4, (W, K - 1)).astype(np.float32))
    sdk = jnp.asarray(rs.uniform(0.01, 0.05, (W, K - 1)).astype(np.float32))
    u = jnp.asarray(rs.uniform(0, 1, W).astype(np.float32))
    nrm = jnp.asarray(rs.randn(W).astype(np.float32))
    act = jnp.ones(W, jnp.float32)
    bold = jnp.asarray(rs.randn(W).astype(np.float32) * 0.01)
    i2se = jnp.float32(0.7)
    gram_j = jnp.asarray(gram_ref)

    def jnp_scan(gram, num0):
        def step(corr, j):
            num_j = num0[j] + corr[j]
            muk = num_j * invd[j]
            logL = jnp.concatenate([logl[j, :1], logl[j, 1:] + muk * num_j * i2se])
            pr = jnp.exp(logL - jnp.max(logL))
            probs = pr / jnp.sum(pr)
            comp = jnp.minimum(jnp.sum((u[j] > jnp.cumsum(probs)).astype(jnp.int32)), K - 1)
            ksel = jnp.maximum(comp - 1, 0)
            bnew = jnp.where(comp > 0, muk[ksel] + nrm[j] * sdk[j, ksel], 0.0)
            db = bold[j] - bnew
            corr = corr + db * gram[:, j]
            return corr, (db, bnew, comp, probs[0])
        _, ys = jax.lax.scan(step, jnp.zeros(W, jnp.float32), jnp.arange(W))
        return ys

    db_ref, b_ref, c_ref, a_ref = jax.jit(jnp_scan)(gram_j, num0)
    db, b, c, a = jax.jit(
        lambda *xs: window_gibbs(*xs)
    )(gram_j, num0, logl, invd, sdk, u, nrm, act, bold, i2se)
    check("window_gibbs.dbeta", db, db_ref)
    check("window_gibbs.beta", b, b_ref)
    check("window_gibbs.comp", c.astype(np.float32), np.asarray(c_ref, np.float32), tol=0)
    check("window_gibbs.acum", a, a_ref)

    # multi-trait fused kernels (BayesRRm-mt): shared decode, batched RHS
    from hydra_tpu.ops.window_kernels import (
        deinterleave_mt, interleave_mt, window_axpy_mt, window_stats_mt)

    T = 3
    eps_mt = jnp.asarray(rs.randn(N, T).astype(np.float32))
    m1, m2 = jax.jit(
        lambda p, e: window_stats_mt(p, deinterleave_mt(e), T)
    )(packed_hp, eps_mt)
    check("stats_mt.s1", m1, jnp.matmul(G, eps_mt, precision=hi))
    check("stats_mt.s2", m2, jnp.matmul(Mk, eps_mt, precision=hi))

    c1m = jnp.asarray(rs.randn(T, W).astype(np.float32) * 0.1)
    c2m = jnp.asarray(rs.randn(T, W).astype(np.float32) * 0.1)
    dem = jax.jit(lambda p, a, b: interleave_mt(window_axpy_mt(p, a, b), T)
                  )(packed_hp, c1m, c2m)
    check("axpy_mt", dem,
          jnp.matmul(G.T, c1m.T, precision=hi)
          + jnp.matmul(Mk.T, c2m.T, precision=hi))

    # whole-sweep mega-kernel vs a NumPy window-by-window emulation
    from hydra_tpu.io.plink import decode_bed_numpy
    from hydra_tpu.ops.sweep_kernel import mrow_width, sweep_stale
    from hydra_tpu.ops.window_kernels import deinterleave, interleave

    Kmix = 4
    n_win = 4
    m_loc = n_win * W
    pk_np = rs.randint(0, 256, (m_loc, NB), dtype=np.uint8)
    eps0 = rs.randn(N).astype(np.float32)
    cols = {
        "mave": rs.uniform(0.2, 1.8, m_loc), "mstd": rs.uniform(0.5, 2.0, m_loc),
        "bold": rs.randn(m_loc) * 0.01, "u": rs.uniform(0, 1, m_loc),
        "nrm": rs.randn(m_loc), "act": (rs.uniform(0, 1, m_loc) > 0.1),
    }
    logl = np.column_stack([np.full(m_loc, -0.7)]
                           + [rs.uniform(-3, -1, m_loc) for _ in range(Kmix - 1)])
    invd = rs.uniform(1e-4, 3e-4, (m_loc, Kmix - 1))
    sdk = rs.uniform(0.01, 0.05, (m_loc, Kmix - 1))
    mrow_np = np.column_stack(
        [cols["mave"], cols["mstd"], cols["bold"], cols["u"], cols["nrm"],
         cols["act"].astype(np.float64), logl, invd, sdk]).astype(np.float32)
    assert mrow_np.shape[1] == mrow_width(Kmix)
    i2se_v, dNm1_v = 0.7, float(N - 1)

    eps_m, out_m = jax.jit(lambda p, e, r: sweep_stale(
        p, deinterleave(e), r, i2se_v, dNm1_v, window=W, n_mix=Kmix,
        complete=False))(jnp.asarray(hpack_bytes(pk_np)),
                         jnp.asarray(eps0), jnp.asarray(mrow_np))
    eps_m = np.asarray(interleave(eps_m))
    out_m = np.asarray(out_m)

    # NumPy reference: same stale-window math (draw_rows, bayesrrm.py)
    g_np, mk_np = decode_bed_numpy(pk_np, N)
    eps_r = eps0.astype(np.float64).copy()
    out_r = np.zeros((m_loc, 4))
    for w in range(n_win):
        sl = slice(w * W, (w + 1) * W)
        g, mk = g_np[sl], mk_np[sl]
        s1 = g @ eps_r
        s2 = mk @ eps_r
        mavew, mstdw = cols["mave"][sl], cols["mstd"][sl]
        boldw, uw = cols["bold"][sl], cols["u"][sl]
        nrmw, actw = cols["nrm"][sl], cols["act"][sl]
        num0 = mstdw * (s1 - mavew * s2) + boldw * dNm1_v
        muk = num0[:, None] * invd[sl]
        logL = np.column_stack(
            [logl[sl, 0], logl[sl, 1:] + muk * num0[:, None] * i2se_v])
        pr = np.exp(logL - logL.max(axis=1, keepdims=True))
        probs = pr / pr.sum(axis=1, keepdims=True)
        cum = np.cumsum(probs, axis=1)
        comp = np.minimum((uw[:, None] > cum).sum(axis=1), Kmix - 1)
        ksel = np.maximum(comp - 1, 0)
        bnz = muk[np.arange(W), ksel] + nrmw * sdk[sl][np.arange(W), ksel]
        bnew = np.where((comp > 0) & actw, bnz, 0.0)
        compv = np.where(actw, comp, 0)
        acumv = np.where(actw, probs[:, 0], 1.0)
        db = boldw - bnew
        eps_r += (db * mstdw) @ g - (db * mstdw * mavew) @ mk
        out_r[sl] = np.column_stack([bnew, compv, acumv, db])
    check("sweep_mega.eps", eps_m, eps_r, tol=5e-4)
    check("sweep_mega.beta", out_m[:, 0], out_r[:, 0], tol=5e-4)
    check("sweep_mega.comp", out_m[:, 1], out_r[:, 1], tol=0)
    check("sweep_mega.acum", out_m[:, 2], out_r[:, 2], tol=1e-4)

    # exact+complete integer-Gram stats kernel vs the f64-style golden
    xtc = (Gc - mave[:, None]) * mstd[:, None]     # mask == 1 (complete)
    s1ce, s2ce, gramce = jax.jit(
        lambda p, e, a, s: window_stats(p, deinterleave(e), a, s, True,
                                        complete=True, n_real=float(N))
    )(pkc, eps, mave, mstd)
    assert s2ce is None
    check("stats.exact_complete.s1", s1ce, jnp.matmul(Gc, eps, precision=hi))
    check("stats.exact_complete.gram", gramce,
          jnp.matmul(xtc, xtc.T, precision=hi))

    # exact-mode mega kernel: integer-Gram complete path vs the general
    # mask-dot path on the SAME (complete) data — both compiled on chip
    from hydra_tpu.ops.sweep_kernel import sweep_exact

    pkse = np.zeros_like(pk_np)
    for shift in (0, 2, 4, 6):
        code = (pk_np >> shift) & 0b11
        pkse |= np.where(code == 0b01, 0b00, code).astype(np.uint8) << shift
    pkse_hp = jnp.asarray(hpack_bytes(pkse))
    mcol_np = np.column_stack([cols["mave"], cols["mstd"]]).astype(np.float32)
    im4 = deinterleave(jnp.ones(N, jnp.float32))
    eps_g, out_g = jax.jit(lambda p, e, r, c: sweep_exact(
        p, deinterleave(e), r, c, i2se_v, dNm1_v, window=W, n_mix=Kmix,
        complete=False))(pkse_hp, jnp.asarray(eps0), jnp.asarray(mrow_np),
                         jnp.asarray(mcol_np))
    eps_c, out_c = jax.jit(lambda p, e, r, c, m: sweep_exact(
        p, deinterleave(e), r, c, i2se_v, dNm1_v, window=W, n_mix=Kmix,
        complete=True, ind_mask4=m))(pkse_hp, jnp.asarray(eps0),
                                     jnp.asarray(mrow_np),
                                     jnp.asarray(mcol_np), im4)
    check("sweep_exact.complete.eps", interleave(eps_c), interleave(eps_g),
          tol=5e-4)
    check("sweep_exact.complete.beta", out_c[:, 0], out_g[:, 0], tol=5e-4)
    check("sweep_exact.complete.comp", out_c[:, 1], out_g[:, 1], tol=0)

    # BayesW whole-sweep mega-kernel: compiled vs interpret mode of the
    # SAME kernel (the CPU suite already asserts interpret == the XLA
    # per-window path, tests/test_sweep_kernel_bw.py; this isolates the
    # Mosaic lowering)
    from hydra_tpu.samplers.bayesw import gh_table
    from hydra_tpu.ops.sweep_kernel_bw import bw_mrow_width, sweep_stale_bw

    kbw, n_shr = 4, 24
    km1 = kbw - 1
    alpha_v = 2.0
    pk_bw = rs.randint(0, 256, (m_loc, NB), dtype=np.uint8)
    eps_bw = (rs.randn(N) * 0.3).astype(np.float32)
    vi_bw = np.exp(alpha_v * eps_bw - 0.577).astype(np.float32)
    mask1 = np.ones(N, np.float32)
    mave_b = rs.uniform(0.2, 1.8, m_loc)
    invsd_b = rs.uniform(0.5, 2.0, m_loc)
    bold_b = rs.randn(m_loc) * 0.01
    cva = rs.uniform(1e-3, 1e-1, (m_loc, km1))
    sig = 0.05
    gx, gw = gh_table(9)
    ghx_p = np.zeros((1, 128), np.float32)
    ghw_p = np.zeros((1, 128), np.float32)
    ghx_p[0, :9], ghw_p[0, :9] = gx, gw
    mrow_bw = np.column_stack(
        [mave_b, invsd_b, bold_b, rs.uniform(0, 1, m_loc),
         (rs.uniform(0, 1, m_loc) > 0.1).astype(np.float64),
         rs.randn(m_loc) * 0.5,
         alpha_v * mave_b * invsd_b, alpha_v * (mave_b - 1) * invsd_b,
         alpha_v * (mave_b - 2) * invsd_b,
         np.exp(alpha_v * bold_b * (0 - mave_b) * invsd_b),
         np.exp(alpha_v * bold_b * (1 - mave_b) * invsd_b),
         np.exp(alpha_v * bold_b * (2 - mave_b) * invsd_b),
         np.full(m_loc, 0.9 * 1.7724539),
         np.column_stack([np.full(m_loc, 0.05), np.full(m_loc, 0.03),
                          np.full(m_loc, 0.02)]),
         np.sqrt(2.0 * cva * sig), alpha_v * alpha_v * sig * cva,
         2.0 * cva * sig, 2.0 * np.sqrt(sig * cva),
         rs.exponential(size=m_loc), rs.uniform(0, 1, m_loc),
         rs.uniform(0, 1, (m_loc, n_shr))]).astype(np.float32)
    assert mrow_bw.shape[1] == bw_mrow_width(kbw, n_shr)

    def run_bw(interp):
        f = jax.jit(lambda p, e, v, r: sweep_stale_bw(
            p, deinterleave(e), deinterleave(v), r,
            jnp.asarray(ghx_p), jnp.asarray(ghw_p), alpha_v,
            window=W, n_mix=kbw, complete=False,
            ind_mask4=deinterleave(jnp.asarray(mask1)), n_shrink=n_shr,
            interpret=interp))
        e, o = f(jnp.asarray(hpack_bytes(pk_bw)), jnp.asarray(eps_bw),
                 jnp.asarray(vi_bw), jnp.asarray(mrow_bw))
        return np.asarray(interleave(e)), np.asarray(o)

    eps_c, out_c = run_bw(False)
    eps_i, out_i = run_bw(True)
    check("sweep_bw.eps", eps_c, eps_i, tol=5e-4)
    check("sweep_bw.beta", out_c[:, 0], out_i[:, 0], tol=5e-4)
    check("sweep_bw.comp", out_c[:, 1], out_i[:, 1], tol=0)

    # W=1 (exact sequential BayesW) with block win_perm: the narrow-W
    # one-hot sublane row select is a distinct Mosaic lowering path
    wp1 = rs.permutation(m_loc).astype(np.int32)

    def run_bw1(interp):
        f = jax.jit(lambda p, e, v, r: sweep_stale_bw(
            p, deinterleave(e), deinterleave(v), r,
            jnp.asarray(ghx_p), jnp.asarray(ghw_p), alpha_v,
            window=1, n_mix=kbw, complete=False,
            ind_mask4=deinterleave(jnp.asarray(mask1)), n_shrink=n_shr,
            win_perm=jnp.asarray(wp1), interpret=interp))
        e, o = f(jnp.asarray(hpack_bytes(pk_bw)), jnp.asarray(eps_bw),
                 jnp.asarray(vi_bw), jnp.asarray(mrow_bw))
        return np.asarray(interleave(e)), np.asarray(o)

    eps_c, out_c = run_bw1(False)
    eps_i, out_i = run_bw1(True)
    check("sweep_bw_w1.eps", eps_c, eps_i, tol=5e-4)
    check("sweep_bw_w1.beta", out_c[:, 0], out_i[:, 0], tol=5e-4)
    check("sweep_bw_w1.comp", out_c[:, 1], out_i[:, 1], tol=0)

    # multi-trait whole-sweep mega-kernel: compiled vs interpret mode of
    # the SAME kernel, driven through the sampler (the CPU suite ties
    # interpret == the per-window XLA path, tests/test_sweep_kernel_mt.py;
    # this isolates the Mosaic lowering on-chip). Same accumulation order
    # on both sides -> component draws must match exactly.
    import dataclasses as _dc

    from hydra_tpu.parallel.mesh import make_mesh
    from hydra_tpu.samplers.bayesrrm_mt import BayesRRmMT
    from tests.test_bayesrrm_mt import simulate_mt

    ds_mt, phen_mt, _ = simulate_mt(m=128, n=320, n_traits=2, seed=5)

    def run_mt(interp):
        s = BayesRRmMT(ds_mt, phen_mt, window=32, seed=7, mesh=make_mesh(1))
        s.cfg = _dc.replace(s.cfg, use_mega=True, interpret=interp)
        s._step = s._build_step()
        st = s.init_state()
        for it in range(2):
            st, _ = s.step(st, it)
        return st

    st_c, st_i = run_mt(False), run_mt(True)
    check("sweep_mt.eps", np.asarray(st_c.eps), np.asarray(st_i.eps),
          tol=5e-4)
    check("sweep_mt.beta", np.asarray(st_c.beta), np.asarray(st_i.beta),
          tol=5e-4)
    check("sweep_mt.comp", np.asarray(st_c.components).astype(np.float32),
          np.asarray(st_i.components).astype(np.float32), tol=0)

    # EXACT mt mega on the block schedule (win_perm prefetch on
    # sweep_exact_mt): compiled vs interpret of the same kernel
    def run_mt_exact_block(interp):
        s = BayesRRmMT(ds_mt, phen_mt, window=16, seed=9, mesh=make_mesh(1),
                       schedule="block")
        assert s.cfg.exact
        s.cfg = _dc.replace(s.cfg, use_mega=True, interpret=interp)
        s._step = s._build_step()
        st = s.init_state()
        for it in range(2):
            st, _ = s.step(st, it)
        return st

    st_c, st_i = run_mt_exact_block(False), run_mt_exact_block(True)
    check("sweep_mt_exact_block.eps", np.asarray(st_c.eps),
          np.asarray(st_i.eps), tol=5e-4)
    check("sweep_mt_exact_block.beta", np.asarray(st_c.beta),
          np.asarray(st_i.beta), tol=5e-4)
    check("sweep_mt_exact_block.comp",
          np.asarray(st_c.components).astype(np.float32),
          np.asarray(st_i.components).astype(np.float32), tol=0)

    if fails:
        print(f"FATAL  : {fails} kernel check(s) failed", flush=True)
        return 1
    print("INFO   : all compiled-kernel checks passed", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
