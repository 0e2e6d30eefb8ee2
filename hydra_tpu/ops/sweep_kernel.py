"""Whole-sweep mega-kernel: every stale window fused into ONE pallas_call.

The per-window path (ops/window_kernels.py) launches two kernels per window
with W-sized XLA sampling math, an HBM row-gather, and an eps round-trip in
between — at small N the sweep is glue-bound (measured: M=10K x N=5K spends
>70% of its 5.4 ms outside the kernels). This kernel runs the ENTIRE sweep
in one launch:

  grid = (n_windows, 2 phases, n_tiles)
    phase 0 (stats): accumulate s1/s2 over byte tiles; at the last tile run
      the full component/beta draw for the window (the vectorized stale-mode
      sampler of BayesRRm.cpp:2044-2488 — same math as
      samplers/bayesrrm.py::draw_rows) entirely in VMEM;
    phase 1 (axpy): decode again and apply the residual update tile by tile.

  The plane-major residual (4, NB) lives in the OUTPUT VMEM buffer for the
  whole sweep (constant block index -> single resident buffer, one HBM
  write-back at the end). Tiles are addressed through the untiled leading
  dimension of a (n_tiles, 4, tb) layout — Mosaic forbids dynamic lane
  indexing, not dynamic leading-dim indexing.

Everything per-marker (mixture rows, RNG draws, stats) is precomputed by the
sampler into a (m_loc, 6+3K-2) row array gathered in shuffled order, so the
kernel consumes rows [w*W, (w+1)*W) contiguously and XLA does ONE gather per
sweep instead of one per window.

Scope: stale windows on a single marker shard (n_dev == n_ind == n_dcn == 1)
— the multi-shard paths need per-window psums, which a kernel cannot issue.
Exact mode keeps its Gram kernels. Semantics are identical to the
per-window path (tests/test_sweep_kernel.py asserts chain equality).

Reference behavior: BayesRRm.cpp:1691-1956 (marker loop), 2044-2488
(sync-rate window), vectorized as in samplers/bayesrrm.py.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hydra_tpu.ops.window_kernels import (_auto_tile, _decode_h_int,
                                           _decode_k)

f32 = jnp.float32

# mrow column layout (K = mixture components incl. zero):
#   0 mave, 1 mstd, 2 beta_old, 3 u, 4 nrm, 5 act,
#   6..6+K-1        logl_static (log pi, first col unshifted)
#   6+K..6+2K-2     inv_denomk  (K-1 cols)
#   6+2K-1..6+3K-3  sd_k        (K-1 cols)
N_FIXED = 6


def mrow_width(k: int) -> int:
    return N_FIXED + 3 * k - 2


def _sweep_sd_kernel(K: int, n_sub: int, complete: bool, PREC,
                     pk_ref, mrow_ref, eps_in_ref, mask_ref, sc_ref,
                     out_ref, eps_ref, planes_s, mplanes_s, depa_s):
    """Single-decode sub-window step: decode ONCE into VMEM scratch, use
    the planes for both the stats reduce and the axpy MXU dots.

    Grid (n_windows, n_sub): each step handles Wt = W/n_sub markers over
    the FULL byte range. Window semantics are preserved exactly — the
    residual update accumulates into depa_s and is applied to the resident
    eps only at the window's last sub-step, so every marker in the window
    reads the same stale residual regardless of Wt."""
    w = pl.program_id(0)
    s = pl.program_id(1)
    km1 = K - 1
    Wt = pk_ref.shape[0]

    @pl.when((w == 0) & (s == 0))
    def _():
        eps_ref[:, :] = eps_in_ref[:, :]

    @pl.when(s == 0)
    def _():
        depa_s[:, :] = jnp.zeros_like(depa_s)

    # The whole step body lives under a (vacuous) pl.when: shard_map's vma
    # checker rejects literal-operand binary ops (shifts, muls) on varying
    # block values at the interpret-mode top level, but accepts them inside
    # cond-discharged sub-jaxprs — the same structure the two-phase kernel
    # gets from its phase pl.whens.
    @pl.when(w >= 0)
    def _step():
        _sd_step(K, n_sub, complete, PREC, pk_ref, mrow_ref, mask_ref,
                 sc_ref, out_ref, eps_ref, planes_s, mplanes_s, depa_s, s)


def _sd_step(K, n_sub, complete, PREC, pk_ref, mrow_ref, mask_ref, sc_ref,
             out_ref, eps_ref, planes_s, mplanes_s, depa_s, s):
    km1 = K - 1
    Wt = pk_ref.shape[0]
    pk32 = pk_ref[:, :].astype(jnp.int32)          # (Wt, NB)

    # ---- decode once; planes to scratch (bf16 — {0,1,2} is EXACT in
    # bf16, halving the VMEM round trip and letting the axpy run
    # single-pass bf16 MXU dots with exact f32 accumulation); stats
    # reduce on the VPU from the just-decoded f32 registers ----
    s1 = None
    s2 = None
    for k in range(4):
        e = eps_ref[k:k + 1, :]                    # (1, NB)
        if complete:
            g = _decode_h_int(pk32, k)             # h = 2 - geno
            planes_s[k * Wt:(k + 1) * Wt, :] = g.astype(jnp.bfloat16)
            a = jnp.sum(g * e, axis=1, keepdims=True)   # hs1 contribution
            b = jnp.sum(e).reshape(1, 1)           # mask dot == sum(eps)
        else:
            g, m = _decode_k(pk32, k)
            planes_s[k * Wt:(k + 1) * Wt, :] = g.astype(jnp.bfloat16)
            mplanes_s[k * Wt:(k + 1) * Wt, :] = m.astype(jnp.bfloat16)
            a = jnp.sum(g * e, axis=1, keepdims=True)
            b = jnp.sum(m * e, axis=1, keepdims=True)
        s1 = a if s1 is None else s1 + a
        s2 = b if s2 is None else s2 + b

    # ---- component + beta draw for the sub-window, (1, Wt) row layout ----
    i2se = sc_ref[0, 0]
    dNm1 = sc_ref[0, 1]
    mave = mrow_ref[0:1, :]
    mstd = mrow_ref[1:2, :]
    bold = mrow_ref[2:3, :]
    u = mrow_ref[3:4, :]
    nrm = mrow_ref[4:5, :]
    act = mrow_ref[5:6, :]
    if complete:   # s1 = 2*sum(eps) - hs1 (h-decode)
        s2v = s2
        s1v = 2.0 * s2v - jnp.transpose(s1)
    else:
        s2v = jnp.transpose(s2)
        s1v = jnp.transpose(s1)
    num0 = mstd * (s1v - mave * s2v) + bold * dNm1         # (1, Wt)

    bl, bi, bs = N_FIXED, N_FIXED + K, N_FIXED + 2 * K - 1
    logls = [mrow_ref[bl:bl + 1, :]]
    muks = []
    for j in range(km1):
        muk = num0 * mrow_ref[bi + j:bi + j + 1, :]
        muks.append(muk)
        logls.append(mrow_ref[bl + 1 + j:bl + 2 + j, :]
                     + muk * num0 * i2se)
    mx = logls[0]
    for l in logls[1:]:
        mx = jnp.maximum(mx, l)
    prs = [jnp.exp(l - mx) for l in logls]
    sm = prs[0]
    for p in prs[1:]:
        sm = sm + p
    probs = [p / sm for p in prs]
    cum = probs[0]
    compf = jnp.where(u > cum, 1.0, 0.0)
    for j in range(1, km1):
        cum = cum + probs[j]
        compf = compf + jnp.where(u > cum, 1.0, 0.0)
    bnz = jnp.zeros_like(num0)
    for j in range(km1):
        sel = jnp.where(compf == float(j + 1), 1.0, 0.0)
        bnz = bnz + sel * (muks[j] + nrm * mrow_ref[bs + j:bs + j + 1, :])
    pos = jnp.where(compf > 0.0, 1.0, 0.0)
    bnew = bnz * pos * act
    compf = compf * act
    acum = probs[0] * act + (1.0 - act)
    dbeta = bold - bnew
    c1 = dbeta * mstd                              # (1, Wt)
    c2 = -c1 * mave
    # bf16 hi/lo split of the coefficients; the planes are bf16-exact, so
    # each bf16 x bf16 -> f32-accumulate dot is EXACT and single-pass
    c1h = c1.astype(jnp.bfloat16)
    c1l = (c1 - c1h.astype(f32)).astype(jnp.bfloat16)
    out_ref[0:1, :] = bnew
    out_ref[1:2, :] = compf
    out_ref[2:3, :] = acum
    out_ref[3:4, :] = dbeta
    out_ref[4:8, :] = jnp.zeros_like(out_ref[4:8, :])

    # ---- axpy from the SAME planes (no second decode) ----
    if complete:
        csum = (2.0 * jnp.sum(c1) + jnp.sum(c2)).reshape(1, 1)
    else:
        c2h = c2.astype(jnp.bfloat16)
        c2l = (c2 - c2h.astype(f32)).astype(jnp.bfloat16)
    for k in range(4):
        g = planes_s[k * Wt:(k + 1) * Wt, :]
        if complete:
            d = (csum
                 - jnp.dot(c1h, g, precision=PREC,
                           preferred_element_type=f32)
                 - jnp.dot(c1l, g, precision=PREC,
                           preferred_element_type=f32))
        else:
            m = mplanes_s[k * Wt:(k + 1) * Wt, :]
            d = (jnp.dot(c1h, g, precision=PREC,
                         preferred_element_type=f32)
                 + jnp.dot(c1l, g, precision=PREC,
                           preferred_element_type=f32)
                 + jnp.dot(c2h, m, precision=PREC,
                           preferred_element_type=f32)
                 + jnp.dot(c2l, m, precision=PREC,
                           preferred_element_type=f32))
        depa_s[k:k + 1, :] += d

    # ---- window boundary: apply the accumulated update ----
    @pl.when(s == n_sub - 1)
    def _():
        if complete:
            # pad lanes carry the csum constant — nulled by the mask
            eps_ref[:, :] += depa_s[:, :] * mask_ref[:, :]
        else:
            # pad bytes are the missing code: g == m == 0 -> depa is
            # already zero on pad lanes
            eps_ref[:, :] += depa_s[:, :]


def sd_sub_window(window: int, nb: int, complete: bool,
                  budget: int = 3584 * 1024) -> int:
    """Sub-window for the single-decode kernel — OPT-IN ONLY (set
    HYDRA_TPU_SD=<Wt> or =auto); returns 0 (two-phase kernel) by default.

    MEASURED NEGATIVE RESULT (v5e, 2026-08-19, M=100K x N=50K W=256):
    single-decode 41.39 ms/sweep (105.9 us/window) vs two-phase 37.89 ms
    (96.9 us/window) — identical at Wt=16/f32 and Wt=32/bf16 scratch.
    Staging the decoded planes through VMEM scratch (write + read back
    ~2 vector ops/element) plus the shallow-k MXU axpy (k=Wt<=32 wastes
    3/4 of the systolic array vs the two-phase k=W=256 dots) costs more
    than the ~6-op second decode it eliminates. Wt=64 f32 exceeds the
    16 MB scoped VMEM (19.1 MB). The sweep already sits at ~1.5x the
    VPU-decode roofline (96.9 vs ~65 us) after the h-decode work — the
    decode is cheap enough that recompute beats any staging level
    (HBM int8 planes: 15x worse, ops/planes.py; VMEM planes: 9% worse).

    Scratch = 8*Wt*NB bytes (4 bf16 genotype planes) in complete mode,
    twice that with a mask plane set (missing genotypes)."""
    import os
    ov = os.environ.get("HYDRA_TPU_SD", "")
    if not ov or ov == "0":
        return 0
    if ov != "auto":
        return int(ov)
    per = 8 * nb * (2 if not complete else 1)
    wt = min(window, max(8, (budget // per) // 8 * 8))
    while wt >= 8 and window % wt:
        wt -= 8
    return wt if wt >= 8 and per * wt <= budget else 0


def sweep_stale_sd(pk_shuf: jax.Array, eps_d: jax.Array, mrow: jax.Array,
                   i_2se, dNm1, *, window: int, sub_window: int, n_mix: int,
                   complete: bool, ind_mask4: Optional[jax.Array] = None,
                   vma=None, interpret: bool = False
                   ) -> Tuple[jax.Array, jax.Array]:
    """Single-decode variant of sweep_stale: each window's packed bytes are
    decoded ONCE (VERDICT r2 next #1 — the sweep was VPU-decode-bound with
    stats and axpy each decoding; this halves the decode bound).

    Gated by VMEM: the decoded planes of `sub_window` markers x full NB
    must fit scratch (sd_sub_window). Semantics identical to sweep_stale —
    same RNG, same stale-window boundaries — up to f32 accumulation order
    (stats are bitwise-equal per marker; the axpy accumulates in Wt-sized
    MXU chunks instead of one W-chunk).
    """
    m_loc, NB = pk_shuf.shape
    W, Wt = window, sub_window
    assert mrow.shape[1] == mrow_width(n_mix), (mrow.shape, n_mix)
    assert m_loc % W == 0 and W % Wt == 0, (m_loc, W, Wt)
    if complete and ind_mask4 is None:
        raise ValueError("complete sweep needs ind_mask4")
    n_windows = m_loc // W
    n_sub = W // Wt
    n_blocks = m_loc // Wt
    C = mrow.shape[1]

    c_pad = -(-C // 8) * 8
    mrow_t = jnp.transpose(mrow.reshape(n_blocks, Wt, C), (0, 2, 1))
    mrow_t = jnp.pad(mrow_t, ((0, 0), (0, c_pad - C), (0, 0)))
    mrow_t = mrow_t.reshape(n_blocks * c_pad, Wt)
    if complete:
        mask4 = ind_mask4
    else:
        mask4 = jnp.zeros((4, NB), f32)   # unused placeholder
    sc = jnp.stack([jnp.asarray(i_2se, f32),
                    jnp.asarray(dNm1, f32)]).reshape(1, 2)

    def sds(shape):
        return (jax.ShapeDtypeStruct(shape, f32, vma=set(vma)) if vma
                else jax.ShapeDtypeStruct(shape, f32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_windows, n_sub),
        in_specs=[
            pl.BlockSpec((Wt, NB), lambda w, s: (w * n_sub + s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_pad, Wt),
                         lambda w, s: (w * n_sub + s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, NB), lambda w, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, NB), lambda w, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, Wt), lambda w, s: (w * n_sub + s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, NB), lambda w, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((4 * Wt, NB), jnp.bfloat16),     # decoded g planes
            pltpu.VMEM((4 * Wt if not complete else 8, NB),
                       jnp.bfloat16),                   # mask planes
            pltpu.VMEM((4, NB), f32),                   # d_eps accumulator
        ],
    )
    out, eps_out = pl.pallas_call(
        functools.partial(_sweep_sd_kernel, n_mix, n_sub, complete,
                          jax.lax.Precision.HIGHEST if interpret else None),
        grid_spec=grid_spec,
        out_shape=[sds((n_blocks * 8, Wt)), sds((4, NB))],
        interpret=interpret,
    )(pk_shuf, mrow_t, eps_d, mask4, sc)
    out4 = out.reshape(n_blocks, 8, Wt)[:, :4, :]
    return eps_out, out4.transpose(0, 2, 1).reshape(m_loc, 4)


def _sweep_exact_kernel(K: int, n_tiles: int, complete: bool, PREC, stub,
                        pk_ref, mrow_ref, mcol_ref, eps_in_ref, mask_ref,
                        sc_ref,
                        out_ref, eps_ref, s1_s, s2_s, gram_s, c_s, v_s):
    """Whole-sweep EXACT-mode kernel: per window, phase 0 accumulates
    s1/s2 AND the window Gram over byte tiles, then runs the W-step
    sequential recurrence (the window_gibbs one-hot loop) in VMEM; phase 1
    applies the axpy. One launch per sweep — exact sequential Gibbs at the
    stale mega-kernel's launch cost (the per-window exact path pays three
    kernel launches + XLA glue per window).

    complete=True (no missing genotypes): the mask plane equals the lane
    mask for every marker, so the Gram is accumulated as the raw INTEGER
    plane Gram (one bf16 MXU pass per plane — exact, values {0,1,2}) with
    the standardization applied as a rank-1 correction before the
    recurrence, and the axpy's mask-dot terms collapse to sum(c2) on real
    lanes (see window_kernels._stats_kernel for the algebra). Otherwise
    decodes the full (g, m) pair per tile."""
    w = pl.program_id(0)
    ph = pl.program_id(1)
    t = pl.program_id(2)
    km1 = K - 1
    W = out_ref.shape[1]

    @pl.when((w == 0) & (ph == 0))
    def _():
        eps_ref[t] = eps_in_ref[t]

    if stub == "empty":   # profiling: grid + DMA floor
        @pl.when((ph == 0) & (t == n_tiles - 1))
        def _z():
            out_ref[:, :] = jnp.zeros_like(out_ref)
        return

    pk32 = pk_ref[:, :].astype(jnp.int32)      # (W, tb)

    @pl.when(ph == 0)
    def _stats():
        @pl.when(t == 0)
        def _():
            s1_s[:, :] = jnp.zeros_like(s1_s)
            s2_s[:, :] = jnp.zeros_like(s2_s)
            gram_s[:, :] = jnp.zeros_like(gram_s)
            if complete:
                v_s[:, :] = jnp.zeros_like(v_s)

        et = eps_ref[t]                        # (4, tb)
        mave_c = mcol_ref[:, 0:1]              # (W, 1)
        mstd_c = mcol_ref[:, 1:2]
        s1 = None
        s2 = None
        vv = None
        ct = (((1,), (1,)), ((), ()))
        for k in range(4):
            g, m = _decode_k(pk32, k)
            e = et[k:k + 1, :]
            a = jnp.sum(g * e, axis=1, keepdims=True)
            s1 = a if s1 is None else s1 + a
            if complete:
                # integer Gram: ONE exact bf16 pass per plane; the mask
                # terms become rank-1 corrections from v = sum(g) and n
                b = jnp.sum(e).reshape(1, 1)   # mask dot == sum(eps)
                c = jnp.sum(g, axis=1, keepdims=True)
                vv = c if vv is None else vv + c
                if stub != "no_gram":
                    gb = g.astype(jnp.bfloat16)
                    gram_s[:, :] += jax.lax.dot_general(
                        gb, gb, ct, precision=PREC,
                        preferred_element_type=f32)
            else:
                b = jnp.sum(m * e, axis=1, keepdims=True)
                x = (g - mave_c * m) * mstd_c  # (W, tb) standardized
                # manual 2-pass f32 Gram (Mosaic ignores precision=HIGHEST
                # for in-kernel dot_general); the two cross terms are
                # transposes — see window_kernels._stats_kernel
                if stub != "no_gram":
                    xh = x.astype(jnp.bfloat16).astype(f32)
                    xl = x - xh
                    cross = jax.lax.dot_general(xh, xl, ct, precision=PREC,
                                                preferred_element_type=f32)
                    gram_s[:, :] += (
                        jax.lax.dot_general(xh, xh, ct, precision=PREC,
                                            preferred_element_type=f32)
                        + cross + jnp.transpose(cross))
            s2 = b if s2 is None else s2 + b
        s1_s[:, :] += s1
        if complete:
            s2_s[0:1, 0:1] += s2
            v_s[:, :] += vv
        else:
            s2_s[:, :] += s2

        # ---- W-step sequential recurrence on the last tile ----
        @pl.when(t == n_tiles - 1)
        def _recur():
            i2se = sc_ref[0, 0]
            dNm1 = sc_ref[0, 1]
            mave = mrow_ref[0:1, :]
            mstd = mrow_ref[1:2, :]
            bold = mrow_ref[2:3, :]
            if complete:
                # standardize the integer Gram (rank-1 mask corrections;
                # n_real rides sc_ref[0, 2])
                n_real = sc_ref[0, 2]
                v_r = jnp.transpose(v_s[:, :])          # (1, W)
                gram_s[:, :] = (mcol_ref[:, 1:2] * mstd) * (
                    gram_s[:, :] - mcol_ref[:, 0:1] * v_r
                    - v_s[:, :] * mave + n_real * (mcol_ref[:, 0:1] * mave))
                s2v = s2_s[0:1, 0:1]
            else:
                s2v = jnp.transpose(s2_s[:, :])
            num0 = (mstd * (jnp.transpose(s1_s[:, :]) - mave * s2v)
                    + bold * dNm1)                      # (1, W)
            out_ref[:, :] = jnp.zeros_like(out_ref)
            lanes = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
            bl, bi, bs = N_FIXED, N_FIXED + K, N_FIXED + 2 * K - 1

            def step(j, carry):
                # the four result rows ride the loop CARRY (vector
                # registers): the serial chain is db -> reduce -> draw ->
                # db, and a VMEM round-trip per step (the old
                # out_ref[3:4] RMW) adds store->load latency to every
                # link of that chain
                b_row, c_row, a_row, db_row = carry
                # marker j's prior + Gram correction: ONE fused lane reduce
                onehot = (lanes == j).astype(f32)        # (1, W)
                if stub == "recur_nogram":   # profiling: dynamic-load cost
                    grow = num0
                else:
                    grow = gram_s[pl.ds(j, 1), :]        # (1, W)
                num = jnp.sum(num0 * onehot + grow * db_row)
                if stub == "recur_min":      # profiling: serial-floor loop
                    return (b_row, c_row, a_row, db_row + num * onehot)

                # the draw is VECTORIZED over all W lanes (every quantity a
                # static (1, W) row view of mrow_ref with marker j's scalar
                # `num` broadcast; only lane j survives the onehot
                # accumulate). Lanes are free on the VPU — this replaces
                # the old per-step column extraction ((c_pad, W) multiply +
                # lane reduce) and its ~25-op scalar chain (scalar
                # transcendentals + vector-extract moves) with pure row
                # ops. A sublane-major rewrite (dynamic (1, C) row loads
                # per step) measured 2.3x SLOWER — dynamic sublane slicing
                # is expensive in Mosaic; onehot select is the idiom.
                logl0 = mrow_ref[bl:bl + 1, :]
                mx = logl0
                muks, logls = [], []
                for k in range(km1):
                    mu_k = num * mrow_ref[bi + k:bi + k + 1, :]
                    muks.append(mu_k)
                    l = mrow_ref[bl + 1 + k:bl + 2 + k, :] + mu_k * num * i2se
                    logls.append(l)
                    mx = jnp.maximum(mx, l)
                _e = (lambda x: x) if stub == "recur_noexp" else jnp.exp
                pr0 = _e(jnp.maximum(logl0 - mx, -60.0))
                s = pr0
                prs = []
                for l in logls:
                    pk_ = _e(jnp.maximum(l - mx, -60.0))
                    prs.append(pk_)
                    s = s + pk_
                u_s = mrow_ref[3:4, :] * s               # R_U = mrow row 3
                cum = pr0
                compf = jnp.zeros_like(u_s)
                for k in range(km1):
                    compf = compf + jnp.where(u_s > cum, 1.0, 0.0)
                    cum = cum + prs[k]
                mu_sel = jnp.zeros_like(u_s)
                sd_sel = jnp.zeros_like(u_s)
                for k in range(km1):
                    selk = jnp.where(compf == float(k + 1), 1.0, 0.0)
                    mu_sel = mu_sel + selk * muks[k]
                    sd_sel = sd_sel + selk * mrow_ref[bs + k:bs + k + 1, :]
                act = mrow_ref[5:6, :]                   # R_ACT = row 5
                pos = jnp.where(compf > 0.0, 1.0, 0.0)
                beta_new = pos * act * (mu_sel + mrow_ref[4:5, :] * sd_sel)
                compf = compf * act
                acum0 = (pr0 / s) * act + (1.0 - act)
                dbeta_j = mrow_ref[2:3, :] - beta_new    # R_BOLD = row 2
                return (b_row + beta_new * onehot,
                        c_row + compf * onehot,
                        a_row + acum0 * onehot,
                        db_row + dbeta_j * onehot)

            if stub not in ("no_recur",):
                z = jnp.zeros((1, W), f32)
                b_row, c_row, a_row, db_row = jax.lax.fori_loop(
                    0, W, step, (z, z, z, z))
                out_ref[0:1, :] = b_row
                out_ref[1:2, :] = c_row
                out_ref[2:3, :] = a_row
                out_ref[3:4, :] = db_row

            c1 = out_ref[3:4, :] * mstd
            c2 = -c1 * mave
            c1h = c1.astype(jnp.bfloat16).astype(f32)
            c_s[0:1, :] = c1h
            c_s[1:2, :] = c1 - c1h
            if complete:
                # the c2 mask dots collapse to the scalar sum(c2) on real
                # lanes (phase 1 broadcasts it through a mask row)
                c_s[2:3, :] = jnp.zeros_like(c1) + jnp.sum(c2)
                c_s[3:4, :] = jnp.zeros_like(c1)
            else:
                c2h = c2.astype(jnp.bfloat16).astype(f32)
                c_s[2:3, :] = c2h
                c_s[3:4, :] = c2 - c2h

    @pl.when(ph == 1)
    def _axpy():
        c1h = c_s[0:1, :]
        c1l = c_s[1:2, :]
        for k in range(4):
            g, m = _decode_k(pk32, k)
            d = (jnp.dot(c1h, g, precision=PREC, preferred_element_type=f32)
                 + jnp.dot(c1l, g, precision=PREC,
                           preferred_element_type=f32))
            if complete:
                # the c2 mask dots collapse to the scalar sum(c2) on real
                # lanes, nulled on pads by the EXPLICIT lane mask (the
                # shuffle can park a pad marker at any window slot, so no
                # decoded mask row can stand in for the lane mask; the
                # g-dots are already zero on pad lanes)
                d = (d + c_s[2:3, 0:1]) * mask_ref[t, k:k + 1, :]
            else:
                d = (d + jnp.dot(c_s[2:3, :], m, precision=PREC,
                                 preferred_element_type=f32)
                     + jnp.dot(c_s[3:4, :], m, precision=PREC,
                               preferred_element_type=f32))
            eps_ref[t, k:k + 1, :] += d


def sweep_exact(pk_shuf: jax.Array, eps_d: jax.Array, mrow: jax.Array,
                mcol: jax.Array, i_2se, dNm1, *, window: int, n_mix: int,
                complete: bool = False,
                ind_mask4: Optional[jax.Array] = None, tile_bytes: int = 0,
                win_perm: Optional[jax.Array] = None,
                vma=None, interpret: bool = False, stub: str = ""
                ) -> Tuple[jax.Array, jax.Array]:
    """Run a full EXACT-mode Gibbs sweep in one kernel launch.

    Like sweep_stale but with the window Gram accumulated in phase 0 and
    the sequential W-step recurrence (exact sync-rate=1 semantics,
    BayesRRm.cpp:2044-2060) run in VMEM at each window's last stats tile.
    Single marker shard only. mcol: (m_loc, 2) = [mave, mstd] columns in
    the same shuffled order as pk_shuf/mrow. complete=True enables the
    integer-Gram fast path (no missing genotypes; see the kernel).

    win_perm (explicit --schedule block with exact mode): pk_shuf, mrow,
    mcol and the returned out are all in SLOT order, block-addressed
    through the window permutation (sweep_stale docstring). The chain
    stays EXACT sequential Gibbs — full conditionals, zero relaxation
    bias — but the processing order becomes W-dependent, so the
    cross-window-width invariance (W=1 == W=N chains) no longer holds;
    the sampler only honors this under an explicit user request.

    Returns (eps_d', out) with out columns [beta_new, comp, acum0, dbeta].
    """
    m_loc, NB = pk_shuf.shape
    assert mrow.shape[1] == mrow_width(n_mix), (mrow.shape, n_mix)
    assert m_loc % window == 0, (m_loc, window)
    if complete and ind_mask4 is None:
        raise ValueError("complete exact sweep needs ind_mask4")
    W = window
    n_windows = m_loc // W
    tb = tile_bytes if tile_bytes else _auto_tile(NB, W, 4.0)
    n_tiles = NB // tb
    C = mrow.shape[1]

    c_pad = -(-C // 8) * 8
    mrow_t = jnp.transpose(mrow.reshape(n_windows, W, C), (0, 2, 1))
    mrow_t = jnp.pad(mrow_t, ((0, 0), (0, c_pad - C), (0, 0)))
    mrow_t = mrow_t.reshape(n_windows * c_pad, W)
    eps_t = eps_d.reshape(4, n_tiles, tb).transpose(1, 0, 2)  # (nt, 4, tb)
    if complete:
        mask_t = ind_mask4.reshape(4, n_tiles, tb).transpose(1, 0, 2)
    else:
        mask_t = jnp.zeros((1, 4, tb), f32)   # unused placeholder
    # n_real = dNm1 + 1: the sampler's dNm1 is (real N) - 1 and the mega
    # path is gated to a single unsharded residual
    sc = jnp.stack([jnp.asarray(i_2se, f32),
                    jnp.asarray(dNm1, f32),
                    jnp.asarray(dNm1, f32) + 1.0]).reshape(1, 3)

    def sds(shape):
        return (jax.ShapeDtypeStruct(shape, f32, vma=set(vma)) if vma
                else jax.ShapeDtypeStruct(shape, f32))

    if win_perm is None:
        pk_map = lambda w, p, t: (w, t)                       # noqa: E731
        row_map = lambda w, p, t: (w, 0)                      # noqa: E731
    else:
        # scalar-prefetch refs arrive AFTER the grid indices in index maps;
        # pk, mrow, mcol and out all live in SLOT order (docstring)
        pk_map = lambda w, p, t, wp: (wp[w], t)               # noqa: E731
        row_map = lambda w, p, t, wp: (wp[w], 0)              # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0 if win_perm is None else 1,
        grid=(n_windows, 2, n_tiles),
        in_specs=[
            pl.BlockSpec((W, tb), pk_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((c_pad, W), row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((W, 2), row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles, 4, tb), lambda w, p, t, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mask_t.shape[0], 4, tb),
                         lambda w, p, t, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, W), row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles, 4, tb), lambda w, p, t, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((W, 1), f32),    # s1
            pltpu.VMEM((W, 1), f32),    # s2
            pltpu.VMEM((W, W), f32),    # window Gram
            pltpu.VMEM((4, W), f32),    # axpy coeff rows
            pltpu.VMEM((W, 1), f32),    # v = sum(g) (complete mode)
        ],
    )
    kern = functools.partial(_sweep_exact_kernel, n_mix, n_tiles, complete,
                             jax.lax.Precision.HIGHEST if interpret else None,
                             stub)
    if win_perm is None:
        operands = (pk_shuf, mrow_t, mcol, eps_t, mask_t, sc)
        body = kern
    else:
        operands = (jnp.asarray(win_perm, jnp.int32),
                    pk_shuf, mrow_t, mcol, eps_t, mask_t, sc)
        body = lambda wp_ref, *refs: kern(*refs)              # noqa: E731
    out, eps_out = pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=[sds((n_windows * 8, W)), sds((n_tiles, 4, tb))],
        interpret=interpret,
    )(*operands)
    eps_new = eps_out.transpose(1, 0, 2).reshape(4, NB)
    out4 = out.reshape(n_windows, 8, W)[:, :4, :]
    # out rows: [beta_new, comp, acum, dbeta] -> columns per marker
    return eps_new, out4.transpose(0, 2, 1).reshape(m_loc, 4)


def _sweep_kernel(K: int, n_tiles: int, complete: bool, PREC,
                  pk_ref, mrow_ref, eps_in_ref, mask_ref, sc_ref,
                  out_ref, eps_ref, s1_s, s2_s, c_s, csum_s):
    w = pl.program_id(0)
    ph = pl.program_id(1)
    t = pl.program_id(2)
    km1 = K - 1

    # first visit of each tile: residual into the resident output buffer
    # (phase 0 of window 0 walks every tile before anything reads it)
    @pl.when((w == 0) & (ph == 0))
    def _():
        eps_ref[t] = eps_in_ref[t]

    pk32 = pk_ref[:, :].astype(jnp.int32)      # (W, tb)

    @pl.when(ph == 0)
    def _stats():
        @pl.when(t == 0)
        def _():
            s1_s[:, :] = jnp.zeros_like(s1_s)
            s2_s[:, :] = jnp.zeros_like(s2_s)

        et = eps_ref[t]                        # (4, tb)
        s1 = None
        s2 = None
        for k in range(4):
            e = et[k:k + 1, :]                 # (1, tb)
            if complete:
                # h-decode (one op fewer): s1_s accumulates sum(h*eps);
                # the draw reconstructs s1 = 2*sum(eps) - hs1
                g = _decode_h_int(pk32, k)
                a = jnp.sum(g * e, axis=1, keepdims=True)      # (W, 1)
                b = jnp.sum(e).reshape(1, 1)   # mask dot == sum(eps)
            else:
                g, m = _decode_k(pk32, k)
                a = jnp.sum(g * e, axis=1, keepdims=True)
                b = jnp.sum(m * e, axis=1, keepdims=True)
            s1 = a if s1 is None else s1 + a
            s2 = b if s2 is None else s2 + b
        s1_s[:, :] += s1
        if complete:
            s2_s[0:1, 0:1] += s2
        else:
            s2_s[:, :] += s2

        # ---- component + beta draw for the whole window (last tile) ----
        # The draw runs entirely in (1, W) ROW layout: a (W, 1) column op
        # spans ceil(W/8) vregs each using one lane (8x the instructions
        # at W=64), and the row layout also kills the two per-window
        # c1/c2 sublane->lane relayouts — only the accumulated s1/s2
        # columns get transposed (one relayout per window instead of two).
        @pl.when(t == n_tiles - 1)
        def _sample():
            i2se = sc_ref[0, 0]
            dNm1 = sc_ref[0, 1]
            mave = mrow_ref[0:1, :]
            mstd = mrow_ref[1:2, :]
            bold = mrow_ref[2:3, :]
            u = mrow_ref[3:4, :]
            nrm = mrow_ref[4:5, :]
            act = mrow_ref[5:6, :]
            if complete:   # s1 = 2*sum(eps) - hs1 (h-decode, see _stats)
                s2v = s2_s[0:1, 0:1]
                s1v = 2.0 * s2v - jnp.transpose(s1_s[:, :])
            else:
                s2v = jnp.transpose(s2_s[:, :])
                s1v = jnp.transpose(s1_s[:, :])
            num0 = mstd * (s1v - mave * s2v) + bold * dNm1  # (1, W)

            bl, bi, bs = N_FIXED, N_FIXED + K, N_FIXED + 2 * K - 1
            logls = [mrow_ref[bl:bl + 1, :]]
            muks = []
            for j in range(km1):
                muk = num0 * mrow_ref[bi + j:bi + j + 1, :]
                muks.append(muk)
                logls.append(mrow_ref[bl + 1 + j:bl + 2 + j, :]
                             + muk * num0 * i2se)
            mx = logls[0]
            for l in logls[1:]:
                mx = jnp.maximum(mx, l)
            prs = [jnp.exp(l - mx) for l in logls]
            sm = prs[0]
            for p in prs[1:]:
                sm = sm + p
            probs = [p / sm for p in prs]
            # comp = #{cumulative probs exceeded by u}, capped at K-1
            cum = probs[0]
            compf = jnp.where(u > cum, 1.0, 0.0)
            for j in range(1, km1):
                cum = cum + probs[j]
                compf = compf + jnp.where(u > cum, 1.0, 0.0)
            bnz = jnp.zeros_like(num0)
            for j in range(km1):
                sel = jnp.where(compf == float(j + 1), 1.0, 0.0)
                bnz = bnz + sel * (muks[j]
                                   + nrm * mrow_ref[bs + j:bs + j + 1, :])
            pos = jnp.where(compf > 0.0, 1.0, 0.0)
            bnew = bnz * pos * act
            compf = compf * act
            acum = probs[0] * act + (1.0 - act)
            dbeta = bold - bnew
            # axpy coefficients as bf16 hi/lo ROWS for phase 1's exact-f32
            # MXU vecmat (window_kernels._axpy_kernel) — the VPU sublane
            # reduction measured ~20% slower per window at NB=12544
            c1 = dbeta * mstd                         # (1, W)
            c2 = -c1 * mave
            c1h = c1.astype(jnp.bfloat16).astype(f32)
            c_s[0:1, :] = c1h
            c_s[1:2, :] = c1 - c1h
            if complete:
                # the c2 rows degenerate to the scalar constant term of
                # the h-decode axpy: 2*sum(c1) + sum(c2)
                csum_s[0:1, 0:1] = (2.0 * jnp.sum(c1)
                                    + jnp.sum(c2)).reshape(1, 1)
            else:
                c2h = c2.astype(jnp.bfloat16).astype(f32)
                c_s[2:3, :] = c2h
                c_s[3:4, :] = c2 - c2h
            out_ref[0:1, :] = bnew
            out_ref[1:2, :] = compf
            out_ref[2:3, :] = acum
            out_ref[3:4, :] = dbeta
            out_ref[4:8, :] = jnp.zeros_like(out_ref[4:8, :])  # pad rows

    @pl.when(ph == 1)
    def _axpy():
        c1h = c_s[0:1, :]                      # (1, W) bf16-exact rows
        c1l = c_s[1:2, :]
        if not complete:
            c2h = c_s[2:3, :]
            c2l = c_s[3:4, :]
        for k in range(4):
            if complete:
                # h-decode: sum c1*g = 2*sum(c1) - sum c1*h; the constant
                # (incl. the c2 term) was precomputed into csum_s[0, 0]
                h = _decode_h_int(pk32, k)
                d = (csum_s[0:1, 0:1]
                     - jnp.dot(c1h, h, precision=PREC,
                               preferred_element_type=f32)
                     - jnp.dot(c1l, h, precision=PREC,
                               preferred_element_type=f32))
                d = d * mask_ref[t, k:k + 1, :]
            else:
                g, m = _decode_k(pk32, k)
                d = (jnp.dot(c1h, g, precision=PREC,
                             preferred_element_type=f32)
                     + jnp.dot(c1l, g, precision=PREC,
                               preferred_element_type=f32)
                     + jnp.dot(c2h, m, precision=PREC,
                               preferred_element_type=f32)
                     + jnp.dot(c2l, m, precision=PREC,
                               preferred_element_type=f32))
            eps_ref[t, k:k + 1, :] += d


def sweep_stale(pk_shuf: jax.Array, eps_d: jax.Array, mrow: jax.Array,
                i_2se, dNm1, *, window: int, n_mix: int, complete: bool,
                ind_mask4: Optional[jax.Array] = None, tile_bytes: int = 0,
                win_perm: Optional[jax.Array] = None,
                vma=None, interpret: bool = False
                ) -> Tuple[jax.Array, jax.Array]:
    """Run a full stale-window Gibbs sweep in one kernel launch.

    pk_shuf: (m_loc, NB) uint8 packed genotypes in SHUFFLED marker order;
    eps_d: (4, NB) plane-major residual; mrow: (m_loc, mrow_width(K))
    per-marker rows (same order as pk_shuf); ind_mask4: (4, NB) plane-major
    individual mask (required iff complete=True).

    win_perm (block schedule): an (n_windows,) int32 window permutation.
    When given, pk_shuf, mrow AND the returned out are all in SLOT order —
    window w's packed rows and marker rows are DMA'd directly from
    row-block win_perm[w] via scalar-prefetch index maps, and its outputs
    are written back to block win_perm[w]. The caller does NO per-sweep
    gather or scatter at all (no second (m_loc, NB) HBM copy either),
    which is what frees the mega kernel from its 2.2x-packed HBM headroom
    gate at large M and removes the m_loc-length take/scatter glue.
    Stale-window semantics are unchanged — within a window every marker
    reads the same frozen residual, so only the window PARTITION differs
    from the per-marker shuffle (a valid systematic-scan Gibbs schedule;
    samplers/bayesrrm.py::BayesRRmConfig docs the bias story).

    Returns (eps_d', out) with out columns [beta_new, comp, acum0, dbeta]
    per shuffled marker.
    """
    m_loc, NB = pk_shuf.shape
    assert mrow.shape[1] == mrow_width(n_mix), (mrow.shape, n_mix)
    assert m_loc % window == 0, (m_loc, window)
    if complete and ind_mask4 is None:
        raise ValueError("complete sweep needs ind_mask4")
    W = window
    n_windows = m_loc // W
    tb = tile_bytes if tile_bytes else _auto_tile(NB, W, 3.0)
    n_tiles = NB // tb
    C = mrow.shape[1]

    # Marker rows per window, TRANSPOSED: the kernel's draw consumes
    # (1, W) coefficient ROWS (see _sample). Compiled Mosaic requires the
    # block's last dim be 128-divisible OR equal to the array's, so the
    # per-window (C, W) slabs are stacked along the SUBLANE dim — array
    # (n_windows*C_pad, W), block (C_pad, W) at row-block w — making W the
    # full last dim (any window width legal). C pads to a sublane tile.
    c_pad = -(-C // 8) * 8
    mrow_t = jnp.transpose(mrow.reshape(n_windows, W, C), (0, 2, 1))
    mrow_t = jnp.pad(mrow_t, ((0, 0), (0, c_pad - C), (0, 0)))
    mrow_t = mrow_t.reshape(n_windows * c_pad, W)
    eps_t = eps_d.reshape(4, n_tiles, tb).transpose(1, 0, 2)  # (nt, 4, tb)
    if complete:
        mask_t = ind_mask4.reshape(4, n_tiles, tb).transpose(1, 0, 2)
    else:
        mask_t = jnp.zeros((1, 4, tb), f32)   # unused placeholder
    sc = jnp.stack([jnp.asarray(i_2se, f32),
                    jnp.asarray(dNm1, f32)]).reshape(1, 2)

    def sds(shape):
        return (jax.ShapeDtypeStruct(shape, f32, vma=set(vma)) if vma
                else jax.ShapeDtypeStruct(shape, f32))

    nmt = mask_t.shape[0]
    if win_perm is None:
        pk_map = lambda w, p, t: (w, t)                       # noqa: E731
        row_map = lambda w, p, t: (w, 0)                      # noqa: E731
    else:
        # scalar-prefetch refs arrive AFTER the grid indices in index maps;
        # pk, mrow and out all live in SLOT order and are block-addressed
        # through the window permutation
        pk_map = lambda w, p, t, wp: (wp[w], t)               # noqa: E731
        row_map = lambda w, p, t, wp: (wp[w], 0)              # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0 if win_perm is None else 1,
        grid=(n_windows, 2, n_tiles),
        in_specs=[
            pl.BlockSpec((W, tb), pk_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((c_pad, W), row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles, 4, tb), lambda w, p, t, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nmt, 4, tb), lambda w, p, t, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, W), row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles, 4, tb), lambda w, p, t, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((W, 1), f32),    # s1
            pltpu.VMEM((W, 1), f32),    # s2 / eps-sum
            pltpu.VMEM((4, W), f32),    # axpy coeff rows [c1h, c1l, c2h, c2l]
            pltpu.VMEM((1, 1), f32),    # 2*sum(c1)+sum(c2) (complete mode)
        ],
    )
    kern = functools.partial(_sweep_kernel, n_mix, n_tiles, complete,
                             jax.lax.Precision.HIGHEST if interpret else None)
    if win_perm is None:
        operands = (pk_shuf, mrow_t, eps_t, mask_t, sc)
        body = kern
    else:
        operands = (jnp.asarray(win_perm, jnp.int32),
                    pk_shuf, mrow_t, eps_t, mask_t, sc)
        body = lambda wp_ref, *refs: kern(*refs)              # noqa: E731
    out, eps_out = pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=[sds((n_windows * 8, W)), sds((n_tiles, 4, tb))],
        interpret=interpret,
    )(*operands)
    eps_new = eps_out.transpose(1, 0, 2).reshape(4, NB)
    out4 = out.reshape(n_windows, 8, W)[:, :4, :]   # (nw, 4, W) row slabs
    return eps_new, out4.transpose(0, 2, 1).reshape(m_loc, 4)
