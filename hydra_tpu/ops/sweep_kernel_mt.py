"""Multi-trait whole-sweep mega-kernel: every stale window in ONE pallas_call.

The multi-trait per-window path (ops/window_kernels.py mt kernels) pays the
same fixed glue per window as single-trait — two kernel launches, the XLA
component/beta draw, a residual HBM round trip — multiplied by none of the
trait axis (traits ride the lane dimension). This kernel fuses the whole
sweep exactly like ops/sweep_kernel.py, with the (4T, NB) plane-major
multi-trait residual resident in the output VMEM buffer:

  grid = (n_windows, 2 phases, n_tiles)
    phase 0 (stats): accumulate per-trait dots s1 (W, T) over byte tiles
      (h-decode, complete mode reconstructs s1 = 2*sum(eps_t) - hs1); at
      the last tile run the per-(marker, trait) component/beta draw of
      samplers/bayesrrm_mt.py::window_body entirely in VMEM;
    phase 1 (axpy): decode again and apply the residual update as a true
      (T, W) x (W, tb) MXU matmul per plane, trait-masked in place.

Everything per-(marker, trait) is precomputed by the sampler into a
(m_loc, mt_mrow_width(K, T)) row array in shuffled order — K-blocks of T
columns so the in-kernel draw slices (W, T) arrays directly.

Scope: single marker shard (n_dev == n_ind == n_dcn == 1). Semantics are
identical to the per-window mt path (tests/test_sweep_kernel_mt.py
asserts chain equality). A second kernel, sweep_exact_mt, fuses the
EXACT-mode sweep (shared integer Gram + the (T, W) sequential recurrence
in VMEM) for complete genotypes + full phenotypes — 60.2 -> 10.75 ms at
T=4, M=10K x N=50K, W=64 (2026-08-19, v5e).

Reference behavior: BayesRRm_mt.cpp:290-1426 (present-but-disabled in the
reference; see samplers/bayesrrm_mt.py module docstring).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hydra_tpu.ops.window_kernels import _auto_tile, _decode_h_int, _decode_k

f32 = jnp.float32

# mrow column layout (T traits, K mixtures incl. zero; all blocks T wide):
#   0    mave, T mstd, 2T bold, 3T u, 4T nrm, 5T act
#   6T                logl_static, K blocks of T (j = 0..K-1)
#   6T + K*T          inv_denomk, K-1 blocks of T
#   6T + (2K-1)*T     sd_k, K-1 blocks of T
N_FIXED_BLOCKS = 6


def mt_mrow_width(k: int, t: int) -> int:
    return t * (N_FIXED_BLOCKS + 3 * k - 2)


def _sweep_mt_kernel(K: int, T: int, n_tiles: int, complete: bool,
                     O_PAD: int, PREC,
                     pk_ref, mrow_ref, eps_in_ref, tm_ref, sc_ref,
                     out_ref, eps_ref, s1_s, s2_s, c_s, csum_s):
    w = pl.program_id(0)
    ph = pl.program_id(1)
    t = pl.program_id(2)
    km1 = K - 1

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

        et = eps_ref[t]                        # (4T, tb)
        s1 = [None] * T
        s2 = [None] * T
        for k in range(4):
            if complete:
                g = _decode_h_int(pk32, k)     # h-decode (see module doc)
                m = None
            else:
                g, m = _decode_k(pk32, k)
            for tt in range(T):
                e = et[k * T + tt: k * T + tt + 1, :]      # (1, tb)
                a = jnp.sum(g * e, axis=1, keepdims=True)  # (W, 1)
                s1[tt] = a if s1[tt] is None else s1[tt] + a
                if complete:
                    b = jnp.sum(e).reshape(1, 1)
                    s2[tt] = b if s2[tt] is None else s2[tt] + b
                else:
                    b = jnp.sum(m * e, axis=1, keepdims=True)
                    s2[tt] = b if s2[tt] is None else s2[tt] + b
        for tt in range(T):
            s1_s[:, tt:tt + 1] += s1[tt]
            if complete:
                s2_s[0:1, tt:tt + 1] += s2[tt]
            else:
                s2_s[:, tt:tt + 1] += s2[tt]

        # ---- per-(marker, trait) draw on the last tile ----
        # Runs in (T, W) ROW layout: a (W, T) op at T=4 uses 4 of 128
        # lanes across ceil(W/8) vregs (8x the instructions at W=64);
        # (T, W) packs the whole draw into ~1 vreg per op. Only the
        # accumulated s1/s2 columns get transposed, and the c1/c2
        # coefficients land in rows with no relayout at all.
        @pl.when(t == n_tiles - 1)
        def _draw():
            i2se = sc_ref[:, 0:1]              # (T, 1)
            dNm1 = sc_ref[:, 1:2]              # (T, 1)
            mave = mrow_ref[0:T, :]
            mstd = mrow_ref[T:2 * T, :]
            bold = mrow_ref[2 * T:3 * T, :]
            u = mrow_ref[3 * T:4 * T, :]
            nrm = mrow_ref[4 * T:5 * T, :]
            act = mrow_ref[5 * T:6 * T, :]
            if complete:
                s2v = jnp.transpose(s2_s[0:1, :])        # (T, 1)
                # h-decode reconstruction
                s1v = 2.0 * s2v - jnp.transpose(s1_s[:, :])
            else:
                s2v = jnp.transpose(s2_s[:, :])
                s1v = jnp.transpose(s1_s[:, :])
            num0 = mstd * (s1v - mave * s2v) + bold * dNm1     # (T, W)

            bl, bi, bs = (6 * T, (6 + K) * T, (6 + 2 * K - 1) * T)
            logls = [mrow_ref[bl:bl + T, :]]
            muks = []
            for j in range(km1):
                muk = num0 * mrow_ref[bi + j * T:bi + (j + 1) * T, :]
                muks.append(muk)
                logls.append(mrow_ref[bl + (j + 1) * T:bl + (j + 2) * T, :]
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
                bnz = bnz + sel * (
                    muks[j] + nrm * mrow_ref[bs + j * T:bs + (j + 1) * T, :])
            pos = jnp.where(compf > 0.0, 1.0, 0.0)
            bnew = bnz * pos * act
            compf = compf * act
            acum = probs[0] * act + (1.0 - act)   # P(zero comp) (.acu)
            # scaled residual coefficients (window_body: dbeta includes mstd)
            c1 = (bold - bnew) * mstd                          # (T, W)
            c2 = -c1 * mave
            c1h = c1.astype(jnp.bfloat16).astype(f32)
            c_s[0:T, :] = c1h
            c_s[T:2 * T, :] = c1 - c1h
            if complete:
                # per-trait constant term of the h-decode axpy:
                # 2*sum(c1) + sum(c2) over W, directly a (T, 1) column
                csum_s[:, :] = (2.0 * jnp.sum(c1, axis=1, keepdims=True)
                                + jnp.sum(c2, axis=1, keepdims=True))
            else:
                c2h = c2.astype(jnp.bfloat16).astype(f32)
                c_s[2 * T:3 * T, :] = c2h
                c_s[3 * T:4 * T, :] = c2 - c2h
            out_ref[0:T, :] = bnew
            out_ref[T:2 * T, :] = compf
            out_ref[2 * T:3 * T, :] = acum
            if O_PAD > 3 * T:
                out_ref[3 * T:O_PAD, :] = jnp.zeros_like(
                    out_ref[3 * T:O_PAD, :])

    @pl.when(ph == 1)
    def _axpy():
        c1h = c_s[0:T, :]                      # (T, W)
        c1l = c_s[T:2 * T, :]
        if not complete:
            c2h = c_s[2 * T:3 * T, :]
            c2l = c_s[3 * T:4 * T, :]
        for k in range(4):
            if complete:
                h = _decode_h_int(pk32, k)
                d = (csum_s[:, :]
                     - jnp.dot(c1h, h, precision=PREC,
                               preferred_element_type=f32)
                     - jnp.dot(c1l, h, precision=PREC,
                               preferred_element_type=f32))
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
            # trait-mask rows zero NaN-masked individuals AND pad lanes
            d = d * tm_ref[t, k * T:(k + 1) * T, :]
            eps_ref[t, k * T:(k + 1) * T, :] += d


def sweep_stale_mt(pk_shuf: jax.Array, eps_t: jax.Array, tm_t: jax.Array,
                   mrow: jax.Array, i_2se: jax.Array, dNm1: jax.Array, *,
                   window: int, n_mix: int, n_traits: int, complete: bool,
                   tile_bytes: int = 0,
                   win_perm: Optional[jax.Array] = None,
                   vma=None, interpret: bool = False
                   ) -> Tuple[jax.Array, jax.Array]:
    """Run a full multi-trait stale-window sweep in one kernel launch.

    pk_shuf: (m_loc, NB) uint8 in SHUFFLED marker order; eps_t / tm_t:
    (4T, NB) plane-major multi-trait residual / trait mask
    (deinterleave_mt); mrow: (m_loc, mt_mrow_width(K, T)) rows in the same
    order; i_2se / dNm1: (T,) per-trait scalars.

    win_perm (block schedule): (n_windows,) int32 window permutation —
    pk_shuf, mrow and the returned out are then all in SLOT order, block-
    addressed through the permutation (no gather, no scatter, no second
    HBM copy; see ops/sweep_kernel.sweep_stale).

    Returns (eps_t', out) with out columns [bnew (T), compf (T), acum (T)]
    per shuffled marker.
    """
    m_loc, NB = pk_shuf.shape
    T = n_traits
    assert mrow.shape[1] == mt_mrow_width(n_mix, T), (mrow.shape, n_mix, T)
    assert m_loc % window == 0, (m_loc, window)
    W = window
    n_windows = m_loc // W
    tb = tile_bytes if tile_bytes else _auto_tile(NB, W, 3.0)
    n_tiles = NB // tb
    C = mrow.shape[1]

    # Marker rows per window, TRANSPOSED (the draw runs in (T, W) rows).
    # Compiled Mosaic requires the block's last dim be 128-divisible OR
    # equal to the array's, so the per-window (C, W) slabs stack along
    # the SUBLANE dim — array (n_windows*C_pad, W), block (C_pad, W) at
    # row-block w — making W the full last dim (any window width legal).
    c_pad = -(-C // 8) * 8
    o_pad = -(-3 * T // 8) * 8
    mrow_r = jnp.transpose(mrow.reshape(n_windows, W, C), (0, 2, 1))
    mrow_r = jnp.pad(mrow_r, ((0, 0), (0, c_pad - C), (0, 0)))
    mrow_r = mrow_r.reshape(n_windows * c_pad, W)
    eps_r = eps_t.reshape(4 * T, n_tiles, tb).transpose(1, 0, 2)
    tm_r = tm_t.reshape(4 * T, n_tiles, tb).transpose(1, 0, 2)
    sc = jnp.stack([i_2se.astype(f32), dNm1.astype(f32)], axis=1)  # (T, 2)

    def sds(shape):
        return (jax.ShapeDtypeStruct(shape, f32, vma=set(vma)) if vma
                else jax.ShapeDtypeStruct(shape, f32))

    if win_perm is None:
        pk_map = lambda w, p, t: (w, t)                       # noqa: E731
        row_map = lambda w, p, t: (w, 0)                      # noqa: E731
    else:
        # scalar-prefetch refs arrive AFTER the grid indices in index maps;
        # pk, mrow and out all live in SLOT order (sweep_stale docstring)
        pk_map = lambda w, p, t, wp: (wp[w], t)               # noqa: E731
        row_map = lambda w, p, t, wp: (wp[w], 0)              # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0 if win_perm is None else 1,
        grid=(n_windows, 2, n_tiles),
        in_specs=[
            pl.BlockSpec((W, tb), pk_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((c_pad, W), row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles, 4 * T, tb), lambda w, p, t, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles, 4 * T, tb), lambda w, p, t, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 2), lambda w, p, t, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((o_pad, W), row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles, 4 * T, tb), lambda w, p, t, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((W, T), f32),        # s1 (hs1 in complete mode)
            pltpu.VMEM((W, T), f32),        # s2 / per-trait eps sums
            pltpu.VMEM((4 * T, W), f32),    # axpy coeff rows
            pltpu.VMEM((T, 1), f32),        # h-decode constant per trait
        ],
    )
    # Interpret mode runs the trace through regular XLA-TPU, whose
    # default-precision f32 dots truncate operands to bf16 AND whose
    # excess-precision simplifier folds the in-trace f32->bf16->f32 hi/lo
    # split (measured 1.5e-3 rel-err on the axpy). Force HIGHEST there so
    # interpret is a valid golden reference; compiled Mosaic honors the
    # split and keeps the fast default (scripts/repro_mt.py).
    prec = jax.lax.Precision.HIGHEST if interpret else None
    kern = functools.partial(_sweep_mt_kernel, n_mix, T, n_tiles, complete,
                             o_pad, prec)
    if win_perm is None:
        operands = (pk_shuf, mrow_r, eps_r, tm_r, sc)
        body = kern
    else:
        operands = (jnp.asarray(win_perm, jnp.int32),
                    pk_shuf, mrow_r, eps_r, tm_r, sc)
        body = lambda wp_ref, *refs: kern(*refs)              # noqa: E731
    out, eps_out = pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=[sds((n_windows * o_pad, W)), sds((n_tiles, 4 * T, tb))],
        interpret=interpret,
    )(*operands)
    eps_new = eps_out.transpose(1, 0, 2).reshape(4 * T, NB)
    out2 = out.reshape(n_windows, o_pad, W)[:, :3 * T, :]
    return eps_new, out2.transpose(0, 2, 1).reshape(m_loc, 3 * T)


def _sweep_exact_mt_kernel(K: int, T: int, n_tiles: int, O_PAD: int, PREC,
                           pk_ref, mrow_ref, eps_in_ref, tm_ref, sc_ref,
                           out_ref, eps_ref, s1_s, s2_s, gram_s, c_s,
                           csum_s, v_s, db_s):
    """Whole-sweep EXACT multi-trait kernel (complete genotypes + full
    phenotypes ONLY — the constructor gates it): phase 0 accumulates the
    per-trait dots AND the trait-SHARED window Gram (one integer bf16 MXU
    pass per plane — full phenotypes make the per-trait masked stats
    collapse to the genotype stats, see samplers/bayesrrm_mt.py), then
    runs the W-step sequential recurrence for all T traits at once in
    (T, W) row layout; phase 1 applies the h-decode axpy per trait.

    Reference semantics: sync-rate=1 of BayesRRm_mt.cpp:290-1426 per
    trait (window-invariant; tests assert W=1 == W=4 chains)."""
    w = pl.program_id(0)
    ph = pl.program_id(1)
    t = pl.program_id(2)
    km1 = K - 1
    W = mrow_ref.shape[1]

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
            gram_s[:, :] = jnp.zeros_like(gram_s)
            v_s[:, :] = jnp.zeros_like(v_s)

        et = eps_ref[t]                        # (4T, tb)
        s1 = [None] * T
        s2 = [None] * T
        vv = None
        ct = (((1,), (1,)), ((), ()))
        for k in range(4):
            g, _m = _decode_k(pk32, k)
            for tt in range(T):
                e = et[k * T + tt: k * T + tt + 1, :]      # (1, tb)
                a = jnp.sum(g * e, axis=1, keepdims=True)  # (W, 1)
                s1[tt] = a if s1[tt] is None else s1[tt] + a
                b = jnp.sum(e).reshape(1, 1)   # mask dot == sum(eps_t)
                s2[tt] = b if s2[tt] is None else s2[tt] + b
            c = jnp.sum(g, axis=1, keepdims=True)
            vv = c if vv is None else vv + c
            gb = g.astype(jnp.bfloat16)
            gram_s[:, :] += jax.lax.dot_general(
                gb, gb, ct, precision=PREC, preferred_element_type=f32)
        for tt in range(T):
            s1_s[:, tt:tt + 1] += s1[tt]
            s2_s[0:1, tt:tt + 1] += s2[tt]
        v_s[:, :] += vv

        # ---- W-step sequential recurrence, all T traits per step ----
        @pl.when(t == n_tiles - 1)
        def _recur():
            i2se = sc_ref[:, 0:1]              # (T, 1)
            dNm1 = sc_ref[:, 1:2]
            n_real = sc_ref[0, 2]
            mave = mrow_ref[0:T, :]            # (T, W) — trait-shared rows
            mstd = mrow_ref[T:2 * T, :]
            bold = mrow_ref[2 * T:3 * T, :]
            # standardize the shared integer Gram (rank-1 corrections;
            # trait 0's stats row == every trait's, full phenotypes)
            mave_r = mave[0:1, :]              # (1, W)
            mstd_r = mstd[0:1, :]
            v_r = jnp.transpose(v_s[:, :])     # (1, W)
            gram_s[:, :] = (jnp.transpose(mstd_r) * mstd_r) * (
                gram_s[:, :] - jnp.transpose(mave_r) * v_r
                - v_s[:, :] * mave_r
                + n_real * (jnp.transpose(mave_r) * mave_r))
            s2v = jnp.transpose(s2_s[0:1, :])  # (T, 1) per-trait eps sums
            num0 = mstd * (jnp.transpose(s1_s[:, :]) - mave * s2v) \
                + bold * dNm1                  # (T, W)
            out_ref[:, :] = jnp.zeros_like(out_ref)
            db_s[:, :] = jnp.zeros_like(db_s)
            lanes = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
            bl, bi, bs = (6 * T, (6 + K) * T, (6 + 2 * K - 1) * T)

            def _mt_step(j, carry):
                # lane-vectorized draw with loop-carried result rows (see
                # sweep_kernel.py _sweep_exact_kernel: the per-step colv
                # extractions were the recurrence's dominant cost; every
                # quantity is now a static (T, W) row view with marker j's
                # (T, 1) `num` broadcast, and only lane j survives the
                # onehot accumulate)
                b_row, c_row, a_row, db_row = carry          # (T, W)
                onehot = (lanes == j).astype(f32)            # (1, W)
                grow = gram_s[pl.ds(j, 1), :]                # (1, W)
                num = jnp.sum(num0 * onehot + grow * db_row,
                              axis=1, keepdims=True)         # (T, 1)
                logl0 = mrow_ref[bl:bl + T, :]
                mx = logl0
                muks, logls = [], []
                for k in range(km1):
                    mu_k = num * mrow_ref[bi + k * T:bi + (k + 1) * T, :]
                    muks.append(mu_k)
                    l = (mrow_ref[bl + (k + 1) * T:bl + (k + 2) * T, :]
                         + mu_k * num * i2se)
                    logls.append(l)
                    mx = jnp.maximum(mx, l)
                pr0 = jnp.exp(jnp.maximum(logl0 - mx, -60.0))
                s = pr0
                prs = []
                for l in logls:
                    pk_ = jnp.exp(jnp.maximum(l - mx, -60.0))
                    prs.append(pk_)
                    s = s + pk_
                u_s = mrow_ref[3 * T:4 * T, :] * s
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
                    sd_sel = sd_sel + selk * mrow_ref[bs + k * T:
                                                      bs + (k + 1) * T, :]
                act = mrow_ref[5 * T:6 * T, :]
                pos = jnp.where(compf > 0.0, 1.0, 0.0)
                beta_new = pos * act * (mu_sel
                                        + mrow_ref[4 * T:5 * T, :] * sd_sel)
                compf = compf * act
                acum0 = (pr0 / s) * act + (1.0 - act)
                dbeta_j = bold - beta_new                    # (T, W)
                return (b_row + beta_new * onehot,
                        c_row + compf * onehot,
                        a_row + acum0 * onehot,
                        db_row + dbeta_j * onehot)

            zt = jnp.zeros((T, W), f32)
            b_row, c_row, a_row, db_row = jax.lax.fori_loop(
                0, W, _mt_step, (zt, zt, zt, zt))
            out_ref[0:T, :] = b_row
            out_ref[T:2 * T, :] = c_row
            out_ref[2 * T:3 * T, :] = a_row
            db_s[:, :] = db_row
            if O_PAD > 3 * T:
                out_ref[3 * T:O_PAD, :] = jnp.zeros_like(
                    out_ref[3 * T:O_PAD, :])

            c1 = db_s[:, :] * mstd                           # (T, W)
            c2 = -c1 * mave
            c1h = c1.astype(jnp.bfloat16).astype(f32)
            c_s[0:T, :] = c1h
            c_s[T:2 * T, :] = c1 - c1h
            # h-decode axpy constant (see _sweep_mt_kernel)
            csum_s[:, :] = (2.0 * jnp.sum(c1, axis=1, keepdims=True)
                            + jnp.sum(c2, axis=1, keepdims=True))

    @pl.when(ph == 1)
    def _axpy():
        c1h = c_s[0:T, :]
        c1l = c_s[T:2 * T, :]
        for k in range(4):
            h = _decode_h_int(pk32, k)
            d = (csum_s[:, :]
                 - jnp.dot(c1h, h, precision=PREC,
                           preferred_element_type=f32)
                 - jnp.dot(c1l, h, precision=PREC,
                           preferred_element_type=f32))
            # trait-mask rows equal the lane mask here (full phenotypes):
            # they null pad lanes, incl. the csum constant
            d = d * tm_ref[t, k * T:(k + 1) * T, :]
            eps_ref[t, k * T:(k + 1) * T, :] += d


def sweep_exact_mt(pk_shuf: jax.Array, eps_t: jax.Array, tm_t: jax.Array,
                   mrow: jax.Array, i_2se: jax.Array, dNm1: jax.Array, *,
                   window: int, n_mix: int, n_traits: int,
                   tile_bytes: int = 0,
                   win_perm: Optional[jax.Array] = None,
                   vma=None, interpret: bool = False
                   ) -> Tuple[jax.Array, jax.Array]:
    """Run a full EXACT multi-trait sweep in one kernel launch.

    Same I/O contract as sweep_stale_mt (including win_perm block
    addressing — the chain stays exact sequential Gibbs; only the scan
    order changes). ONLY valid for complete genotypes + full phenotypes
    (trait-shared stats; the caller gates this — samplers/bayesrrm_mt.py).
    dNm1 must be (real N) - 1 for every trait (full phenotypes make them
    equal)."""
    m_loc, NB = pk_shuf.shape
    T = n_traits
    assert mrow.shape[1] == mt_mrow_width(n_mix, T), (mrow.shape, n_mix, T)
    assert m_loc % window == 0, (m_loc, window)
    W = window
    n_windows = m_loc // W
    tb = tile_bytes if tile_bytes else _auto_tile(NB, W, 4.0)
    n_tiles = NB // tb
    C = mrow.shape[1]

    c_pad = -(-C // 8) * 8
    o_pad = -(-3 * T // 8) * 8
    mrow_r = jnp.transpose(mrow.reshape(n_windows, W, C), (0, 2, 1))
    mrow_r = jnp.pad(mrow_r, ((0, 0), (0, c_pad - C), (0, 0)))
    mrow_r = mrow_r.reshape(n_windows * c_pad, W)
    eps_r = eps_t.reshape(4 * T, n_tiles, tb).transpose(1, 0, 2)
    tm_r = tm_t.reshape(4 * T, n_tiles, tb).transpose(1, 0, 2)
    sc = jnp.stack([i_2se.astype(f32), dNm1.astype(f32),
                    dNm1.astype(f32) + 1.0], axis=1)       # (T, 3)

    def sds(shape):
        return (jax.ShapeDtypeStruct(shape, f32, vma=set(vma)) if vma
                else jax.ShapeDtypeStruct(shape, f32))

    if win_perm is None:
        pk_map = lambda w, p, t: (w, t)                       # noqa: E731
        row_map = lambda w, p, t: (w, 0)                      # noqa: E731
    else:
        pk_map = lambda w, p, t, wp: (wp[w], t)               # noqa: E731
        row_map = lambda w, p, t, wp: (wp[w], 0)              # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0 if win_perm is None else 1,
        grid=(n_windows, 2, n_tiles),
        in_specs=[
            pl.BlockSpec((W, tb), pk_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((c_pad, W), row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles, 4 * T, tb), lambda w, p, t, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles, 4 * T, tb), lambda w, p, t, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 3), lambda w, p, t, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((o_pad, W), row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles, 4 * T, tb), lambda w, p, t, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((W, T), f32),        # s1 per trait
            pltpu.VMEM((W, T), f32),        # per-trait eps sums (row 0)
            pltpu.VMEM((W, W), f32),        # shared window Gram
            pltpu.VMEM((2 * T, W), f32),    # axpy coeff rows [c1h, c1l]
            pltpu.VMEM((T, 1), f32),        # h-decode constant per trait
            pltpu.VMEM((W, 1), f32),        # v = sum(g) per marker
            pltpu.VMEM((T, W), f32),        # dbeta accumulator
        ],
    )
    prec = jax.lax.Precision.HIGHEST if interpret else None
    kern = functools.partial(_sweep_exact_mt_kernel, n_mix, T, n_tiles,
                             o_pad, prec)
    if win_perm is None:
        operands = (pk_shuf, mrow_r, eps_r, tm_r, sc)
        body = kern
    else:
        operands = (jnp.asarray(win_perm, jnp.int32),
                    pk_shuf, mrow_r, eps_r, tm_r, sc)
        body = lambda wp_ref, *refs: kern(*refs)              # noqa: E731
    out, eps_out = pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=[sds((n_windows * o_pad, W)), sds((n_tiles, 4 * T, tb))],
        interpret=interpret,
    )(*operands)
    eps_new = eps_out.transpose(1, 0, 2).reshape(4 * T, NB)
    out2 = out.reshape(n_windows, o_pad, W)[:, :3 * T, :]
    return eps_new, out2.transpose(0, 2, 1).reshape(m_loc, 3 * T)
