"""BayesW whole-sweep mega-kernel: every stale window in ONE pallas_call.

The BayesW per-window path pays ~90 us of fixed glue per window on v5e
(measured: 16.4 ms at W=64 vs 5.8 ms at W=256 for M=10K x N=5K — fitting
cost = F + c*W gives F ~ 90 us, 86% of a W=64 window): the level-sums and
axpy kernel launches, the Gauss-Hermite marginal-likelihood XLA fusions,
the fixed-budget slice-sampling fori_loops (34 sequential micro-steps), and
the full-N vi refresh each dispatch separately. This kernel fuses the whole
sweep, holding BOTH the plane-major residual (output buffer) and vi
(scratch) resident in VMEM:

  grid = (n_windows, 2 phases, n_tiles)
    phase 0: accumulate the per-class level sums s1/s2 (+ mask dot, + total)
      over byte tiles from the resident vi; at the last tile run the whole
      draw — closed-form own-effect removal, adaptive Gauss-Hermite
      marginal likelihoods, component draw, and the fixed-budget slice
      sampler for the non-zero betas (utils/slice_sampler.py semantics,
      replacing the reference's ARS, BayesW_arms.cpp) — entirely in VMEM;
    phase 1: decode again, apply the residual axpy tile by tile, and
      refresh vi = exp(alpha*eps - EuMasc)*mask in place (BayesW.cpp:1832).

Everything per-marker is precomputed by the sampler into a
(m_loc, bw_mrow_width(K)) row array in shuffled order — including ALL the
randomness (component uniform, slice exponential + bracket + shrink
uniforms) derived with exactly the per-window path's key schedule, so the
mega path continues the same chain (tests/test_sweep_kernel_bw.py).

Scope: stale windows on a single marker shard (n_dev == n_ind == n_dcn ==
1); alpha, sigma_g, pi_l are constant across a sweep (the reference updates
them between marker loops, BayesW.cpp:1326-1905), which is what makes the
per-marker rows precomputable.

Reference behavior: BayesW.cpp:1480-1850 (marker loop: partial sums :1490,
GH marginal likelihoods :1532 -> :716, component draw :1539, ARS beta draw
:1562, residual + vi refresh :1642-1834), vectorized as in
samplers/bayesw.py::window_body.
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
EULER_MASCHERONI = 0.577215664901532   # EuMasc, BayesW.cpp:42


def _expm1(x):
    """Mosaic has no expm1 primitive. exp(x)-1 loses ~half the f32 bits for
    |x| << 1 (cancellation ~ eps/|x|); a quartic Taylor below 0.05 keeps the
    worst-case relative error ~1e-6 on either side — well inside the f32
    chain tolerance (F32_AUDIT.md)."""
    t = x * (1.0 + x * (0.5 + x * (1.0 / 6.0 + x * (1.0 / 24.0))))
    return jnp.where(jnp.abs(x) < 0.05, t, jnp.exp(x) - 1.0)

# mrow column layout (K = mixtures incl. zero, J = K-1, S = n_shrink):
#   0 mave, 1 inv_sd, 2 bold, 3 u, 4 act, 5 sf,
#   6 th0, 7 th1, 8 th2,            theta coefficients of the expm1 form
#   9 e0, 10 e1, 11 e2,             own-effect removal factors
#   12 ml0,                         pi0 * sqrt(pi) (zero-component ml)
#   13..13+J-1        pj            non-zero pi factors
#   +J                sqrt2ck_j     sqrt(2 c_k sigmaG)
#   +2J               adc_j         alpha^2 sigmaG c_k (sigma_ad)
#   +3J               two_ck_sg_j   2 c_k max(sigmaG, tiny)
#   +4J               slim_j        2 sqrt(sum sigmaG * c_k) (safe limit)
#   13+5J             le            slice exponential draw
#   14+5J             u_br          slice bracket uniform
#   15+5J..+S-1       uu_s          slice shrink uniforms
N_FIXED = 13


def bw_mrow_width(k: int, n_shrink: int) -> int:
    return N_FIXED + 5 * (k - 1) + 2 + n_shrink


def _sweep_bw_kernel(K: int, n_tiles: int, n_expand: int, n_shrink: int,
                     complete: bool, PREC, W_narrow: int, wp_ref,
                     pk_ref, mrow_ref, eps_in_ref, vi_in_ref, mask_ref,
                     ghx_ref, ghw_ref, sc_ref,
                     out_ref, eps_ref,
                     s1_s, s2_s, bvi_s, sall_s, c_s, csum_s, vi_s):
    w = pl.program_id(0)
    ph = pl.program_id(1)
    t = pl.program_id(2)
    km1 = K - 1

    @pl.when((w == 0) & (ph == 0))
    def _():
        eps_ref[t] = eps_in_ref[t]
        vi_s[t] = vi_in_ref[t]

    def _pk32():
        if not W_narrow:
            return pk_ref[:, :].astype(jnp.int32)  # (W, tb)
        # W = 1 (the exact-sequential mode): Mosaic requires pk blocks with
        # >= 8 sublanes, so the block holds the 8-row slab containing this
        # marker and the row is selected by an arithmetic one-hot sum over
        # sublanes (no dynamic slice; must run INSIDE the pl.when phase
        # bodies — the cond unifies the iota constant's varying-manual-axes
        # mark with the refs' in interpret mode)
        wslot = w if wp_ref is None else wp_ref[w]
        rows = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
        oh = jnp.where(rows == wslot % 8, 1, 0)
        return jnp.sum(pk_ref[:, :].astype(jnp.int32) * oh, axis=0,
                       keepdims=True)              # (1, tb)

    @pl.when(ph == 0)
    def _levels():
        pk32 = _pk32()

        @pl.when(t == 0)
        def _():
            s1_s[:, :] = jnp.zeros_like(s1_s)
            s2_s[:, :] = jnp.zeros_like(s2_s)
            bvi_s[:, :] = jnp.zeros_like(bvi_s)
            sall_s[:, :] = jnp.zeros_like(sall_s)

        vt = vi_s[t]                               # (4, tb)
        s1 = s2 = bv = None
        for k in range(4):
            v = vt[k:k + 1, :]                     # (1, tb)
            if complete:
                # h-decode (one op fewer); indicators in terms of h=2-g
                # (pads -> h=1 -> i1=1, nulled by v==0)
                h = _decode_h_int(pk32, k)
                i1 = h * (2.0 - h)
                i2 = (1.0 - h) * (1.0 - 0.5 * h)
            else:
                g, m = _decode_k(pk32, k)
                c = jnp.sum(m * v, axis=1, keepdims=True)
                bv = c if bv is None else bv + c
                i1 = g * (2.0 - g)
                i2 = g * (g - 1.0) * 0.5
            a = jnp.sum(i1 * v, axis=1, keepdims=True)     # (W, 1)
            b = jnp.sum(i2 * v, axis=1, keepdims=True)
            s1 = a if s1 is None else s1 + a
            s2 = b if s2 is None else s2 + b
        s1_s[:, :] += s1
        s2_s[:, :] += s2
        sall_s[0:1, 0:1] += jnp.sum(vt).reshape(1, 1)
        if not complete:
            bvi_s[:, :] += bv

        # ---- whole-window draw on the last tile ----
        # Runs entirely in (1, W) ROW layout: the 34-step slice sampler
        # plus the GH loop issue ~1500 vector ops per window, and a (W, 1)
        # column op costs ceil(W/8) vregs each using one lane (8x the
        # instructions at W=64). Only the accumulated level-sum columns
        # are transposed (3 relayouts/window, replacing the 2 c1/c2 ones);
        # the GH quadrature runs as (QP, W) with a sublane reduction.
        @pl.when(t == n_tiles - 1)
        def _draw():
            alpha = sc_ref[0, 0]
            mave = mrow_ref[0:1, :]
            inv_sd = mrow_ref[1:2, :]
            bold = mrow_ref[2:3, :]
            u = mrow_ref[3:4, :]
            act = mrow_ref[4:5, :]
            sf = mrow_ref[5:6, :]
            th0 = mrow_ref[6:7, :]
            th1 = mrow_ref[7:8, :]
            th2 = mrow_ref[8:9, :]
            s_all = sall_s[0:1, 0:1]
            s1 = jnp.transpose(s1_s[:, :])         # (1, W)
            s2 = jnp.transpose(s2_s[:, :])
            if complete:
                sm = jnp.zeros_like(s1)            # mask dot == total
            else:
                sm = s_all - jnp.transpose(bvi_s[:, :])
            s0 = s_all - s1 - s2 - sm

            # own-effect removal (tmp_vi recompute, BayesW.cpp:1499-1516)
            vi1 = s1 * mrow_ref[10:11, :]          # e1
            vi2 = s2 * mrow_ref[11:12, :]          # e2
            vsum = s0 * mrow_ref[9:10, :] + vi1 + vi2 + sm
            vi0 = vsum - vi1 - vi2

            exp_sum = (vi1 * (1.0 - 2.0 * mave)
                       + 4.0 * (1.0 - mave) * vi2
                       + vsum * mave * mave) * inv_sd * inv_sd

            # adaptive Gauss-Hermite marginal likelihoods
            # (BayesW.cpp:716-726); gh sublanes beyond Q carry x=0, w=0 so
            # they contribute exactly zero
            ghx = ghx_ref[:, :]                    # (QP, 1)
            ghw = ghw_ref[:, :]
            bp, bs, ba, bt, bl = (N_FIXED, N_FIXED + km1, N_FIXED + 2 * km1,
                                  N_FIXED + 3 * km1, N_FIXED + 4 * km1)
            mls = [mrow_ref[12:13, :]]             # ml0 = pi0 * sqrt(pi)
            for j in range(km1):
                sigma_ad = 1.0 / jnp.sqrt(
                    1.0 + mrow_ref[ba + j:ba + j + 1, :] * exp_sum)  # (1,W)
                s_nodes = sigma_ad * ghx                             # (QP,W)
                sq = s_nodes * mrow_ref[bs + j:bs + j + 1, :]
                temp = (-alpha * sq * sf
                        - vi0 * _expm1(th0 * sq)
                        - vi1 * _expm1(th1 * sq)
                        - vi2 * _expm1(th2 * sq)
                        - s_nodes * s_nodes)
                # sigma_ad = the adaptive substitution's Jacobian
                # (reference returns sigma*temp, BayesW.cpp:711)
                integral = sigma_ad * jnp.sum(ghw * jnp.exp(temp), axis=0,
                                              keepdims=True)         # (1,W)
                mls.append(mrow_ref[bp + j:bp + j + 1, :] * integral)

            sm_ml = mls[0]
            for mlj in mls[1:]:
                sm_ml = sm_ml + mlj
            # component draw: comp = min(#{cum probs < u}, km1), zeroed for
            # inactive markers (samplers/bayesw.py window_body)
            cum = mls[0] / sm_ml
            compf = jnp.where(u > cum, 1.0, 0.0)
            for j in range(km1):
                cum = cum + mls[j + 1] / sm_ml
                compf = compf + jnp.where(u > cum, 1.0, 0.0)
            compf = jnp.minimum(compf, float(km1)) * act

            # per-component scales for the beta draw
            ksel = jnp.maximum(compf - 1.0, 0.0)
            two_ck_sg = jnp.zeros_like(compf)
            slim = jnp.zeros_like(compf)
            for j in range(km1):
                sel = jnp.where(ksel == float(j), 1.0, 0.0)
                two_ck_sg = two_ck_sg + sel * mrow_ref[bt + j:bt + j + 1, :]
                slim = slim + sel * mrow_ref[bl + j:bl + j + 1, :]

            # ---- fixed-budget slice sampler on beta_dens ----
            # (BayesW.cpp:145-156 via utils/slice_sampler.py semantics)
            def logf(x):
                return (-alpha * x * sf
                        - vi0 * _expm1(th0 * x)
                        - vi1 * _expm1(th1 * x)
                        - vi2 * _expm1(th2 * x)
                        - x * x / two_ck_sg)

            width = jnp.maximum(slim / 5.0, 1e-3)
            lower = bold - slim
            upper = bold + slim
            br = N_FIXED + 5 * km1
            log_y = logf(bold) - mrow_ref[br:br + 1, :]          # le
            left = bold - width * mrow_ref[br + 1:br + 2, :]     # u_br
            right = left + width
            for _ in range(n_expand):
                left = jnp.where((logf(left) > log_y) & (left > lower),
                                 left - width, left)
                right = jnp.where((logf(right) > log_y) & (right < upper),
                                  right + width, right)
            left = jnp.maximum(left, lower)
            right = jnp.minimum(right, upper)
            x = bold
            accepted = jnp.zeros_like(bold)
            for s in range(n_shrink):
                uu = mrow_ref[br + 2 + s:br + 3 + s, :]
                xc = left + uu * (right - left)
                okf = jnp.where(logf(xc) > log_y, 1.0, 0.0)
                take = okf * (1.0 - accepted)
                x = jnp.where(take > 0.0, xc, x)
                accepted = jnp.maximum(accepted, okf)
                shrinkable = (1.0 - okf) * (1.0 - accepted)
                left = jnp.where((shrinkable > 0.0) & (xc < bold), xc, left)
                right = jnp.where((shrinkable > 0.0) & (xc >= bold), xc, right)
            x = jnp.where(accepted > 0.0, x, bold)
            draw = jnp.where(compf > 0.0, 1.0, 0.0) * act
            bnew = jnp.where(draw > 0.0, x, 0.0)

            dbeta = bold - bnew
            c1 = dbeta * inv_sd                    # (1, W) rows already
            c2 = -c1 * mave
            c1h = c1.astype(jnp.bfloat16).astype(f32)
            c_s[0:1, :] = c1h
            c_s[1:2, :] = c1 - c1h
            if complete:
                # 2*sum(c1) + sum(c2): constant term of the h-decode axpy
                csum_s[0:1, 0:1] = (2.0 * jnp.sum(c1)
                                    + jnp.sum(c2)).reshape(1, 1)
            else:
                c2h = c2.astype(jnp.bfloat16).astype(f32)
                c_s[2:3, :] = c2h
                c_s[3:4, :] = c2 - c2h
            out_ref[0:1, :] = bnew
            out_ref[1:2, :] = compf
            out_ref[2:3, :] = dbeta
            out_ref[3:8, :] = jnp.zeros_like(out_ref[3:8, :])  # pad rows

    @pl.when(ph == 1)
    def _axpy_refresh():
        pk32 = _pk32()
        alpha = sc_ref[0, 0]
        c1h = c_s[0:1, :]
        c1l = c_s[1:2, :]
        if not complete:
            c2h = c_s[2:3, :]
            c2l = c_s[3:4, :]
        for k in range(4):
            if complete:
                # h-decode: sum c1*g = 2*sum(c1) - sum c1*h; constant term
                # (incl. sum(c2)) precomputed into csum_s[0, 0]
                h = _decode_h_int(pk32, k)
                d = (csum_s[0:1, 0:1]
                     - jnp.dot(c1h, h, precision=PREC,
                               preferred_element_type=f32)
                     - jnp.dot(c1l, h, precision=PREC,
                               preferred_element_type=f32)
                     ) * mask_ref[t, k:k + 1, :]
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
            e = eps_ref[t, k:k + 1, :] + d
            eps_ref[t, k:k + 1, :] = e
            # vi refresh in place (BayesW.cpp:1832-1834)
            vi_s[t, k:k + 1, :] = (jnp.exp(alpha * e - EULER_MASCHERONI)
                                   * mask_ref[t, k:k + 1, :])


def sweep_stale_bw(pk_shuf: jax.Array, eps_d: jax.Array, vi_d: jax.Array,
                   mrow: jax.Array, gh_x_pad: jax.Array, gh_w_pad: jax.Array,
                   alpha, *, window: int, n_mix: int, complete: bool,
                   ind_mask4: jax.Array, n_expand: int = 10,
                   n_shrink: int = 24, tile_bytes: int = 0,
                   win_perm: Optional[jax.Array] = None, vma=None,
                   interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Run a full BayesW stale-window sweep in one kernel launch.

    pk_shuf: (m_loc, NB) uint8 packed genotypes in SHUFFLED marker order;
    eps_d / vi_d: (4, NB) plane-major residual and vi; mrow:
    (m_loc, bw_mrow_width(K, n_shrink)) per-marker rows (same order);
    gh_x_pad / gh_w_pad: (1, QP) lane-padded Gauss-Hermite nodes / adjusted
    weights (pad lanes MUST be x=0, w=0); ind_mask4: (4, NB) plane-major
    individual mask (always required — the vi refresh needs it).

    win_perm (block schedule): (n_windows,) int32 window permutation —
    pk_shuf, mrow and the returned out are then all in SLOT order, block-
    addressed through the permutation (no gather, no scatter, no second
    HBM copy; see ops/sweep_kernel.sweep_stale).

    Returns (eps_d', out) with out columns [beta_new, comp, dbeta, 0] per
    shuffled marker.
    """
    m_loc, NB = pk_shuf.shape
    assert mrow.shape[1] == bw_mrow_width(n_mix, n_shrink), \
        (mrow.shape, n_mix, n_shrink)
    assert m_loc % window == 0, (m_loc, window)
    W = window
    narrow = W if W == 1 else 0         # exact-sequential W=1 mode
    assert W == 1 or W >= 8, W          # Mosaic sublane rule (see narrow)
    if narrow:
        assert m_loc % 8 == 0, m_loc
    n_windows = m_loc // W
    tb = tile_bytes if tile_bytes else _auto_tile(NB, W, 3.0)
    n_tiles = NB // tb
    C = mrow.shape[1]
    QP = gh_x_pad.shape[1]

    # Marker rows per window, TRANSPOSED (draw consumes (1, W) rows), and
    # GH tables flipped to (QP, 1) columns for the (QP, W) node grids.
    # Compiled Mosaic requires the block's last dim be 128-divisible OR
    # equal to the array's, so the per-window (C, W) slabs stack along the
    # SUBLANE dim — array (n_windows*C_pad, W), block (C_pad, W) at row-
    # block w — making W the full last dim (any window width legal).
    c_pad = -(-C // 8) * 8
    mrow_t = jnp.transpose(mrow.reshape(n_windows, W, C), (0, 2, 1))
    mrow_t = jnp.pad(mrow_t, ((0, 0), (0, c_pad - C), (0, 0)))
    mrow_t = mrow_t.reshape(n_windows * c_pad, W)
    ghx_c = jnp.transpose(gh_x_pad)                            # (QP, 1)
    ghw_c = jnp.transpose(gh_w_pad)
    eps_t = eps_d.reshape(4, n_tiles, tb).transpose(1, 0, 2)   # (nt, 4, tb)
    vi_t = vi_d.reshape(4, n_tiles, tb).transpose(1, 0, 2)
    mask_t = ind_mask4.reshape(4, n_tiles, tb).transpose(1, 0, 2)
    sc = jnp.asarray(alpha, f32).reshape(1, 1)

    def sds(shape):
        return (jax.ShapeDtypeStruct(shape, f32, vma=set(vma)) if vma
                else jax.ShapeDtypeStruct(shape, f32))

    if win_perm is None:
        if narrow:
            # pk blocks need >= 8 sublanes: fetch the 8-row slab holding
            # this window (the kernel selects the W rows by sublane slice)
            pk_map = lambda w, p, t: ((w * W) // 8, t)        # noqa: E731
        else:
            pk_map = lambda w, p, t: (w, t)                   # noqa: E731
        row_map = lambda w, p, t: (w, 0)                      # noqa: E731
    else:
        # scalar-prefetch refs arrive AFTER the grid indices in index maps;
        # pk, mrow and out all live in SLOT order (sweep_stale docstring)
        if narrow:
            pk_map = lambda w, p, t, wp: ((wp[w] * W) // 8, t)  # noqa: E731
        else:
            pk_map = lambda w, p, t, wp: (wp[w], t)           # noqa: E731
        row_map = lambda w, p, t, wp: (wp[w], 0)              # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0 if win_perm is None else 1,
        grid=(n_windows, 2, n_tiles),
        in_specs=[
            pl.BlockSpec((8 if narrow else W, tb), pk_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_pad, W), row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles, 4, tb), lambda w, p, t, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles, 4, tb), lambda w, p, t, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles, 4, tb), lambda w, p, t, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((QP, 1), lambda w, p, t, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((QP, 1), lambda w, p, t, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, W), row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles, 4, tb), lambda w, p, t, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((W, 1), f32),           # s1
            pltpu.VMEM((W, 1), f32),           # s2
            pltpu.VMEM((W, 1), f32),           # mask dot
            pltpu.VMEM((1, 1), f32),           # total sum(vi)
            pltpu.VMEM((4, W), f32),           # axpy coeff rows
            pltpu.VMEM((1, 1), f32),           # 2*sum(c1)+sum(c2) (complete)
            pltpu.VMEM((n_tiles, 4, tb), f32),  # resident vi
        ],
    )
    kern = functools.partial(_sweep_bw_kernel, n_mix, n_tiles, n_expand,
                             n_shrink, complete,
                             jax.lax.Precision.HIGHEST if interpret else None,
                             narrow)
    if win_perm is None:
        operands = (pk_shuf, mrow_t, eps_t, vi_t, mask_t, ghx_c, ghw_c, sc)
        body = functools.partial(kern, None)
    else:
        operands = (jnp.asarray(win_perm, jnp.int32),
                    pk_shuf, mrow_t, eps_t, vi_t, mask_t, ghx_c, ghw_c, sc)
        body = lambda wp_ref, *refs: kern(wp_ref, *refs)      # noqa: E731
    out, eps_out = pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=[sds((n_windows * 8, W)), sds((n_tiles, 4, tb))],
        interpret=interpret,
    )(*operands)
    eps_new = eps_out.transpose(1, 0, 2).reshape(4, NB)
    out4 = out.reshape(n_windows, 8, W)[:, :4, :]   # (nw, 4, W) row slabs
    return eps_new, out4.transpose(0, 2, 1).reshape(m_loc, 4)
