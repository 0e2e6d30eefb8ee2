"""Pallas kernels fusing 2-bit decode into the window matmuls.

The jnp path materializes the decoded genotype/mask planes (two W x N float32
arrays) in HBM every window — 32x the traffic of the packed bytes. These
kernels decode *in VMEM* and feed the MXU directly, so HBM sees only the
packed bytes (W x N/4 uint8), the residual, and the small outputs.

Interleave-free decode: instead of unpacking a byte into 4 adjacent
individuals (a lane-interleaving relayout Mosaic dislikes), the residual is
passed in "deinterleaved" layout eps_d[k, b] = eps[4b + k]; each of the 4
bit-planes then pairs with its own residual row and no shuffling is needed:

    s1 = sum_k  G_k @ eps_d[k],     G_k = geno((packed >> 2k) & 3)
    s2 = sum_k  M_k @ eps_d[k],     M_k = (code != missing)
    Gram += sum_k X_k @ X_k^T,      X_k = (G_k - mave*M_k) * mstd

which is exactly the LUT dot product of BayesRRm.cpp:1774-1808 and the Gram
matrix of the exact window scheme, in one pass over the packed bytes.

All kernels tile the individual (byte) dimension via the Pallas grid and
accumulate into their outputs across grid steps.

Reduction engine choice (measured on v5e):
  * window_stats / window_level_sums reduce over the LANE (byte) dimension
    to a (W, 1) output. Lowering that as an MXU matvec is pathological —
    one live output column and (with precision=HIGHEST) a 6-pass f32
    decomposition cost ~420 us per kernel invocation; the sweep was
    kernel-bound, 11-60 ms at M=10K x N=50K. These kernels instead use
    plain elementwise multiply + jnp.sum lane reductions, which Mosaic
    lowers onto the VPU at full f32: 4.4 ms/sweep, identical numerics.
  * window_axpy reduces over the SUBLANE (marker) dimension to a (4, TB)
    row; the MXU vecmat is fine there and keeps precision=HIGHEST (f32
    multi-pass), which measured on par with a VPU sublane reduction.
  * the exact-mode Gram is a real (W, N)x(N, W) matmul and stays on the
    MXU with precision=HIGHEST (bf16 rounding is ~4e-3 — too lossy for
    the sequential Gibbs correction).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

f32 = jnp.float32


def _pick_tile(nb: int, preferred: int) -> int:
    """Largest 128-multiple tile <= preferred that divides nb (nb is always a
    128-multiple thanks to IND_ALIGN padding)."""
    if nb <= preferred:
        return nb
    for cand in range(preferred, 0, -128):
        if nb % cand == 0:
            return cand
    return nb


def _auto_tile(nb: int, w: int, f32_planes: float) -> int:
    """Byte-dimension tile sized to a ~4 MB VMEM working set.

    Each grid step costs ~1.4 us of fixed overhead on v5e, so small tiles
    make the kernels latency-bound (measured: 2x49 steps/window = 137 us of
    a 138 us window at NB=12544 with 512-byte tiles). Size the tile so the
    live working set — packed bytes (w x tb) plus `f32_planes` decoded f32
    planes of (w, tb) — fills ~4 MB, leaving headroom for Mosaic's double
    buffering within the ~16 MB VMEM."""
    budget = 4 * 1024 * 1024
    per_byte = 1 + 4 * f32_planes
    pref = int(budget / (max(w, 8) * per_byte))
    return _pick_tile(nb, max(512, (pref // 128) * 128))


def _decode_k(pk32, k):
    """Decode bit-plane k of H-PACKED bytes (ops/decode.py: crumb stores
    h = 2 - geno, missing = 3) into (geno, mask) f32 planes.

    No bool vectors (Mosaic i1 relayout is unreliable), no u8 ops (u8
    shifts and u8->f32 casts don't legalize): callers pass
    pk.astype(int32) once. 6 int ops + 2 casts — vs 8+3 for the PLINK
    coding this replaced (the repack moves decode work to a one-time
    host LUT)."""
    c = (pk32 >> (2 * k)) & 3
    mi = 1 - ((c + 1) >> 2)             # 0 iff missing (c == 3)
    g = ((2 - c) * mi).astype(f32)
    return g, mi.astype(f32)


def _decode_h_int(pk32, k):
    """h-plane decode of H-PACKED bytes for COMPLETE data: the crumb IS
    h = 2 - g, so the decode is shift+and+cast (3 ops — the cheapest
    possible per-plane decode; the PLINK arithmetic version needed 5).
    Consumers reconstruct the genotype dot via
        sum_i g_i v_i = 2 * sum_i v_i - sum_i h_i v_i
    (the 2*sum term is a cheap row reduce the wrapper folds in). PAD
    individuals (padding bytes 0xFF after the repack) give h = 3 — every
    complete-mode consumer nullifies pad lanes: stats/level sums multiply
    by a residual/vi vector that is zero on pads, and the axpy output is
    multiplied by the individual mask (window_axpy docstring contract;
    in-kernel mask_ref in the sweep kernels)."""
    return ((pk32 >> (2 * k)) & 3).astype(f32)


def _stats_kernel(exact: bool, complete: bool, pk_ref, eps_ref, mave_ref,
                  mstd_ref, s1_ref, s2_ref, gram_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        s1_ref[:, :] = jnp.zeros_like(s1_ref)
        if exact or not complete:
            # exact+complete reuses the s2 slot as the v = sum(g) accumulator
            s2_ref[:, :] = jnp.zeros_like(s2_ref)
        if exact:
            gram_ref[:, :] = jnp.zeros_like(gram_ref)

    pk32 = pk_ref[:, :].astype(jnp.int32)  # (W, TB) widened once
    mave = mave_ref[:, :]                  # (W, 1)
    mstd = mstd_ref[:, :]
    s1 = s2 = None
    for k in range(4):
        if complete and not exact:
            # h-decode (one op fewer); the wrapper reconstructs
            # s1 = 2*sum(eps) - hs1 outside the kernel
            g = _decode_h_int(pk32, k)
            m = None
        else:
            g, m = _decode_k(pk32, k)
        e = eps_ref[k:k + 1, :]            # (1, TB) row — broadcasts over W
        # VPU lane reduction, not an MXU matvec (see module docstring)
        a = jnp.sum(g * e, axis=1, keepdims=True)       # (W, 1)
        s1 = a if s1 is None else s1 + a
        if exact and complete:
            # INTEGER Gram: g takes values {0, 1, 2} (pads decode to 0), so
            # the raw plane Gram sum g_j.g_k is EXACT in one bf16 MXU pass
            # (products <= 4, f32 accumulation). The mask plane equals the
            # lane mask for every marker, so its cross terms collapse to
            # rank-1 corrections from v = sum(g) per marker and n = #real
            # lanes — applied once per window by the wrapper, NOT per tile:
            #   gram = mstd_j mstd_k (Ggg - mave_j v_k - mave_k v_j
            #                          + n mave_j mave_k).
            # Replaces the standardize + bf16 hi/lo split + 2 dots of the
            # general path with one cast + ONE dot per plane, and is MORE
            # accurate (the split drops lo@lo; this is exact + one f32
            # rounding per correction term).
            b = jnp.sum(g, axis=1, keepdims=True)        # v accumulator
            s2 = b if s2 is None else s2 + b
            gb = g.astype(jnp.bfloat16)
            ct = (((1,), (1,)), ((), ()))
            gram_ref[:, :] += jax.lax.dot_general(
                gb, gb, ct, preferred_element_type=f32)
            continue
        if not complete:
            b = jnp.sum(m * e, axis=1, keepdims=True)
            s2 = b if s2 is None else s2 + b
        if exact:
            x = (g - mave * m) * mstd
            # Manual 2-pass f32 matmul: Mosaic quietly ignores
            # precision=HIGHEST for in-kernel dot_general (measured 3.3e-3
            # rel-err on hardware, bf16-level). Splitting into bf16
            # hi/lo parts and dropping only lo@lo keeps ~1e-5; the two
            # cross terms are transposes of each other, so ONE MXU pass +
            # a (W, W) VPU transpose replaces the third pass (bitwise the
            # same products and accumulation order).
            xh = x.astype(jnp.bfloat16).astype(f32)
            xl = x - xh
            ct = (((1,), (1,)), ((), ()))
            cross = jax.lax.dot_general(xh, xl, ct,
                                        preferred_element_type=f32)
            gram_ref[:, :] += (
                jax.lax.dot_general(xh, xh, ct, preferred_element_type=f32)
                + cross + jnp.transpose(cross))
    s1_ref[:, :] += s1
    if s2 is not None:
        s2_ref[:, :] += s2


def window_stats(packed: jax.Array, eps_d: jax.Array, mave: jax.Array,
                 mstd: jax.Array, exact: bool, tile_bytes: int = 0,
                 vma=None, interpret: bool = False, complete: bool = False,
                 n_real=None
                 ) -> Tuple[jax.Array, Optional[jax.Array], Optional[jax.Array]]:
    """(s1, s2[, gram]) for a window.

    packed: (W, NB) uint8; eps_d: (4, NB) f32 plane-major residual
    (deinterleave(eps)); mave/mstd: (W,).

    complete=True (no missing genotypes anywhere): the mask plane is
    identically 1 on real individuals, so s2 = sum(eps) for every marker —
    the kernel skips the mask decode+reduce (~30% of its VPU work) and
    returns s2=None; the caller uses its own sum(eps_d) (pad lanes of eps
    are zero by invariant). With exact=True the Gram additionally reduces
    to ONE integer bf16 MXU pass per plane (see _stats_kernel), with the
    standardization applied here as a rank-1 correction from v = sum(g)
    and `n_real` (this shard's real-individual count — required). The
    correction is LINEAR in (Ggg, v, n_real), so individual-sharded
    callers may psum the returned gram as before.
    """
    W, NB = packed.shape
    if complete and exact and n_real is None:
        raise ValueError("exact complete window_stats needs n_real")
    tb = tile_bytes if tile_bytes else _auto_tile(NB, W, 4.0 if exact else 3.0)
    grid = (NB // tb,)

    def sds(shape):
        return (jax.ShapeDtypeStruct(shape, f32, vma=set(vma)) if vma
                else jax.ShapeDtypeStruct(shape, f32))

    out_shape = [sds((W, 1)), sds((W, 1)), sds((W, W) if exact else (8, 128))]
    grid_spec = pl.GridSpec(
        grid=grid,
        in_specs=[
            pl.BlockSpec((W, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((W, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, W) if exact else (8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    s1, s2, gram = pl.pallas_call(
        functools.partial(_stats_kernel, exact, complete),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(packed, eps_d, mave.reshape(W, 1), mstd.reshape(W, 1))
    s1 = s1[:, 0]
    if complete and not exact:
        # kernel accumulated hs1 = sum h*eps with h = 2 - g (see
        # _decode_h_int); pad lanes of eps are zero so the constant term
        # is exactly 2*sum(eps)
        s1 = 2.0 * jnp.sum(eps_d) - s1
    if complete and exact:
        # standardization correction of the raw integer Gram (rank-1 terms
        # from the lane-constant mask plane; see _stats_kernel)
        v = s2[:, 0]
        mave_c = mave[:, None]
        gram = (mstd[:, None] * mstd[None, :]) * (
            gram - mave_c * v[None, :] - v[:, None] * mave[None, :]
            + jnp.asarray(n_real, f32) * (mave_c * mave[None, :]))
    return (s1, None if complete else s2[:, 0],
            (gram if exact else None))


def _axpy_kernel(complete: bool, pk_ref, c1_ref, c2_ref, out_ref):
    pk32 = pk_ref[:, :].astype(jnp.int32)   # (W, TB)
    # 2-pass exact-f32 MXU vecmat: the decoded planes g/m take values in
    # {0, 1, 2} — EXACT in bf16 — so only the coefficient row needs the
    # bf16 hi/lo split. Each pass's products are then exact and accumulate
    # in f32 (preferred_element_type), giving full f32 accuracy at 1/3 the
    # MXU passes of precision=HIGHEST (which Mosaic used to spend here).
    def split(c):
        hi = c.astype(jnp.bfloat16).astype(f32)
        return hi, c - hi
    c1h, c1l = split(c1_ref[:, :])          # (1, W)
    if complete:
        two_c1s = 2.0 * jnp.sum(c1_ref[:, :])
    else:
        c2h, c2l = split(c2_ref[:, :])
    for k in range(4):
        if complete:
            # complete data: M_k == 1 on real individuals — the c2 term is
            # the scalar sum(c2), added (and pad-masked) by the caller.
            # h-decode (one op fewer): sum c1*g = 2*sum(c1) - sum c1*h
            h = _decode_h_int(pk32, k)
            contrib = (two_c1s
                       - jnp.dot(c1h, h, preferred_element_type=f32)
                       - jnp.dot(c1l, h, preferred_element_type=f32))
        else:
            g, m = _decode_k(pk32, k)
            contrib = (jnp.dot(c1h, g, preferred_element_type=f32)
                       + jnp.dot(c1l, g, preferred_element_type=f32)
                       + jnp.dot(c2h, m, preferred_element_type=f32)
                       + jnp.dot(c2l, m, preferred_element_type=f32))  # (1, TB)
        out_ref[k:k + 1, :] = contrib


def window_axpy(packed: jax.Array, c1: jax.Array, c2: jax.Array,
                tile_bytes: int = 0, vma=None, interpret: bool = False,
                complete: bool = False) -> jax.Array:
    """dEps_d (4, NB) = sum_m c1_m * G_m + c2_m * M_m in deinterleaved layout.

    For the residual update c1 = dbeta * mstd, c2 = -dbeta * mstd * mave
    (sparse_scaadd equivalent, BayesRRm.cpp:250-281).

    complete=True: returns only the genotype part sum_m c1_m G_m; the
    caller must add sum(c2) and zero the pad lanes (multiply by the
    plane-major individual mask) itself:
        d_eps = (window_axpy(..., complete=True) + c2.sum()) * ind_mask4
    """
    W, NB = packed.shape
    tb = tile_bytes if tile_bytes else _auto_tile(NB, W, 3.0)
    grid = (NB // tb,)
    out_shape = (jax.ShapeDtypeStruct((4, NB), f32, vma=set(vma)) if vma
                 else jax.ShapeDtypeStruct((4, NB), f32))
    grid_spec = pl.GridSpec(
        grid=grid,
        in_specs=[
            pl.BlockSpec((W, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, tb), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_axpy_kernel, complete),
        grid_spec=grid_spec, out_shape=out_shape,
        interpret=interpret,
    )(packed, c1.reshape(1, W).astype(f32), c2.reshape(1, W).astype(f32))


def _levels_kernel(complete: bool, pk_ref, v_ref, s1_ref, s2_ref, sm_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        s1_ref[:, :] = jnp.zeros_like(s1_ref)
        s2_ref[:, :] = jnp.zeros_like(s2_ref)
        if not complete:
            sm_ref[:, :] = jnp.zeros_like(sm_ref)

    pk32 = pk_ref[:, :].astype(jnp.int32)
    s1 = s2 = sm = None
    for k in range(4):
        if complete:
            # h-decode (one op fewer); indicators in terms of h = 2 - g:
            # i1 = h*(2-h) (symmetric), i2 = (1-h)*(1-0.5*h). Pad lanes
            # give h = 1 -> i1 = 1, nullified by v == 0 on pads.
            h = _decode_h_int(pk32, k)
            i1 = h * (2.0 - h)
            i2 = (1.0 - h) * (1.0 - 0.5 * h)
        else:
            g, m = _decode_k(pk32, k)
            i1 = g * (2.0 - g)          # 1 where genotype == 1
            i2 = g * (g - 1.0) * 0.5    # 1 where genotype == 2
        v = v_ref[k:k + 1, :]       # (1, TB) row — broadcasts over W
        # VPU lane reductions (see module docstring)
        a = jnp.sum(i1 * v, axis=1, keepdims=True)
        b = jnp.sum(i2 * v, axis=1, keepdims=True)
        s1 = a if s1 is None else s1 + a
        s2 = b if s2 is None else s2 + b
        if not complete:
            c = jnp.sum(m * v, axis=1, keepdims=True)
            sm = c if sm is None else sm + c
    s1_ref[:, :] += s1
    s2_ref[:, :] += s2
    if not complete:
        sm_ref[:, :] += sm


def window_level_sums(packed: jax.Array, vi_d: jax.Array,
                      tile_bytes: int = 0, vma=None,
                      interpret: bool = False, complete: bool = False):
    """(sum_{g==1} vi, sum_{g==2} vi, sum_{mask} vi) per window marker.

    The BayesW partial sums (partial_sum BayesW.cpp:49-65) as one fused pass:
    vi_d is the plane-major vi vector (4, NB) (deinterleave(vi)).

    complete=True: the mask plane is 1 on real individuals, so its sum is
    just sum(vi) (vi is zero on pad lanes); returns sm=None and the caller
    uses its own sum(vi).
    """
    W, NB = packed.shape
    tb = tile_bytes if tile_bytes else _auto_tile(NB, W, 4.0)
    grid = (NB // tb,)

    def sds():
        return (jax.ShapeDtypeStruct((W, 1), f32, vma=set(vma)) if vma
                else jax.ShapeDtypeStruct((W, 1), f32))

    grid_spec = pl.GridSpec(
        grid=grid,
        in_specs=[
            pl.BlockSpec((W, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((W, 1), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)] * 3,
    )
    s1, s2, sb = pl.pallas_call(
        functools.partial(_levels_kernel, complete),
        grid_spec=grid_spec,
        out_shape=[sds(), sds(), sds()], interpret=interpret,
    )(packed, vi_d)
    return s1[:, 0], s2[:, 0], (None if complete else sb[:, 0])


def deinterleave(eps: jax.Array) -> jax.Array:
    """eps (N,) -> (4, N/4) plane-major: eps_d[k, b] = eps[4b + k].

    Plane k then broadcasts as a (1, TB) lane row against the (W, TB)
    decoded plane k — no in-kernel relayout. The transpose happens in XLA
    outside any kernel."""
    return eps.reshape(-1, 4).T


def interleave(out4) -> jax.Array:
    """(4, NB) plane-major output (window_axpy) -> (4*NB,) individual order.
    The transpose happens in XLA outside any kernel."""
    return out4.T.reshape(-1)


# ---------------------------------------------------------------------------
# Multi-trait variants (BayesRRm-mt): T phenotypes share one decode pass.
# The XLA path materializes the decoded (W, N) planes in HBM every window
# (~100 MB at W=256, N=50K) to feed (W,N)x(N,T) matmuls; these kernels keep
# the decode in VMEM and batch the T right-hand sides instead.
#
# Plane-major multi-trait layout: row k*T + t holds plane k of trait t,
# i.e. eps_t[k*T + t, b] = eps[4b + k, t]  (see deinterleave_mt).
# ---------------------------------------------------------------------------


def _stats_mt_kernel(T: int, complete: bool, pk_ref, eps_ref, s1_ref,
                     s2_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        s1_ref[:, :] = jnp.zeros_like(s1_ref)
        if not complete:
            s2_ref[:, :] = jnp.zeros_like(s2_ref)

    pk32 = pk_ref[:, :].astype(jnp.int32)     # (W, TB)
    s1 = [None] * T
    s2 = [None] * T
    for k in range(4):
        if complete:
            # h-decode (one op fewer); wrapper reconstructs
            # s1 = 2*sum(eps_t) - hs1. Pads nulled by eps == 0.
            g = _decode_h_int(pk32, k)
            m = None
        else:
            g, m = _decode_k(pk32, k)
        for t in range(T):
            e = eps_ref[k * T + t: k * T + t + 1, :]        # (1, TB)
            a = jnp.sum(g * e, axis=1, keepdims=True)       # (W, 1)
            s1[t] = a if s1[t] is None else s1[t] + a
            if not complete:
                b = jnp.sum(m * e, axis=1, keepdims=True)
                s2[t] = b if s2[t] is None else s2[t] + b
    for t in range(T):
        s1_ref[:, t: t + 1] += s1[t]
        if not complete:
            s2_ref[:, t: t + 1] += s2[t]


def window_stats_mt(packed: jax.Array, eps_t: jax.Array, n_traits: int,
                    tile_bytes: int = 0, vma=None, interpret: bool = False,
                    complete: bool = False
                    ) -> Tuple[jax.Array, Optional[jax.Array]]:
    """(s1, s2) each (W, T): per-trait genotype/mask dots for one window.

    packed: (W, NB) uint8; eps_t: (4*T, NB) plane-major multi-trait
    residual (deinterleave_mt of the (n_pad, T) residual).

    complete=True (no missing genotypes): the mask dot is the same
    per-trait residual sum for every marker — the kernel skips the mask
    work (s2=None returned); the caller broadcasts its own per-trait
    sum(eps_t) (eps is zero on pad lanes AND trait-NaN entries by the mt
    invariant, samplers/bayesrrm_mt.py:77).
    """
    W, NB = packed.shape
    T = n_traits
    tb = tile_bytes if tile_bytes else _auto_tile(NB, W, 3.0)
    grid = (NB // tb,)

    def sds(shape):
        return (jax.ShapeDtypeStruct(shape, f32, vma=set(vma)) if vma
                else jax.ShapeDtypeStruct(shape, f32))

    grid_spec = pl.GridSpec(
        grid=grid,
        in_specs=[
            pl.BlockSpec((W, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * T, tb), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((W, T), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, T), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
    )
    s1, s2 = pl.pallas_call(
        functools.partial(_stats_mt_kernel, T, complete),
        grid_spec=grid_spec,
        out_shape=[sds((W, T)), sds((W, T))],
        interpret=interpret,
    )(packed, eps_t)
    if complete:
        # kernel accumulated hs1 (h-decode); reconstruct per trait using
        # sum(eps_t) (zero on pad lanes and NaN-masked entries)
        sums = jnp.sum(eps_t.reshape(4, T, NB), axis=(0, 2))    # (T,)
        s1 = 2.0 * sums[None, :] - s1
    return s1, (None if complete else s2)


def _axpy_mt_kernel(T: int, complete: bool, pk_ref, c1_ref, c2_ref,
                    out_ref):
    pk32 = pk_ref[:, :].astype(jnp.int32)     # (W, TB)

    def split(c):
        hi = c.astype(jnp.bfloat16).astype(f32)
        return hi, c - hi
    c1h, c1l = split(c1_ref[:, :])            # (T, W)
    if complete:
        two_c1s = 2.0 * jnp.sum(c1_ref[:, :], axis=1, keepdims=True)  # (T,1)
    else:
        c2h, c2l = split(c2_ref[:, :])
    for k in range(4):
        if complete:
            # complete data: the c2 term is the per-trait scalar sum(c2),
            # added (and trait-masked) by the caller. h-decode:
            # sum c1*g = 2*rowsum(c1) - sum c1*h
            h = _decode_h_int(pk32, k)
            contrib = (two_c1s
                       - jnp.dot(c1h, h, preferred_element_type=f32)
                       - jnp.dot(c1l, h, preferred_element_type=f32))
        else:
            g, m = _decode_k(pk32, k)
            # true (T, W) x (W, TB) matmuls — T rows ride the same MXU
            # passes a single-trait vecmat would use (see _axpy_kernel for
            # the exact-f32 hi/lo argument; g/m are bf16-exact)
            contrib = (jnp.dot(c1h, g, preferred_element_type=f32)
                       + jnp.dot(c1l, g, preferred_element_type=f32)
                       + jnp.dot(c2h, m, preferred_element_type=f32)
                       + jnp.dot(c2l, m, preferred_element_type=f32))  # (T, TB)
        out_ref[k * T:(k + 1) * T, :] = contrib


def window_axpy_mt(packed: jax.Array, c1: jax.Array, c2: jax.Array,
                   tile_bytes: int = 0, vma=None, interpret: bool = False,
                   complete: bool = False) -> jax.Array:
    """dEps_t (4*T, NB) = sum_m c1[t,m] G_m + c2[t,m] M_m per trait.

    c1/c2: (T, W) — for the mt residual update c1 = (dbeta*mstd).T and
    c2 = -(dbeta*mstd*mave).T (dbeta already carries mstd in the sampler).

    complete=True: returns only the genotype part; the caller must add the
    per-trait scalar c2.sum(axis=1) and apply the trait mask (which also
    zeroes pad lanes):
        d_eps = (window_axpy_mt(..., complete=True)
                 + jnp.tile(c2.sum(1), 4)[:, None]) * trait_mask_t
    """
    W, NB = packed.shape
    T = c1.shape[0]
    tb = tile_bytes if tile_bytes else _auto_tile(NB, W, 3.0)
    grid = (NB // tb,)
    out_shape = (jax.ShapeDtypeStruct((4 * T, NB), f32, vma=set(vma)) if vma
                 else jax.ShapeDtypeStruct((4 * T, NB), f32))
    grid_spec = pl.GridSpec(
        grid=grid,
        in_specs=[
            pl.BlockSpec((W, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4 * T, tb), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_axpy_mt_kernel, T, complete),
        grid_spec=grid_spec, out_shape=out_shape,
        interpret=interpret,
    )(packed, c1.astype(f32), c2.astype(f32))


def deinterleave_mt(eps: jax.Array) -> jax.Array:
    """(n_pad, T) -> (4*T, NB) with row k*T + t = plane k of trait t."""
    n_pad, T = eps.shape
    return eps.reshape(-1, 4, T).transpose(1, 2, 0).reshape(4 * T, -1)


def interleave_mt(eps_t: jax.Array, n_traits: int) -> jax.Array:
    """(4*T, NB) -> (n_pad, T) individual-major."""
    T = n_traits
    nb = eps_t.shape[1]
    return eps_t.reshape(4, T, nb).transpose(2, 0, 1).reshape(4 * nb, T)
