"""BayesRRm — spike + Gaussian-mixture Gibbs sampler, TPU-native.

Behavioral rebuild of BayesRRm::runMpiGibbs (src/BayesRRm.cpp:933-2939),
including grouped/annotated mixtures (C16) and the Finnish-horseshoe variant
BayesFH (C20, branches at BayesRRm.cpp:1125-1163, :1725-1760, :2557-2571).

TPU mapping (see SURVEY §2 parallelism checklist):

  * Marker sharding over a 1-D mesh axis "markers" via jax.shard_map
    (reference: MPI ranks, mpi_assign_blocks_to_tasks BayesRRm.cpp:1021).
  * The stale-residual window: the reference keeps epsilon frozen between
    collective syncs (`--sync-rate` markers per rank, BayesRRm.cpp:2044-2488),
    so all dot products in a window share one epsilon. Here a window of W
    markers becomes ONE (W,N)x(N,) MXU matmul on decoded genotype planes.
  * Exact mode additionally computes the window Gram matrix
    G = X~ @ X~.T (one (W,N)x(N,W) matmul) and corrects each marker's dot
    product with the earlier in-window delta-betas:
        num_j = x~_j . eps0 + sum_{k<j} dbeta_k Gram_jk
    which reproduces *exact sequential* Gibbs (the reference's sync-rate=1
    semantics) while still batching all N-length work onto the MXU.
  * Residual sync: eps += psum(X~^T dbeta) over ICI — replacing
    MPI_Allreduce(dEpsSum) (BayesRRm.cpp:2456) and making the sparse/BED
    Allgatherv codecs unnecessary on TPU.
  * Hyper-parameter draws use keys shared across devices — the functional
    replacement for MPI_Bcast from rank 0 (BayesRRm.cpp:2585,2705,2731).
  * Per-marker randomness is indexed by *global* marker id, so results are
    independent of the device count for a fixed window schedule.

Documented numerical deviations from the reference:
  * stable log-softmax for the component probabilities instead of the
    exp-overflow guard at BayesRRm.cpp:1884-1892 (same distribution, no
    700-threshold artifacts);
  * jax.random (threefry) instead of boost::mt19937 — distributional
    equivalence only, like the reference's own compiler-dependent shuffle
    caveat (BayesRRm.cpp:1688-1690);
  * fixed-effect draws use shared keys on all shards; the reference lets
    per-rank RNG streams diverge in this sweep (BayesRRm.cpp:2648-2681)
    which is only consistent for 1 rank — we follow BayesW's broadcast
    semantics (BayesW.cpp:1405) instead.
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# XLA's DEFAULT matmul precision on TPU rounds f32 inputs to bf16
# (~4e-3 relative); every statistics/residual dot must stay true f32.
_HI = jax.lax.Precision.HIGHEST
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hydra_tpu.data.genotypes import Dataset, shard_layout
from hydra_tpu.io.pheno import center_and_scale
from hydra_tpu.ops.decode import decode_planes_hp
from hydra_tpu.parallel.mesh import (
    IND_AXIS, MARKER_AXIS, det_psum, hier_psum, make_mesh, marker_axes,
    mesh_axes)
from hydra_tpu.utils import dist

# Auto-enable budget for the int8 decoded-plane cache (ops/planes.py):
# planes + packed together must leave HBM headroom for eps/outputs and
# XLA temporaries on a 16 GB v5e chip.
PLANES_HBM_BUDGET = 9_000_000_000

# Hyper-priors (BayesRRm.h:29-34)
V0E = 1e-4
S02E = 1e-4
V0G_DEFAULT = 1e-4
S02G_DEFAULT = 1e-4
S02F = 1.0

# RNG site ids (folded into the per-iteration key)
_S_MU, _S_UNIF, _S_NORM, _S_SIGMAG, _S_PI, _S_SIGMAE = 0, 1, 2, 3, 4, 5
_S_PERM, _S_COV, _S_COVPERM, _S_NU, _S_LAM, _S_TAU, _S_CSLAB, _S_HTAU = (
    6, 7, 8, 9, 10, 11, 12, 13)
_S_INIT_SIGMAG, _S_INIT_FH = 100, 101


@dataclass(frozen=True)
class BayesRRmConfig:
    n_real: int          # individuals after NA correction (dN)
    n_pad: int
    m_tot: int           # real markers
    m_loc: int           # per-shard padded marker count (multiple of window)
    n_dev: int
    window: int
    k: int               # mixture components incl. zero
    num_groups: int
    n_cov: int
    n_ind: int = 1       # individual-axis shards (2-D mesh); 1 = replicated eps
    n_dcn: int = 1       # multi-slice: markers shard over ("dcn", "markers")
    exact: bool = True
    # Exact-mode cross-shard exchange interval B (markers). Within a shard
    # the window recurrence is always exact-sequential; OTHER shards'
    # delta-betas are applied to the in-window correction every B steps.
    # B == window (the default): one exchange per window — the residual
    # psum at the window boundary carries everything, so no in-window
    # collective at all (same comm profile as stale mode) and the
    # semantics are strictly FRESHER than the reference at syncRate=W
    # (the reference freezes eps within the window even on-rank,
    # BayesRRm.cpp:1700,2460). B == 1: strict syncRate=1 parity — every
    # step ships one scalar/shard over ICI (latency-bound; the reference
    # pays a full N-length MPI_Allreduce per marker for the same
    # semantics, BayesRRm.cpp:2051,2456). 1 < B < W: W/B all_gathers of
    # (B,)-vectors per window, corrections via the cross-shard Gram
    # blocks. Single-shard runs ignore this (always exact-sequential).
    cross_sync: int = 0  # resolved to min(B, window) in __init__; 0 = window
    fh: bool = False
    shuffle: bool = True
    # Marker-processing schedule. "marker" (reference semantics,
    # BayesRRm.cpp:1691-1694): a fresh per-sweep permutation of all
    # markers; the mega kernel must then GATHER a full shuffled copy of
    # the packed bytes each sweep (second HBM copy -> the 2.2x-packed
    # gate). "block": a one-time setup permutation of marker->slot
    # assignment (decorrelates genome-adjacent/LD markers) composed with
    # a per-sweep permutation of WINDOW BLOCKS, so the mega kernel can
    # DMA window rows in place via a scalar-prefetch index map — no
    # gather, no second copy, mega available at any M that fits HBM.
    # Within a stale window every marker reads the same frozen residual,
    # so the draw math is identical; only the window PARTITION is fixed
    # per chain (markers sharing a block stay window-mates). That is a
    # valid systematic-scan Gibbs schedule (the posterior is untouched;
    # scan-order choices affect mixing only), and with the setup
    # permutation the fixed blocks are random marker sets, so the
    # within-window stale coupling matches BIAS_SWEEP.md's measured
    # regime. Exact mode keeps "marker" — its window-invariance
    # (W=1 == W=N) holds only when the marker ORDER is window-agnostic.
    schedule: str = "marker"
    use_pallas: bool = False   # fused window-Gibbs kernel (TPU backends)
    use_mega: bool = False     # whole-sweep mega-kernel (single-shard stale)
    use_wmega: bool = False    # per-window fused sweep kernels (multi-shard)
    use_planes: bool = False   # cached int8 decoded planes (ops/planes.py)
    interpret: bool = False    # run kernels in interpret mode (tests only)
    complete: bool = False     # no missing genotypes anywhere (fast kernels)
    det_sync: bool = False     # topology-invariant reductions (--det-sync)
    dtype: str = "float32"     # accumulation dtype (--dtype; reference is f64)
    # FH hyper-priors (options.hpp:89-96)
    v0L: float = 3.0
    v0t: float = 3.0
    v0c: float = 3.0
    s02c: float = 1.0
    tau0: float = 1.0

    @property
    def n_windows(self) -> int:
        return self.m_loc // self.window

    @property
    def m_glob(self) -> int:
        return self.m_loc * self.n_dev


class BayesRRmState(NamedTuple):
    eps: jax.Array          # (n_pad,) replicated residual
    beta: jax.Array         # (m_glob,) sharded
    components: jax.Array   # (m_glob,) int32 sharded
    acum: jax.Array         # (m_glob,) sharded — P(zero component) (.acu output)
    mu: jax.Array
    sigma_e: jax.Array
    sigma_g: jax.Array      # (G,)
    est_pi: jax.Array       # (G, K)
    gamma: jax.Array        # (F,)
    # FH state (zeros when fh=False)
    lambda_var: jax.Array   # (m_glob,)
    nu_var: jax.Array       # (m_glob,)
    c_slab: jax.Array       # (G,)
    tau: jax.Array
    hyp_tau: jax.Array


class IterStats(NamedTuple):
    m0: jax.Array               # (G,) non-zero markers per group
    cass: jax.Array             # (G, K)
    beta_sqn: jax.Array         # (G,)
    sum_abs_dbeta: jax.Array    # scalar — reference's cumSumDeltaBetas diagnostic


def _local_iteration(cfg: BayesRRmConfig, seed, it, state: BayesRRmState,
                     packed, planes, groups, mave, mstd, valid,
                     cva, cvai, dirc, sigma_priors, mtot_grp, ind_mask, x_cov):
    """One Gibbs sweep on the local marker shard (runs under shard_map)."""
    f32 = jnp.float64 if cfg.dtype == "float64" else jnp.float32
    mave, mstd = mave.astype(f32), mstd.astype(f32)
    valid, ind_mask, x_cov = valid.astype(f32), ind_mask.astype(f32), x_cov.astype(f32)
    cva, cvai, dirc = cva.astype(f32), cvai.astype(f32), dirc.astype(f32)
    sigma_priors = sigma_priors.astype(f32)
    dN = f32(cfg.n_real)
    dNm1 = f32(cfg.n_real - 1)
    km1 = cfg.k - 1
    W = cfg.window
    # cross-shard exchange interval (see BayesRRmConfig.cross_sync);
    # local_exact: no in-window collective — other shards' deltas arrive
    # via the window-boundary residual psum only
    B_cs = min(cfg.cross_sync, W) if cfg.cross_sync > 0 else W
    local_exact = cfg.n_dev == 1 or B_cs >= W
    # ma: the (possibly hierarchical) marker axis — ("dcn", "markers") on
    # multi-slice meshes; collectives over `ma` reduce across all marker
    # shards, ICI-first (see parallel/mesh.py).
    ma = marker_axes(cfg.n_dcn)
    dev = jax.lax.axis_index(ma)
    # --det-sync: topology-invariant all-reduce (all_gather + fixed-order
    # local sum) so 1 x 8 and 2 x 4 process layouts give BITWISE-identical
    # chains (parallel/mesh.py det_psum)
    if cfg.det_sync:
        def ma_sum(v):
            return det_psum(v, ma, cfg.n_dev)

        def hpsum(v, n_dcn):
            return det_psum(v, ma, cfg.n_dev)
    else:
        def ma_sum(v):
            return jax.lax.psum(v, ma)
        hpsum = hier_psum

    # Individual-axis sharding: eps / ind_mask / x_cov / packed byte columns
    # arrive as local N/n_ind chunks; N-length reductions need one extra psum
    # over IND_AXIS. With n_ind == 1 these are identity (no collective).
    if cfg.n_ind > 1:
        def psum_i(x):
            return jax.lax.psum(x, IND_AXIS)
        vma_axes = ma + (IND_AXIS,)
    else:
        def psum_i(x):
            return x
        vma_axes = ma

    base_key = jax.random.key(seed)
    it_key = jax.random.fold_in(base_key, it)

    def site(s):
        return jax.random.fold_in(it_key, s)

    eps = state.eps
    beta = state.beta
    comps = state.components
    acum = state.acum
    lam = state.lambda_var
    nu = state.nu_var
    sigma_e = state.sigma_e
    sigma_g = state.sigma_g
    est_pi = state.est_pi

    # ---- mu update (BayesRRm.cpp:1675-1686) ----
    eps = eps + state.mu * ind_mask
    epssum = psum_i(jnp.sum(eps))
    mu = dist.norm_rng(site(_S_MU), epssum / dN, sigma_e / dN, dtype=f32)
    eps = eps - mu * ind_mask

    # ---- marker order: per-shard permutation (BayesRRm.cpp:1691-1694) ----
    wperm = None
    if cfg.schedule == "block" and cfg.shuffle:
        # block schedule: permute WINDOW BLOCKS (see BayesRRmConfig.schedule;
        # the setup-time slot permutation already decorrelated block
        # membership). perm expands to the composite marker order so every
        # non-kernel consumer (mrow gather, beta scatter) is unchanged.
        wperm = jax.random.permutation(
            jax.random.fold_in(site(_S_PERM), dev), cfg.n_windows)
        perm = (wperm[:, None] * W
                + jnp.arange(W, dtype=wperm.dtype)).reshape(-1)
    elif cfg.shuffle:
        perm = jax.random.permutation(
            jax.random.fold_in(site(_S_PERM), dev), cfg.m_loc)
    else:
        perm = jnp.arange(cfg.m_loc)

    # ---- per-marker randomness, indexed by global slot id ----
    u_all = jax.random.uniform(site(_S_UNIF), (cfg.m_glob,), f32)
    n_all = jax.random.normal(site(_S_NORM), (cfg.m_glob,), f32)
    off = dev * cfg.m_loc
    u_loc = jax.lax.dynamic_slice(u_all, (off,), (cfg.m_loc,))
    n_loc = jax.lax.dynamic_slice(n_all, (off,), (cfg.m_loc,))
    if cfg.fh:
        g_shape = f32(0.5 + 0.5 * cfg.v0L)
        g_nu = jax.lax.dynamic_slice(
            jax.random.gamma(site(_S_NU), g_shape, (cfg.m_glob,), f32), (off,), (cfg.m_loc,))
        g_lam = jax.lax.dynamic_slice(
            jax.random.gamma(site(_S_LAM), g_shape, (cfg.m_glob,), f32), (off,), (cfg.m_loc,))
    else:
        g_nu = g_lam = jnp.ones((cfg.m_loc,), f32)

    # adaV: markers of zeroed groups are skipped (BayesRRm.cpp:1589-1597)
    active_all = (sigma_g[groups] > 0.0) & (valid > 0.0) & (mstd > 0.0)

    i_2se = 0.5 / sigma_e
    tiny = f32(1e-30)

    def window_body(w, carry):
        eps, beta, comps, acum, lam, nu, cass, sum_abs_db = carry
        idx = jax.lax.dynamic_slice(perm, (w * W,), (W,))
        if cfg.use_planes:
            pl_w = jnp.take(planes, idx, axis=0)        # (W, 4*NB) int8
            pk = None
        else:
            pk = jnp.take(packed, idx, axis=0)
        mave_w = jnp.take(mave, idx)
        mstd_w = jnp.take(mstd, idx)
        grp_w = jnp.take(groups, idx)
        act_w = jnp.take(active_all, idx)
        bold_w = jnp.take(beta, idx)
        u_w = jnp.take(u_loc, idx)
        nrm_w = jnp.take(n_loc, idx)

        if cfg.use_planes:
            # cached int8 decoded planes (ops/planes.py): no in-kernel 2-bit
            # decode — stats are a widen + VPU multiply-reduce over the flat
            # deinterleaved columns; eps (4, NB) viewed flat is the same
            # memory. Complete-data semantics (gated in __init__).
            from hydra_tpu.ops.planes import window_stats_planes

            # eps is replicated over the marker axis; the kernel's outputs
            # are varying — mark the input varying for shard_map's vma
            # checker (numerically the identity)
            e_flat = jax.lax.pcast(eps.reshape(1, -1), ma, to="varying")
            s1 = window_stats_planes(pl_w, e_flat, vma=vma_axes,
                                     interpret=cfg.interpret)
            s2 = jnp.sum(eps)          # pad lanes of eps are zero
            base = psum_i(mstd_w * (s1 - mave_w * s2))
            gram_fused = None
            xt = None
        elif cfg.use_pallas:
            # fused decode+dot(+Gram) in VMEM (ops/window_kernels.py): HBM
            # sees only the packed bytes, not W x N decoded planes. The
            # residual rides the loop carry in plane-major (4, NB) layout —
            # transposed once per sweep outside the loop, not per window.
            from hydra_tpu.ops.window_kernels import window_stats

            s1, s2, gram_fused = window_stats(
                pk, eps, mave_w, mstd_w, local_exact,
                vma=vma_axes, complete=cfg.complete, n_real=n_real_loc)
            if s2 is None:
                # complete data: every marker's mask dot is just sum(eps)
                # (pad lanes of eps are zero by invariant)
                s2 = jnp.sum(eps)
            base = psum_i(mstd_w * (s1 - mave_w * s2))
            if gram_fused is not None:
                gram_fused = psum_i(gram_fused)
            xt = None
        else:
            A, B = decode_planes_hp(pk, f32)
            xt = (A - mave_w[:, None] * B) * mstd_w[:, None]      # (W, N_loc)
            base = psum_i(jnp.dot(xt, eps, preferred_element_type=f32, precision=_HI))
            gram_fused = None

        # group-dependent per-marker rows
        log_pi_w = jnp.log(jnp.maximum(est_pi[grp_w], tiny))   # (W, K)
        cva_w = cva[grp_w][:, 1:]                              # (W, km1)
        cvai_w = cvai[grp_w][:, 1:]
        sig_g_w = sigma_g[grp_w]

        if cfg.fh:
            # nu_var draw + shrinkage (BayesRRm.cpp:1729-1730)
            lam_w = jnp.take(lam, idx)
            nu_w = (cfg.v0L / lam_w + 1.0) / jnp.take(g_nu, idx)
            csl_w = state.c_slab[grp_w]
            lamt_w = state.tau * csl_w / (state.tau + csl_w * lam_w)
            lamt_w = jnp.maximum(lamt_w, tiny)
        else:
            nu_w = jnp.take(nu, idx)
            lamt_w = jnp.ones((W,), f32)

        # ---- per-marker constants, vectorized over the window ----
        if cfg.fh:
            denomk = dNm1 + (sigma_e / lamt_w)[:, None] * jnp.ones((1, km1), f32)
            log_detk = jnp.log((lamt_w / sigma_e) * dNm1 + 1.0)[:, None] \
                * jnp.ones((1, km1), f32)
        else:
            safe_g = jnp.maximum(sig_g_w, tiny)
            denomk = dNm1 + (sigma_e / safe_g)[:, None] * cvai_w     # (W, km1)
            log_detk = jnp.log(
                (sig_g_w / sigma_e)[:, None] * dNm1 * cva_w + 1.0)
        inv_denomk = 1.0 / denomk
        sd_k = jnp.sqrt(sigma_e * inv_denomk)                        # (W, km1)
        logl_static = jnp.concatenate(
            [log_pi_w[:, :1], log_pi_w[:, 1:] - 0.5 * log_detk], axis=1)
        num0 = base + bold_w * dNm1                                  # (W,)

        def draw_rows(num):
            """Vectorized component + beta draw given the dot products.

            `num` is (W,); returns (beta_new, comp, acum0) each (W,).
            Stable row-softmax replaces the exp-overflow guard
            (BayesRRm.cpp:1883-1892)."""
            muk = num[:, None] * inv_denomk
            logL = jnp.concatenate(
                [logl_static[:, :1],
                 logl_static[:, 1:] + muk * num[:, None] * i_2se], axis=1)
            m = jnp.max(logL, axis=1, keepdims=True)
            pr = jnp.exp(logL - m)
            probs = pr / jnp.sum(pr, axis=1, keepdims=True)
            cum = jnp.cumsum(probs, axis=1)
            comp = jnp.minimum(
                jnp.sum((u_w[:, None] > cum).astype(jnp.int32), axis=1), km1)
            ksel = jnp.maximum(comp - 1, 0)[:, None]
            beta_nz = (jnp.take_along_axis(muk, ksel, axis=1)
                       + nrm_w[:, None] * jnp.take_along_axis(sd_k, ksel, axis=1)
                       )[:, 0]
            beta_new = jnp.where((comp > 0) & act_w, beta_nz, 0.0)
            comp = jnp.where(act_w, comp, 0)
            acum0 = jnp.where(act_w, probs[:, 0], 1.0)
            return beta_new, comp, acum0

        if cfg.exact and cfg.use_pallas and local_exact:
            # Fused in-VMEM recurrence kernel (ops/gibbs_kernel.py): exact
            # sequential Gibbs at VPU latency instead of XLA-scan overhead.
            # Runs whenever no in-window collective is needed: single shard,
            # or multi-shard with cross_sync >= window (other shards' deltas
            # ride the window-boundary residual psum).
            from hydra_tpu.ops.gibbs_kernel import window_gibbs

            dbeta, bnew_w, comp_w, acum_w = window_gibbs(
                gram_fused, num0, logl_static, inv_denomk, sd_k, u_w, nrm_w,
                act_w.astype(f32), bold_w, i_2se, vma=vma_axes)
        elif cfg.exact:
            # Gram correction: num_j += sum_{t<j} dbeta_t Gram_jt recovers
            # exact sequential Gibbs within the shard. Across shards the
            # blocks gathered below additionally apply every OTHER shard's
            # step-t deltas to step j>t — reproducing the reference's
            # sync-rate=1 multi-rank semantics (one marker per rank between
            # residual syncs, same-step markers mutually stale,
            # BayesRRm.cpp:2044-2060) without any N-length collective
            # inside the window.
            if local_exact:
                # cross_sync >= window: no cross-shard blocks at all — the
                # window-boundary residual psum below is the only collective
                # (same comm profile as stale mode; semantics strictly
                # fresher than the reference at syncRate=W, which freezes
                # eps on-rank too, BayesRRm.cpp:1700,2460)
                if gram_fused is not None:
                    blocks = gram_fused[None]
                else:
                    if xt is None:
                        A, Bm = decode_planes_hp(pk, f32)
                        xt = (A - mave_w[:, None] * Bm) * mstd_w[:, None]
                    blocks = psum_i(jnp.dot(
                        xt, xt.T, preferred_element_type=f32,
                        precision=_HI))[None]
            elif cfg.complete and cfg.n_dev > 1:
                # Complete data, multi-shard: ship the RAW 2-bit packed
                # bytes ((W, NB) uint8 — 16x less ICI/DCN traffic than f32
                # planes) plus one (3, W) stats row [mave, mstd, v=sum(g)],
                # and rebuild each cross-shard block from the INTEGER plane
                # Gram (exact in bf16: values {0,1,2}) with the rank-1
                # standardization correction — the same algebra as
                # ops/window_kernels._stats_kernel. Pad markers have
                # mstd = 0, so their rows/cols vanish; every term is linear
                # in (G, v, n_loc), so the ind-axis psum still applies.
                A, _ = decode_planes_hp(pk, f32)
                g_loc = A.astype(jnp.bfloat16)
                v_w = jnp.sum(A, axis=1)
                rows_loc = jnp.stack([mave_w, mstd_w, v_w])      # (3, W)

                def corr_blk(g_rem, rows_rem):
                    # blk[j, t] = x~_j(local) . x~_t(remote)
                    G = jnp.dot(g_loc, g_rem.T, preferred_element_type=f32)
                    return psum_i(
                        (mstd_w[:, None] * rows_rem[1][None, :])
                        * (G - rows_rem[0][None, :] * v_w[:, None]
                           - mave_w[:, None] * rows_rem[2][None, :]
                           + n_real_loc
                           * (mave_w[:, None] * rows_rem[0][None, :])))

                if cfg.n_dcn > 1:
                    pk_all = jax.lax.all_gather(pk, ma)    # (n_dev, W, NB)
                    rows_all = jax.lax.all_gather(rows_loc, ma)
                    A_all, _ = decode_planes_hp(
                        pk_all.reshape(cfg.n_dev * W, -1), f32)
                    g_all = A_all.astype(jnp.bfloat16).reshape(
                        cfg.n_dev, W, -1)
                    G = jnp.einsum("wn,dvn->dwv", g_loc, g_all,
                                   preferred_element_type=f32)
                    blocks = psum_i(
                        (mstd_w[None, :, None] * rows_all[:, 1, None, :])
                        * (G - rows_all[:, 0, None, :] * v_w[None, :, None]
                           - mave_w[None, :, None] * rows_all[:, 2, None, :]
                           + n_real_loc * (mave_w[None, :, None]
                                           * rows_all[:, 0, None, :])))
                else:
                    ring = [((i + 1) % cfg.n_dev, i)
                            for i in range(cfg.n_dev)]
                    buf_pk, buf_rows = pk, rows_loc
                    blocks = jax.lax.pcast(
                        jnp.zeros((cfg.n_dev, W, W), f32), (MARKER_AXIS,),
                        to="varying")
                    for r in range(cfg.n_dev):
                        owner = (dev + r) % cfg.n_dev
                        if r == 0:
                            blk = corr_blk(g_loc, rows_loc)
                        else:
                            A_r, _ = decode_planes_hp(buf_pk, f32)
                            blk = corr_blk(A_r.astype(jnp.bfloat16),
                                           buf_rows)
                        oh = (jnp.arange(cfg.n_dev) == owner).astype(f32)
                        blocks = blocks + oh[:, None, None] * blk[None]
                        if r < cfg.n_dev - 1:
                            buf_pk = jax.lax.ppermute(
                                buf_pk, MARKER_AXIS, ring)
                            buf_rows = jax.lax.ppermute(
                                buf_rows, MARKER_AXIS, ring)
            elif cfg.n_dcn > 1:
                if xt is None:
                    # pallas stats path on a multi-shard mesh: the general
                    # (missing-data) gather/ring ships decoded window
                    # planes, so materialize them once
                    A, B = decode_planes_hp(pk, f32)
                    xt = (A - mave_w[:, None] * B) * mstd_w[:, None]
                # hierarchical mesh: ppermute has no linearized-axis form, so
                # gather every shard's window planes once (n_dev, W, N_loc)
                # and form all Gram blocks in one batched matmul
                buf_all = jax.lax.all_gather(xt, ma)
                blocks = psum_i(jnp.einsum(
                    "wn,dvn->dwv", xt, buf_all,
                    preferred_element_type=f32, precision=_HI))
            else:
                if xt is None:
                    A, B = decode_planes_hp(pk, f32)
                    xt = (A - mave_w[:, None] * B) * mstd_w[:, None]
                # blocks[d, j, t] = x~_j(local) . x~_t(shard d), built by an
                # ICI ring over the window planes (n_dev (W,N)x(N,W) matmuls)
                ring = [((i + 1) % cfg.n_dev, i) for i in range(cfg.n_dev)]
                buf = xt
                blocks = jax.lax.pcast(
                    jnp.zeros((cfg.n_dev, W, W), f32), (MARKER_AXIS,),
                    to="varying")
                for r in range(cfg.n_dev):
                    owner = (dev + r) % cfg.n_dev
                    blk = psum_i(jnp.dot(xt, buf.T, preferred_element_type=f32, precision=_HI))
                    oh = (jnp.arange(cfg.n_dev) == owner).astype(f32)
                    blocks = blocks + oh[:, None, None] * blk[None]
                    if r < cfg.n_dev - 1:
                        buf = jax.lax.ppermute(buf, MARKER_AXIS, ring)

            def draw_one(j, num_j):
                """Sequential-recurrence draw for marker slot j given its
                corrected dot product (shared by every exact scan variant)."""
                muk = num_j * inv_denomk[j]
                logL = jnp.concatenate(
                    [logl_static[j, :1],
                     logl_static[j, 1:] + muk * num_j * i_2se])
                pr = jnp.exp(logL - jnp.max(logL))
                probs = pr / jnp.sum(pr)
                cum = jnp.cumsum(probs)
                comp = jnp.minimum(
                    jnp.sum((u_w[j] > cum).astype(jnp.int32)), km1)
                ksel = jnp.maximum(comp - 1, 0)
                beta_nz = muk[ksel] + nrm_w[j] * sd_k[j, ksel]
                beta_new = jnp.where((comp > 0) & act_w[j], beta_nz, 0.0)
                comp = jnp.where(act_w[j], comp, 0)
                acum0 = jnp.where(act_w[j], probs[0], 1.0)
                db = bold_w[j] - beta_new
                return beta_new, comp, acum0, db

            corr0 = jax.lax.pcast(
                jnp.zeros((W,), f32), ma, to="varying")
            if cfg.n_dev > 1 and not local_exact and B_cs > 1:
                # batched cross-shard exchange: the inner scan applies only
                # OWN-shard corrections (exact within shard); every B_cs
                # steps one (B_cs,)-vector all_gather applies the other
                # shards' deltas — W/B_cs collectives per window instead of
                # W (cross_sync=1) or the reference's W N-length allreduces
                own = jnp.take(blocks, dev, axis=0)          # (W, W) local

                def inner_step(carry, jj):
                    corr, b = carry
                    j = b * B_cs + jj
                    beta_new, comp, acum0, db = draw_one(j, num0[j] + corr[j])
                    corr = corr + db * own[:, j]
                    return (corr, b), (beta_new, comp, acum0, db)

                def batch_body(corr, b):
                    (corr, _), outs = jax.lax.scan(
                        inner_step, (corr, b), jnp.arange(B_cs))
                    db_b = outs[3]                           # (B_cs,)
                    db_all = jax.lax.all_gather(db_b, ma)    # (n_dev, B_cs)
                    cols = jax.lax.dynamic_slice(
                        blocks, (0, 0, b * B_cs), (cfg.n_dev, W, B_cs))
                    cross = jnp.einsum("dt,dwt->w", db_all, cols,
                                       precision=_HI)
                    own_cols = jax.lax.dynamic_slice(
                        own, (0, b * B_cs), (W, B_cs))
                    corr = corr + cross - jnp.einsum(
                        "t,wt->w", db_b, own_cols, precision=_HI)
                    return corr, outs

                _, outs = jax.lax.scan(
                    batch_body, corr0, jnp.arange(W // B_cs))
                bnew_w, comp_w, acum_w, dbeta = (
                    o.reshape(W) for o in outs)
            else:
                def marker_step(corr, j):
                    beta_new, comp, acum0, db = draw_one(j, num0[j] + corr[j])
                    if cfg.n_dev > 1 and not local_exact:
                        # one scalar per shard rides ICI each step — strict
                        # syncRate=1 parity (the reference pays a full
                        # N-length MPI_Allreduce per marker for the same
                        # semantics, BayesRRm.cpp:2051,2456)
                        db_all = jax.lax.all_gather(db, ma)
                    else:
                        db_all = db[None]
                    corr = corr + jnp.tensordot(db_all, blocks[:, :, j], axes=1)
                    return corr, (beta_new, comp, acum0, db)

                _, (bnew_w, comp_w, acum_w, dbeta) = jax.lax.scan(
                    marker_step, corr0, jnp.arange(W))
        else:
            # Stale-window semantics (the reference's sync-rate relaxation,
            # BayesRRm.cpp:2044-2488): draws are independent given the frozen
            # residual -> fully vectorized, no scan.
            bnew_w, comp_w, acum_w = draw_rows(num0)
            dbeta = bold_w - bnew_w

        # residual sync: dense psum over the marker mesh axis
        # (replaces MPI_Allreduce(dEpsSum), BayesRRm.cpp:2456-2460)
        if cfg.use_planes:
            from hydra_tpu.ops.planes import window_axpy_planes

            c1 = dbeta * mstd_w
            c2 = -c1 * mave_w
            d_eps = ((window_axpy_planes(pl_w, c1, vma=vma_axes,
                                         interpret=cfg.interpret)
                      + jnp.sum(c2)).reshape(4, -1)) * ind_mask4
        elif cfg.use_pallas:
            from hydra_tpu.ops.window_kernels import window_axpy

            c1 = dbeta * mstd_w
            c2 = -c1 * mave_w
            if cfg.complete:
                # kernel returns only the genotype part; the mask plane is
                # 1 on real individuals so the c2 term is a broadcast of
                # sum(c2), zeroed on pad lanes by the plane-major mask
                d_eps = (window_axpy(pk, c1, c2, vma=vma_axes, complete=True)
                         + jnp.sum(c2)) * ind_mask4
            else:
                d_eps = window_axpy(pk, c1, c2, vma=vma_axes)  # (4, NB)
        else:
            d_eps = jnp.dot(dbeta, xt, preferred_element_type=f32, precision=_HI)
        d_eps = hpsum(d_eps, cfg.n_dcn)
        eps = eps + d_eps
        sum_abs_db = sum_abs_db + ma_sum(jnp.sum(jnp.abs(dbeta)))

        # component-assignment counts, active markers only (BayesRRm.cpp:1904)
        flat = grp_w * cfg.k + comp_w
        cass = cass + jax.ops.segment_sum(
            act_w.astype(f32), flat, num_segments=cfg.num_groups * cfg.k
        ).reshape(cfg.num_groups, cfg.k)

        beta = beta.at[idx].set(bnew_w)
        comps = comps.at[idx].set(comp_w)
        acum = acum.at[idx].set(acum_w)
        if cfg.fh:
            # local shrinkage draw after beta (BayesRRm.cpp:1952)
            rate = 0.5 * bnew_w * bnew_w / state.tau + cfg.v0L / nu_w
            lam_new = rate / jnp.take(g_lam, idx)
            lam = lam.at[idx].set(lam_new)
            nu = nu.at[idx].set(nu_w)
        return eps, beta, comps, acum, lam, nu, cass, sum_abs_db

    cass0 = jax.lax.pcast(
        jnp.zeros((cfg.num_groups, cfg.k), f32), ma, to="varying")
    if cfg.use_mega or cfg.use_wmega:
        # ---- whole-sweep mega-kernel (ops/sweep_kernel.py) ----
        # All per-marker quantities are precomputed vectorized in shuffled
        # order; the kernel runs every window's stats -> draw -> residual
        # update in ONE launch with eps resident in VMEM. Same math as
        # window_body's stale branch (draw_rows), one XLA gather/scatter
        # per sweep instead of per window.
        # use_wmega (multi-shard): the SAME fused kernels, launched once
        # per WINDOW with the residual psum between launches — D > 1 pays
        # one launch + one psum per window instead of the per-window
        # path's 2-3 launches + XLA glue. Requires stale windows or
        # exact with cross_sync >= window (no in-window collectives).
        from hydra_tpu.ops.sweep_kernel import (mrow_width, sd_sub_window,
                                                sweep_exact, sweep_stale,
                                                sweep_stale_sd)
        from hydra_tpu.ops.window_kernels import deinterleave, interleave

        km1 = cfg.k - 1
        # block-schedule whole-sweep path: mrow, pk and out all stay in
        # SLOT order — the kernel block-addresses them through the window
        # permutation (sweep_stale win_perm docstring) — so the m_loc-long
        # per-sweep gathers here and the scatters below vanish entirely
        blockslot = (cfg.schedule == "block" and cfg.use_mega
                     and not cfg.use_wmega)
        if blockslot:
            mave_s, mstd_s, grp_s = mave, mstd, groups
            act_s = active_all.astype(f32)
            bold_s, u_s, n_s = beta, u_loc, n_loc
        else:
            mave_s = jnp.take(mave, perm)
            mstd_s = jnp.take(mstd, perm)
            grp_s = jnp.take(groups, perm)
            act_s = jnp.take(active_all, perm).astype(f32)
            bold_s = jnp.take(beta, perm)
            u_s = jnp.take(u_loc, perm)
            n_s = jnp.take(n_loc, perm)
        log_pi_s = jnp.log(jnp.maximum(est_pi[grp_s], tiny))     # (m, K)
        if cfg.fh:
            lam_s = lam if blockslot else jnp.take(lam, perm)
            g_nu_s = g_nu if blockslot else jnp.take(g_nu, perm)
            nu_w_s = (cfg.v0L / lam_s + 1.0) / g_nu_s
            csl_s = state.c_slab[grp_s]
            lamt_s = state.tau * csl_s / (state.tau + csl_s * lam_s)
            lamt_s = jnp.maximum(lamt_s, tiny)
            denomk = dNm1 + (sigma_e / lamt_s)[:, None] * jnp.ones((1, km1), f32)
            log_detk = jnp.log((lamt_s / sigma_e) * dNm1 + 1.0)[:, None] \
                * jnp.ones((1, km1), f32)
        else:
            safe_g = jnp.maximum(sigma_g[grp_s], tiny)
            denomk = dNm1 + (sigma_e / safe_g)[:, None] * cvai[grp_s][:, 1:]
            log_detk = jnp.log(
                (sigma_g[grp_s] / sigma_e)[:, None] * dNm1 * cva[grp_s][:, 1:] + 1.0)
        inv_denomk = 1.0 / denomk
        sd_k = jnp.sqrt(sigma_e * inv_denomk)
        logl_static = jnp.concatenate(
            [log_pi_s[:, :1], log_pi_s[:, 1:] - 0.5 * log_detk], axis=1)
        mrow = jnp.concatenate(
            [mave_s[:, None], mstd_s[:, None], bold_s[:, None],
             u_s[:, None], n_s[:, None], act_s[:, None],
             logl_static, inv_denomk, sd_k], axis=1)
        assert mrow.shape[1] == mrow_width(cfg.k)

        mask4 = deinterleave(ind_mask) if cfg.complete else None
        if cfg.use_wmega:
            # ---- per-window fused launches, multi-shard ----
            # one sweep_exact/sweep_stale launch per window (W-row grid),
            # then ONE residual psum over the marker axes — the multi-chip
            # analogue of the mega kernels (VERDICT r3 #1c). The packed
            # bytes are gathered per window (no second full shuffled copy
            # in HBM, unlike the whole-sweep mega's pk_shuf).
            if cfg.exact:
                mcol = jnp.stack([mave_s, mstd_s], axis=1)
            Cw = mrow.shape[1]
            out0 = jax.lax.pcast(
                jnp.zeros((cfg.m_loc, 4), f32), ma, to="varying")

            def wbody(w, carry):
                eps_d, out_acc = carry
                idx = jax.lax.dynamic_slice(perm, (w * W,), (W,))
                pk_w = jnp.take(packed, idx, axis=0)
                mrow_w = jax.lax.dynamic_slice(mrow, (w * W, 0), (W, Cw))
                if cfg.exact:
                    mcol_w = jax.lax.dynamic_slice(mcol, (w * W, 0), (W, 2))
                    eps_new_d, out_w = sweep_exact(
                        pk_w, eps_d, mrow_w, mcol_w, i_2se, dNm1,
                        window=W, n_mix=cfg.k, complete=cfg.complete,
                        ind_mask4=mask4, vma=vma_axes,
                        interpret=cfg.interpret)
                else:
                    eps_new_d, out_w = sweep_stale(
                        pk_w, eps_d, mrow_w, i_2se, dNm1,
                        window=W, n_mix=cfg.k, complete=cfg.complete,
                        ind_mask4=mask4, vma=vma_axes,
                        interpret=cfg.interpret)
                d_eps = hpsum(eps_new_d - eps_d, cfg.n_dcn)
                eps_d = eps_d + d_eps
                out_acc = jax.lax.dynamic_update_slice(
                    out_acc, out_w, (w * W, 0))
                return eps_d, out_acc

            eps_d, out_m = jax.lax.fori_loop(
                0, cfg.n_windows, wbody, (deinterleave(eps), out0))
            eps = interleave(eps_d)
        elif blockslot:
            # block schedule: NO gather — the kernel DMAs window rows from
            # the resident packed array through the win_perm prefetch map;
            # mrow (and mcol for exact) stay in slot order
            wp_arg = (wperm if wperm is not None
                      else jnp.arange(cfg.n_windows, dtype=jnp.int32))
            if cfg.exact:
                mcol = jnp.stack([mave_s, mstd_s], axis=1)
                eps_new_d, out_m = sweep_exact(
                    packed, deinterleave(eps), mrow, mcol, i_2se, dNm1,
                    window=cfg.window, n_mix=cfg.k, complete=cfg.complete,
                    ind_mask4=mask4, win_perm=wp_arg,
                    vma=vma_axes, interpret=cfg.interpret)
            else:
                eps_new_d, out_m = sweep_stale(
                    packed, deinterleave(eps), mrow, i_2se, dNm1,
                    window=cfg.window, n_mix=cfg.k, complete=cfg.complete,
                    ind_mask4=mask4, win_perm=wp_arg,
                    vma=vma_axes, interpret=cfg.interpret)
            eps = ma_sum(interleave(eps_new_d))
        else:
            pk_shuf = jnp.take(packed, perm, axis=0)
            # single-decode variant (decode each window's bytes ONCE through
            # a VMEM plane scratch) — opt-in experiment only: hardware-
            # measured 9% SLOWER than the two-phase kernel at M=100K x
            # N=50K (the staging + shallow-k MXU axpy outweigh the saved
            # decode; see sd_sub_window docstring). Default returns 0.
            wt_sd = 0 if cfg.exact else sd_sub_window(
                cfg.window, packed.shape[1], cfg.complete)
            if cfg.exact:
                # exact-mode mega: stats + Gram + the sequential W-step
                # recurrence + axpy fused per window, one launch per sweep —
                # same chain as the per-window exact path (window_stats +
                # window_gibbs + window_axpy), minus 3 launches and an eps
                # HBM round trip per window
                mcol = jnp.stack([mave_s, mstd_s], axis=1)
                eps_new_d, out_m = sweep_exact(
                    pk_shuf, deinterleave(eps), mrow, mcol, i_2se, dNm1,
                    window=cfg.window, n_mix=cfg.k, complete=cfg.complete,
                    ind_mask4=mask4,
                    vma=vma_axes, interpret=cfg.interpret)
            elif wt_sd:
                eps_new_d, out_m = sweep_stale_sd(
                    pk_shuf, deinterleave(eps), mrow, i_2se, dNm1,
                    window=cfg.window, sub_window=wt_sd, n_mix=cfg.k,
                    complete=cfg.complete,
                    ind_mask4=mask4,
                    vma=vma_axes, interpret=cfg.interpret)
            else:
                eps_new_d, out_m = sweep_stale(
                    pk_shuf, deinterleave(eps), mrow, i_2se, dNm1,
                    window=cfg.window, n_mix=cfg.k, complete=cfg.complete,
                    ind_mask4=mask4,
                    vma=vma_axes, interpret=cfg.interpret)
            # numerically the identity (mega is gated to n_dev == 1) but
            # marks the residual replicated again for shard_map's vma
            # checker — the mega path's analogue of the per-window hier_psum
            eps = ma_sum(interleave(eps_new_d))
        bnew_s = out_m[:, 0]
        comp_s = out_m[:, 1].astype(jnp.int32)
        acum_s = out_m[:, 2]
        dbeta_s = out_m[:, 3]
        if blockslot:      # out already in slot order: no scatter
            beta, comps, acum = bnew_s, comp_s, acum_s
        else:
            beta = beta.at[perm].set(bnew_s)
            comps = comps.at[perm].set(comp_s)
            acum = acum.at[perm].set(acum_s)
        cass = cass0 + jax.ops.segment_sum(
            act_s, grp_s * cfg.k + comp_s,
            num_segments=cfg.num_groups * cfg.k
        ).reshape(cfg.num_groups, cfg.k)
        sum_abs_db = ma_sum(jnp.sum(jnp.abs(dbeta_s)))
        if cfg.fh:
            rate = 0.5 * bnew_s * bnew_s / state.tau + cfg.v0L / nu_w_s
            if blockslot:
                lam = rate / g_lam
                nu = nu_w_s
            else:
                lam = lam.at[perm].set(rate / jnp.take(g_lam, perm))
                nu = nu.at[perm].set(nu_w_s)
    else:
        # this shard's real-individual count, for the exact+complete
        # integer-Gram correction (linear -> psum-safe under ind shards)
        n_real_loc = jnp.sum(ind_mask)
        if cfg.use_pallas or cfg.use_planes:
            from hydra_tpu.ops.window_kernels import deinterleave, interleave

            eps = deinterleave(eps)  # (4, NB) plane-major across the sweep
            ind_mask4 = deinterleave(ind_mask)
        eps, beta, comps, acum, lam, nu, cass, sum_abs_db = jax.lax.fori_loop(
            0, cfg.n_windows, window_body,
            (eps, beta, comps, acum, lam, nu, cass0, jnp.zeros((), f32)))
        if cfg.use_pallas or cfg.use_planes:
            eps = interleave(eps)

    # ---- cross-shard reductions (BayesRRm.cpp:2515-2521) ----
    cass = ma_sum(cass)
    bsqn_loc = jax.ops.segment_sum(beta * beta, groups, num_segments=cfg.num_groups)
    beta_sqn = ma_sum(bsqn_loc)

    # ---- per-group hyper-parameter updates (BayesRRm.cpp:2525-2578) ----
    m0 = mtot_grp.astype(f32) - cass[:, 0]
    cass_sum = jnp.sum(cass, axis=1)
    skip = (mtot_grp == 0) | (m0 == 0) | (cass_sum == 0)

    if cfg.fh:
        scaled_bsqn = ma_sum(
            jnp.sum(jnp.where(valid > 0, beta * beta / jnp.maximum(lam, 1e-30), 0.0)))
        tau = state.tau
        hyp_tau = state.hyp_tau
        c_slab = state.c_slab
        # sequential per-group tau chain (BayesRRm.cpp:2557-2562)
        for g in range(cfg.num_groups):
            kg = jax.random.fold_in(site(_S_TAU), g)
            ht = dist.inv_gamma_rate_rng(
                jax.random.fold_in(site(_S_HTAU), g), 0.5 + 0.5 * cfg.v0t,
                1.0 / (cfg.tau0 * cfg.tau0) + 1.0 / tau, dtype=f32)
            t = dist.inv_gamma_rate_rng(
                kg, 0.5 * (m0[g] + cfg.v0t), cfg.v0t / ht + 0.5 * scaled_bsqn,
                dtype=f32)
            cs = dist.inv_scaled_chisq_rng(
                jax.random.fold_in(site(_S_CSLAB), g), cfg.v0c + m0[g],
                (beta_sqn[g] * m0[g] + cfg.v0c * cfg.s02c) / (cfg.v0c + m0[g]),
                dtype=f32)
            hyp_tau = jnp.where(skip[g], hyp_tau, ht)
            tau = jnp.where(skip[g], tau, t)
            c_slab = c_slab.at[g].set(jnp.where(skip[g], c_slab[g], cs))
        sigma_g_new = beta_sqn                                     # :2565
    else:
        v0g = sigma_priors[:, 0]
        s02g = sigma_priors[:, 1]
        keys = jax.random.split(site(_S_SIGMAG), cfg.num_groups)
        draws = jax.vmap(
            lambda k, d, s: dist.inv_scaled_chisq_rng(k, d, s, dtype=f32)
        )(keys, v0g + m0, (beta_sqn * m0 + v0g * s02g) / jnp.maximum(v0g + m0, tiny))
        sigma_g_new = draws
        tau, hyp_tau, c_slab = state.tau, state.hyp_tau, state.c_slab
    sigma_g = jnp.where(skip, 0.0, sigma_g_new)

    # pi | Dirichlet(cass + dirc) (BayesRRm.cpp:2576-2577); skipped groups keep
    # their previous row (the reference `continue`s before this update).
    pi_draw = dist.dirichlet_rng(site(_S_PI), cass + dirc, dtype=f32)
    est_pi = jnp.where(skip[:, None], est_pi, pi_draw)

    # ---- fixed effects ridge sweep (BayesRRm.cpp:2648-2681) ----
    gamma = state.gamma
    if cfg.n_cov > 0:
        xi = jax.random.permutation(site(_S_COVPERM), cfg.n_cov)
        gdraws = jax.random.normal(site(_S_COV), (cfg.n_cov,), f32)
        denom_f = dNm1 + sigma_e / S02F

        def cov_step(carry, i):
            eps, gamma = carry
            col = x_cov[:, xi[i]]
            g_old = gamma[xi[i]]
            num_f = psum_i(
                jnp.dot(col, eps + g_old * col, preferred_element_type=f32, precision=_HI))
            g_new = num_f / denom_f + gdraws[i] * jnp.sqrt(sigma_e / denom_f)
            eps = eps + (g_old - g_new) * col
            gamma = gamma.at[xi[i]].set(g_new)
            return (eps, gamma), None

        (eps, gamma), _ = jax.lax.scan(cov_step, (eps, gamma), jnp.arange(cfg.n_cov))

    # ---- sigmaE (BayesRRm.cpp:2685-2690) ----
    e_sqn = psum_i(jnp.sum(eps * eps))
    sigma_e = dist.inv_scaled_chisq_rng(
        site(_S_SIGMAE), V0E + dN, (e_sqn + V0E * S02E) / (V0E + dN),
        dtype=f32)

    new_state = BayesRRmState(
        eps=eps, beta=beta, components=comps, acum=acum, mu=mu,
        sigma_e=sigma_e, sigma_g=sigma_g, est_pi=est_pi, gamma=gamma,
        lambda_var=lam, nu_var=nu, c_slab=c_slab, tau=tau, hyp_tau=hyp_tau)
    stats = IterStats(m0=m0, cass=cass, beta_sqn=beta_sqn,
                      sum_abs_dbeta=sum_abs_db)
    return new_state, stats


class BayesRRm:
    """Driver: data layout, state init, sharded iteration, chain loop.

    Equivalent role to BayesRRm::runMpiGibbs (BayesRRm.cpp:933): owns the
    sharded genotype arrays, the replicated residual, and the Gibbs schedule.
    Output writing / restart live in hydra_tpu.outputs and the CLI runner.
    """

    def __init__(self, dataset: Dataset, *, window: int = 1, exact: bool = True,
                 fh: bool = False, shuffle: bool = True, seed: int = 0,
                 mesh: Optional[Mesh] = None, n_devices: int = 0,
                 n_ind: int = 1, n_dcn: int = 1,
                 fh_params: Optional[dict] = None,
                 dtype: str = "float32", plane_cache: str = "auto",
                 mega: str = "auto", cross_sync: int = 0,
                 schedule: str = "auto", det_sync: bool = False):
        if dtype == "float64" and not jax.config.jax_enable_x64:
            raise ValueError(
                "--dtype float64 requires x64 mode "
                "(jax.config.update('jax_enable_x64', True) or JAX_ENABLE_X64=1)")
        self.ds = dataset
        self.mesh = mesh if mesh is not None else make_mesh(
            n_devices, n_ind=n_ind, n_dcn=n_dcn)
        n_dev, n_ind, n_dcn = mesh_axes(self.mesh)
        self.seed = seed

        geno = dataset.geno
        starts, lengths, m_loc = shard_layout(geno.m_global, n_dev, window,
                                              dataset.blocks)
        self.shard_starts, self.shard_lengths, self.m_loc = starts, lengths, m_loc
        # multi-process (jax.distributed): this process materializes only its
        # own marker shards; geno.packed may hold just the local rows
        self._n_procs = jax.process_count()
        if self._n_procs > 1 and n_ind > 1:
            raise NotImplementedError(
                "--ind-shards with multi-process execution is not supported "
                "yet (packed byte columns would shard across hosts)")

        K = dataset.mS.shape[1]
        fhp = fh_params or {}
        # cross-shard exchange interval (exact mode, D > 1): 0/auto -> one
        # exchange per window (the window-boundary residual psum; see
        # BayesRRmConfig.cross_sync for the semantics ladder)
        cs = min(cross_sync, window) if cross_sync > 0 else window
        if exact and cs < window and window % cs:
            raise ValueError(
                f"--cross-sync {cs} must divide the window ({window})")
        if geno.n_pad % (4 * n_ind):
            raise ValueError(
                f"individual padding {geno.n_pad} not divisible by "
                f"4*n_ind={4 * n_ind}; use a power-of-two inds axis <= 128")
        complete = bool(geno.nm_global_sum == 0)
        tpu_f32 = jax.default_backend() == "tpu" and dtype == "float32"
        # cached int8 decoded planes (ops/planes.py): stale complete-data
        # windows whose PER-SHARD planes fit the HBM budget — the
        # in-kernel 2-bit decode (the measured sweep bound at N >= 50K)
        # is replaced by a widen, halving VPU ops at 4x the (non-
        # bottleneck) HBM traffic. "auto" enables when m_loc x n_pad int8
        # fits alongside the packed bytes on each chip; "on" forces it
        # (and takes precedence over the mega auto-gate).
        planes_bytes = m_loc * geno.n_pad          # per marker shard
        planes_ok = (tpu_f32 and window >= 8 and not exact and complete
                     and n_ind == 1 and plane_cache != "off"
                     and jax.process_count() == 1)
        forced_planes = planes_ok and plane_cache == "on"
        # mega="on" forces the whole-sweep kernel beyond the auto gates
        # (still single-shard only); "off" disables it. Exact mode has its
        # own mega kernel (ops/sweep_kernel.sweep_exact: stats + Gram +
        # the in-VMEM W-step recurrence + axpy in one launch per sweep).
        mega_ok = (tpu_f32 and window >= 8
                   and n_dev == 1 and n_ind == 1 and n_dcn == 1)
        # Auto gates (hw_battery, 2026-08): at n_pad <= 16K the fused
        # sweep removes the dominant launch/glue cost (5.8 -> 1.9 ms at
        # M=10K x N=5K). At wider N its one-per-sweep full shuffle gather
        # of the packed bytes only amortizes at large M: measured 4.97 vs
        # 4.63 ms at M=10K x N=50K (loses) but 37.9 vs 39.8 ms at
        # M=100K x N=50K (wins). The gather materializes a second shuffled
        # copy of the packed bytes, so big-M runs must leave HBM room —
        # the M=500K x N=50K north star (2.2x packed = 13.8 GB) runs fine
        # on a 16 GB v5e and WINS with mega (193.2 vs 205.6 ms/sweep,
        # 2026-08-19), so the headroom constant admits it.
        packed_bytes = m_loc * (geno.n_pad // 4)
        if exact:
            # exact mega (re-measured 2026-08-19 with the integer-Gram
            # complete-data path): wins at small N where launch glue
            # dominates (4.83 vs 5.82 ms at M=10K x N=5K W=64) AND at
            # scale (75.7 vs 80.0 ms at M=100K x N=50K W=64 — the
            # integer Gram shrank phase 0 enough that the saved per-window
            # glue beats the per-sweep shuffle gather). Same HBM headroom
            # rule as stale mega (the gather's second packed copy).
            mega_auto = (geno.n_pad <= 16384
                         or (complete and 2.2 * packed_bytes < 14.5e9))
        else:
            # Wide N (n_pad >= 100K): the per-window path COLLAPSES — its
            # per-window (W, NB) row gather + eps HBM round trips measured
            # 16.4 ms/window at M=40K x N=500K vs the mega's 760 us
            # (21.6x, 2026-08-20) — so mega turns on whenever HBM fits,
            # regardless of M.
            mega_auto = (geno.n_pad <= 16384
                         or (m_loc >= 100_000
                             and 2.2 * packed_bytes < 14.5e9)
                         or (geno.n_pad >= 100_000
                             and 2.2 * packed_bytes < 14.5e9))
        # ---- schedule resolution (see BayesRRmConfig.schedule) ----
        if schedule not in ("auto", "marker", "block"):
            raise ValueError(f"schedule must be auto/marker/block, "
                             f"got {schedule!r}")
        if schedule == "block" and exact:
            # honored (the chain stays EXACT sequential Gibbs — zero
            # relaxation bias), but the processing order becomes
            # W-dependent, so W=1 == W=N chain equality no longer holds;
            # auto never selects this combination
            print("INFO   : exact mode with --schedule block: the chain "
                  "keeps exact sequential-Gibbs semantics, but the "
                  "window-width invariance (identical chains for any "
                  "--window) is waived — the scan order now depends on "
                  "the window partition", flush=True)
        if schedule == "auto":
            # Default to the block schedule wherever the mega kernel can
            # host it. Stale: hardware-measured 1.4-2.6x (no per-sweep
            # packed gather, no m_loc gathers/scatters; M=1M runs at the
            # bare-kernel 35 us/window) with h2 posterior shifts of
            # 0.002-0.008 across seeds — inside chain noise and below the
            # stale relaxation's own W=1024 shift (BIAS_SWEEP_SCHED.md).
            # Exact: block is STILL exact sequential Gibbs (the scan order
            # changes, the per-step conditioning does not — a valid
            # systematic-scan chain over the same posterior), measured
            # 1.4x at M=100K W=64 (75.7 -> 54.4 ms, 34.8 us/window); the
            # only cost is the window-width invariance (identical chains
            # for any --window), which --schedule marker restores.
            block_fit = packed_bytes + 1.5e9 < 15.5e9
            schedule = ("block" if (mega_ok and window >= 8
                                    and mega != "off" and not forced_planes
                                    and block_fit)
                        else "marker")
            if schedule == "block" and exact:
                print("INFO   : exact run — block schedule (exact "
                      "sequential-Gibbs semantics preserved; scan order "
                      "now depends on the window partition — --schedule "
                      "marker restores window-invariant chains)",
                      flush=True)
            elif schedule == "block":
                print("INFO   : stale run — block schedule (whole-sweep "
                      "kernel streams windows in place; --schedule marker "
                      "restores the reference's per-sweep marker shuffle)",
                      flush=True)
        use_mega = (mega_ok and mega != "off" and not forced_planes
                    and (mega == "on" or mega_auto or schedule == "block"))
        # Multi-shard per-window fused launches (VERDICT r3 #1c): the same
        # sweep kernels, ONE launch + ONE residual psum per window — D > 1
        # no longer re-pays the 2-3 launches + XLA glue the mega kernels
        # killed on one chip. Needs no in-window collectives: stale
        # windows, or exact with cross_sync >= window (the default).
        use_wmega = (tpu_f32 and window >= 8 and n_dev > 1 and n_ind == 1
                     and (not exact or cs >= window)
                     and mega != "off" and not forced_planes)
        # Opt-in ONLY (never auto): hardware measurement (hw_battery 5a/5b,
        # 2026-08) showed the planes path 15x SLOWER than decode-on-the-fly
        # at M=10K x N=50K (70.4 vs 4.63 ms/sweep) and a TPU worker crash
        # at M=100K planes-on — the int8 plane streaming loses to in-kernel
        # 2-bit decode despite halving VPU work. Kept as an experimental
        # path behind --cache-planes on.
        use_planes = planes_ok and not use_mega and forced_planes
        if forced_planes and planes_bytes > PLANES_HBM_BUDGET:
            print(f"INFO   : --cache-planes on exceeds the {PLANES_HBM_BUDGET / 1e9:.0f} "
                  f"GB HBM budget ({planes_bytes / 1e9:.1f} GB of planes) — "
                  "expect allocation failure", flush=True)
        if plane_cache == "on" and not use_planes:
            print("INFO   : --cache-planes on ignored (needs TPU backend, "
                  "float32, stale windows >= 8, complete data, no "
                  "ind-sharding)", flush=True)
        self.cfg = BayesRRmConfig(
            n_real=geno.n, n_pad=geno.n_pad, m_tot=geno.m_global, m_loc=m_loc,
            n_dev=n_dev, n_ind=n_ind, n_dcn=n_dcn, window=window, k=K,
            num_groups=dataset.num_groups,
            n_cov=0 if dataset.X is None else dataset.X.shape[1],
            exact=exact, fh=fh, shuffle=shuffle, dtype=dtype,
            cross_sync=cs, schedule=schedule, det_sync=det_sync,
            # complete data (no missing genotypes among real individuals):
            # mask-plane work in the window kernels degenerates to sums
            complete=complete,
            # window >= 8: the VPU lane reductions need a full sublane tile;
            # Mosaic rejects W=1 reduces ("only constant accumulators
            # supported"), and sub-8 windows are latency-bound anyway.
            use_pallas=(tpu_f32 and window >= 8),
            # whole-sweep fusion (ops/sweep_kernel.py): stale windows on a
            # single marker shard — multi-shard/ind-sharded runs need
            # per-window collectives a kernel cannot issue. Gated to narrow
            # problems (N <= 16K): the fixed per-window glue it removes
            # dominates there (5.8 -> 1.9 ms at M=10K x N=5K); at N=50K
            # the per-sweep shuffle gather outweighs it (crossover measured
            # at N ~ 20K, see STATUS.md).
            use_mega=use_mega,
            use_wmega=use_wmega,
            use_planes=use_planes,
            v0L=fhp.get("v0L", 3.0), v0t=fhp.get("v0t", 3.0),
            v0c=fhp.get("v0c", 3.0), s02c=fhp.get("s02c", 1.0),
            tau0=fhp.get("tau0", 1.0),
        )
        cfg = self.cfg

        # ---- global padded marker layout: slot = dev*m_loc + local ----
        # Setup phases are timed separately (self.setup_timings) so a slow
        # setup can be attributed: host layout copy vs h-pack LUT pass vs
        # the device_put HBM transfer (the latter rides the shared tunnel
        # on this host and can stall for minutes — bench.py detects and
        # annotates that instead of folding it into one opaque number).
        _t0 = time.perf_counter()
        m_glob = cfg.m_glob
        nb = geno.packed.shape[1]
        # multi-process: the packed-byte buffer holds only this process's
        # contiguous slot range (each host loaded only its own .bed rows);
        # slot-indexed metadata stays global-shape (small) and remote slots
        # simply keep fill values — make_array_from_callback never reads them.
        if self._n_procs > 1:
            from hydra_tpu.parallel.distributed import local_marker_shards
            local_d = local_marker_shards(self.mesh)
            if local_d != list(range(min(local_d), max(local_d) + 1)):
                raise NotImplementedError(
                    "non-contiguous local marker shards")
            slot_base = min(local_d) * m_loc
            packed_g = np.full((len(local_d) * m_loc, nb), 0b01010101,
                               dtype=np.uint8)
        else:
            local_d = list(range(n_dev))
            slot_base = 0
            packed_g = np.full((m_glob, nb), 0b01010101, dtype=np.uint8)
        groups_g = np.zeros(m_glob, dtype=np.int32)
        mave_g = np.zeros(m_glob, dtype=np.float32)
        mstd_g = np.zeros(m_glob, dtype=np.float32)
        valid_g = np.zeros(m_glob, dtype=np.float32)
        slot_to_marker = np.full(m_glob, -1, dtype=np.int64)
        for d in range(n_dev):
            s, l = int(starts[d]), int(lengths[d])
            sl = slice(d * m_loc, d * m_loc + l)
            if d in local_d:
                ls = s - geno.marker_offset
                loc = slice(sl.start - slot_base, sl.stop - slot_base)
                packed_g[loc] = geno.packed[ls: ls + l]
                mave_g[sl] = geno.mave[ls: ls + l]
                mstd_g[sl] = geno.mstd[ls: ls + l]
            groups_g[sl] = dataset.groups[s: s + l]
            valid_g[sl] = 1.0
            slot_to_marker[d * m_loc: d * m_loc + l] = np.arange(s, s + l)
        if cfg.schedule == "block":
            # one-time setup permutation of marker -> slot assignment so
            # the fixed window blocks are RANDOM marker sets, not genome-
            # adjacent (LD-correlated) runs (BayesRRmConfig.schedule).
            # Deterministic in the chain seed, so a --restart of the same
            # seed rebuilds the identical layout. Applied per shard to
            # preserve shard membership / --marker-blocks-file semantics.
            # Transiently copies one shard's packed rows on the host.
            rs = np.random.RandomState((seed ^ 0x5EED1) & 0x7FFFFFFF)
            for d in range(n_dev):
                sl = slice(d * m_loc, (d + 1) * m_loc)
                # every process draws ALL shard permutations in order so the
                # RandomState stream (and thus every shard's layout) is
                # process-count invariant
                p = rs.permutation(m_loc)
                if d in local_d:
                    loc = slice(sl.start - slot_base, sl.stop - slot_base)
                    packed_g[loc] = packed_g[loc][p]
                groups_g[sl] = groups_g[sl][p]
                mave_g[sl] = mave_g[sl][p]
                mstd_g[sl] = mstd_g[sl][p]
                valid_g[sl] = valid_g[sl][p]
                slot_to_marker[sl] = slot_to_marker[sl][p]
        self.slot_to_marker = slot_to_marker

        max_ = marker_axes(cfg.n_dcn)
        shard_m = NamedSharding(self.mesh, P(max_))
        rep = NamedSharding(self.mesh, P())
        if cfg.n_ind > 1:
            # 2-D layout: byte columns shard over the inds axis too, and the
            # N-length vectors (eps, ind_mask, covariates) shard over inds.
            shard_m2 = NamedSharding(self.mesh, P(max_, IND_AXIS))
            shard_i = NamedSharding(self.mesh, P(IND_AXIS))
            shard_i2 = NamedSharding(self.mesh, P(IND_AXIS, None))
        else:
            shard_m2 = NamedSharding(self.mesh, P(max_, None))
            shard_i = shard_i2 = rep
        self._shard_i = shard_i
        from hydra_tpu.parallel.distributed import put_global
        put = put_global if self._n_procs > 1 else jax.device_put
        self._put = put
        # device bytes are H-PACKED (crumb = 2 - geno, missing = 3): a
        # one-time host LUT that shrinks every in-kernel plane decode to
        # shift+and+cast (ops/decode.py). Host-side consumers (planes
        # build, sparse io, stats) keep the PLINK coding.
        from hydra_tpu.ops.decode import hpack_bytes
        _t1 = time.perf_counter()
        packed_h = hpack_bytes(packed_g)
        _t2 = time.perf_counter()
        if self._n_procs > 1:
            # compact local buffer -> global array: shard row ranges are
            # global, shift them into this process's buffer
            def _pk_cb(idx, _pk=packed_h):
                r0, r1, _ = idx[0].indices(m_glob)
                return _pk[r0 - slot_base: r1 - slot_base, idx[1]]

            self.packed = jax.make_array_from_callback(
                (m_glob, nb), shard_m2, _pk_cb)
        else:
            self.packed = put(packed_h, shard_m2)
        jax.block_until_ready(self.packed)
        _t3 = time.perf_counter()
        self.setup_timings = {"layout_s": _t1 - _t0, "hpack_s": _t2 - _t1,
                              "device_put_s": _t3 - _t2}
        del packed_h
        shard_pl = NamedSharding(self.mesh, P(max_, None))
        if cfg.use_planes:
            from hydra_tpu.ops.planes import build_planes_host

            planes_h = build_planes_host(packed_g)
        else:  # placeholder keeping the shard_map arity/specs static
            # cfg.n_dev is the TOTAL marker-shard count (incl. dcn)
            planes_h = np.zeros((cfg.n_dev, 128), np.int8)

        # mixture grids (BayesRRm.cpp:1004-1108)
        mS = dataset.mS.astype(np.float32)
        cvai = np.zeros_like(mS)
        cvai[:, 1:] = 1.0 / mS[:, 1:]
        # Dirichlet prior rows (ones, or --dPriorsFile; BayesRRm.cpp:2551-2554)
        dirc = (dataset.d_priors if dataset.d_priors is not None
                else np.ones((dataset.num_groups, K)))
        # sigmaG priors (v0G, s02G) per group (--groupPriorsFile; :2544-2548)
        sp = (dataset.priors if dataset.priors is not None
              else np.full((dataset.num_groups, 2), (V0G_DEFAULT, S02G_DEFAULT)))
        mtot_grp = np.bincount(dataset.groups, minlength=dataset.num_groups)
        ind_mask = np.zeros(geno.n_pad, dtype=np.float32)
        ind_mask[: geno.n] = 1.0
        if dataset.X is not None:
            xpad = np.zeros((geno.n_pad, dataset.X.shape[1]), dtype=np.float32)
            xpad[: geno.n] = dataset.X
        else:
            xpad = np.zeros((geno.n_pad, 0), np.float32)

        # ONE batched device_put for every small constant: on tunneled
        # backends each put is a host<->device round trip that can stall
        # for minutes (measured 2026-08-20: 14 sequential small puts =
        # 1,557 s of a wide-N setup; the 5 GB genotype transfer itself
        # took 18 s). A single pytree put issues them together.
        consts = put(
            dict(planes=planes_h, groups=groups_g, mave=mave_g,
                 mstd=mstd_g, valid=valid_g, cva=mS,
                 cvai=cvai,
                 dirc=np.asarray(dirc, np.float32),
                 sigma_priors=np.asarray(sp, np.float32),
                 mtot_grp=np.asarray(mtot_grp, np.int32),
                 ind_mask=ind_mask, x_cov=xpad),
            dict(planes=shard_pl, groups=shard_m, mave=shard_m,
                 mstd=shard_m, valid=shard_m, cva=rep, cvai=rep, dirc=rep,
                 sigma_priors=rep, mtot_grp=rep, ind_mask=shard_i,
                 x_cov=shard_i2))
        self.planes = consts["planes"]
        self.groups = consts["groups"]
        self.mave = consts["mave"]
        self.mstd = consts["mstd"]
        self.valid = consts["valid"]
        self.cva = consts["cva"]
        self.cvai = consts["cvai"]
        self.dirc = consts["dirc"]
        self.sigma_priors = consts["sigma_priors"]
        self.mtot_grp = consts["mtot_grp"]
        self.ind_mask = consts["ind_mask"]
        self.x_cov = consts["x_cov"]

        self._rep = rep
        self._shard_m = shard_m
        self._multi = {}
        self._step = self._build_step()
        if hasattr(self, "setup_timings"):
            # the small puts above (stats rows, mixture grids, masks) are
            # individually tiny but each rides the tunnel; under a stall
            # they can dominate — time them as one bucket
            self.setup_timings["other_puts_s"] = (
                time.perf_counter() - _t3 )

    # ------------------------------------------------------------------
    def init_state(self) -> BayesRRmState:
        """init_from_scratch equivalent (BayesRRm.cpp:1224-1240, :1564-1584)."""
        cfg = self.cfg
        fdt = jnp.float64 if cfg.dtype == "float64" else jnp.float32
        y = center_and_scale(self.ds.y)
        eps = np.zeros(cfg.n_pad, dtype=fdt)
        eps[: cfg.n_real] = y
        sigma_e = float(np.sum(y * y) / cfg.n_real * 0.5)

        # hyper draws on the CPU backend (bit-identical threefry values,
        # no per-process remote compiles — dist.host_draws docstring)
        with dist.host_draws():
            key = jax.random.key(self.seed)
            # sigmaG ~ Beta(1,1) per group, zero empty groups (:1231-1240)
            sg = np.array(dist.beta_rng(
                jax.random.fold_in(key, _S_INIT_SIGMAG), 1.0, 1.0,
                (cfg.num_groups,)))
        mtot_grp = np.bincount(self.ds.groups, minlength=cfg.num_groups)
        sg[mtot_grp == 0] = 0.0

        # priorPi: col0 = 0.5, rest proportional to cVa (:1097-1107)
        mS = self.ds.mS
        pi0 = np.zeros((cfg.num_groups, cfg.k))
        pi0[:, 0] = 0.5
        denom = mS[:, 1:].sum(axis=1, keepdims=True)
        pi0[:, 1:] = 0.5 * mS[:, 1:] / denom

        if cfg.fh:
            with dist.host_draws():
                kfh = jax.random.fold_in(key, _S_INIT_FH)
                hyp_tau = float(dist.inv_gamma_rate_rng(
                    jax.random.fold_in(kfh, 0), 0.5, 1.0 / (cfg.tau0 ** 2)))
                tau = float(dist.inv_gamma_rate_rng(
                    jax.random.fold_in(kfh, 1), 0.5 * cfg.v0t,
                    cfg.v0t / hyp_tau))
                c_slab = np.asarray(jax.vmap(
                    lambda k: dist.inv_scaled_chisq_rng(k, cfg.v0c, cfg.s02c)
                )(jax.random.split(jax.random.fold_in(kfh, 2),
                                   cfg.num_groups)))
            lam0 = float(c_slab.sum() / cfg.m_tot)       # :1160-1161
        else:
            hyp_tau, tau = 1.0, 1.0
            c_slab = np.zeros(cfg.num_groups)
            lam0 = 1.0

        # one batched pytree device_put of host NumPy arrays (see the
        # constructor's consts note: sequential small puts stall minutes
        # each on tunneled backends)
        ndt = np.float64 if cfg.dtype == "float64" else np.float32
        return self._put(
            BayesRRmState(
                eps=eps,
                beta=np.zeros(cfg.m_glob, ndt),
                components=np.zeros(cfg.m_glob, np.int32),
                acum=np.zeros(cfg.m_glob, ndt),
                mu=ndt(0.0),
                sigma_e=ndt(sigma_e),
                sigma_g=np.asarray(sg, ndt),
                est_pi=np.asarray(pi0, ndt),
                gamma=np.zeros(max(cfg.n_cov, 0), ndt),
                lambda_var=np.full(cfg.m_glob, lam0, ndt),
                nu_var=np.zeros(cfg.m_glob, ndt),
                c_slab=np.asarray(c_slab, ndt),
                tau=ndt(tau),
                hyp_tau=ndt(hyp_tau)),
            BayesRRmState(
                eps=self._shard_i, beta=self._shard_m,
                components=self._shard_m, acum=self._shard_m,
                mu=self._rep, sigma_e=self._rep, sigma_g=self._rep,
                est_pi=self._rep, gamma=self._rep,
                lambda_var=self._shard_m, nu_var=self._shard_m,
                c_slab=self._rep, tau=self._rep, hyp_tau=self._rep))

    # ------------------------------------------------------------------
    def init_state_from_restart(self, rd) -> BayesRRmState:
        """Rebuild device state from a RestartData (init_from_restart,
        BayesRRm.cpp:842-928). Resumes at rd.start_iteration."""
        cfg = self.cfg
        fdt = jnp.float64 if cfg.dtype == "float64" else jnp.float32
        st = self.init_state()
        eps = np.zeros(cfg.n_pad, dtype=fdt)
        eps[: cfg.n_real] = rd.eps
        beta_slot = np.zeros(cfg.m_glob, dtype=fdt)
        comp_slot = np.zeros(cfg.m_glob, dtype=np.int32)
        sel = self.slot_to_marker >= 0
        beta_slot[sel] = rd.beta[self.slot_to_marker[sel]]
        comp_slot[sel] = rd.components[self.slot_to_marker[sel]]
        put = self._put
        st = st._replace(
            eps=put(jnp.asarray(eps), self._shard_i),
            beta=put(jnp.asarray(beta_slot), self._shard_m),
            components=put(jnp.asarray(comp_slot), self._shard_m),
            mu=put(fdt(rd.mu), self._rep),
            sigma_e=put(fdt(rd.sigma_e), self._rep),
            sigma_g=put(jnp.asarray(rd.sigma_g, fdt), self._rep),
            est_pi=put(jnp.asarray(rd.est_pi, fdt), self._rep),
        )
        if rd.gamma is not None and cfg.n_cov > 0:
            st = st._replace(gamma=put(jnp.asarray(rd.gamma, fdt), self._rep))
        if rd.fh_state is not None and cfg.fh:
            lam_slot = np.ones(cfg.m_glob, dtype=fdt)
            nu_slot = np.zeros(cfg.m_glob, dtype=fdt)
            lam_slot[sel] = rd.fh_state["lambda_var"][self.slot_to_marker[sel]]
            nu_slot[sel] = rd.fh_state["nu_var"][self.slot_to_marker[sel]]
            st = st._replace(
                lambda_var=put(jnp.asarray(lam_slot), self._shard_m),
                nu_var=put(jnp.asarray(nu_slot), self._shard_m),
                c_slab=put(jnp.asarray(rd.fh_state["c_slab"], fdt), self._rep),
                tau=put(fdt(rd.fh_state["tau"]), self._rep),
                hyp_tau=put(fdt(rd.fh_state["hyp_tau"]), self._rep),
            )
        return st

    # ------------------------------------------------------------------
    def _build_step(self):
        cfg = self.cfg
        max_ = marker_axes(cfg.n_dcn)
        pm = P(max_)
        rep = P()
        if cfg.n_ind > 1:
            pm2 = P(max_, IND_AXIS)
            pi = P(IND_AXIS)
            pi2 = P(IND_AXIS, None)
        else:
            pm2 = P(max_, None)
            pi = pi2 = rep
        state_specs = BayesRRmState(
            eps=pi, beta=pm, components=pm, acum=pm, mu=rep, sigma_e=rep,
            sigma_g=rep, est_pi=rep, gamma=rep, lambda_var=pm, nu_var=pm,
            c_slab=rep, tau=rep, hyp_tau=rep)
        stats_specs = IterStats(m0=rep, cass=rep, beta_sqn=rep, sum_abs_dbeta=rep)

        fn = functools.partial(_local_iteration, cfg)
        pm_pl = P(max_, None)   # decoded-plane cache rows (or placeholder)
        self._sharded = sharded = jax.shard_map(
            fn, mesh=self.mesh,
            in_specs=(rep, rep, state_specs, pm2, pm_pl, pm, pm, pm, pm,
                      rep, rep, rep, rep, rep, pi, pi2),
            out_specs=(state_specs, stats_specs),
        )

        # The genotype bytes and per-marker constants are passed as explicit
        # jit ARGUMENTS, never closure captures: closed-over device arrays
        # are inlined into the lowered program as dense constants, which
        # makes the compile payload scale with M (1.25 GB of MLIR at
        # M=100K x N=50K — it broke the remote-compile transport long
        # before XLA even started).
        self._consts = (self.packed, self.planes, self.groups, self.mave,
                        self.mstd, self.valid, self.cva, self.cvai, self.dirc,
                        self.sigma_priors, self.mtot_grp, self.ind_mask,
                        self.x_cov)

        def raw_step(seed, it, state):
            return sharded(seed, it, state, *self._consts)

        self.raw_step = raw_step  # un-jitted (compile checks, graft)
        # NOTE: no donate_argnums — buffer donation adds ~25 ms/call of host
        # bookkeeping on tunneled TPU backends; the state copy is cheap.
        return jax.jit(sharded)

    def step(self, state: BayesRRmState, iteration: int
             ) -> Tuple[BayesRRmState, IterStats]:
        return self._step(jnp.uint32(self.seed), jnp.int32(iteration), state,
                          *self._consts)

    def run_steps(self, state: BayesRRmState, start_iteration: int, k: int
                  ) -> Tuple[BayesRRmState, IterStats]:
        """k Gibbs sweeps in ONE device dispatch (lax.scan over iterations).

        Identical chain to k calls of step() — the iteration number is the
        scanned variable, so per-iteration RNG keys match exactly. On
        tunneled/remote backends a single dispatch+fetch costs ~25 ms; for
        production chains this amortizes it over the thin interval instead
        of paying it every sweep. Returns the final state and the stacked
        (k, ...) IterStats."""
        multi = self._multi.get(k)
        if multi is None:
            def kloop(seed, it0, st, *consts):
                def body(st, it):
                    return self._sharded(seed, it, st, *consts)
                return jax.lax.scan(body, st, it0 + jnp.arange(k, dtype=jnp.int32))
            multi = jax.jit(kloop)
            self._multi[k] = multi
        return multi(jnp.uint32(self.seed), jnp.int32(start_iteration), state,
                     *self._consts)

    # ------------------------------------------------------------------
    def cov_order(self, iteration: int) -> np.ndarray:
        """The covariate processing order used at `iteration` (re-derives the
        in-step permutation; written to .xiv.0 for reference format parity —
        counter-based restart never consumes it)."""
        key = jax.random.fold_in(
            jax.random.fold_in(jax.random.key(self.seed), iteration), _S_COVPERM)
        return np.asarray(jax.random.permutation(key, self.cfg.n_cov),
                          dtype=np.int32)

    def beta_global(self, state: BayesRRmState) -> np.ndarray:
        """Gather beta into reference marker order (Mtot,)."""
        return self._to_marker_order(np.asarray(state.beta, dtype=np.float64))

    def components_global(self, state: BayesRRmState) -> np.ndarray:
        return self._to_marker_order(
            np.asarray(state.components, dtype=np.int64)).astype(np.int32)

    def acum_global(self, state: BayesRRmState) -> np.ndarray:
        return self._to_marker_order(np.asarray(state.acum, dtype=np.float64))

    def _to_marker_order(self, flat: np.ndarray) -> np.ndarray:
        out = np.zeros(self.cfg.m_tot, dtype=flat.dtype)
        sel = self.slot_to_marker >= 0
        out[self.slot_to_marker[sel]] = flat[sel]
        return out

    def run(self, n_iterations: int, state: Optional[BayesRRmState] = None,
            start_iteration: int = 0, callback=None):
        """Plain chain loop; the CLI runner adds thin/save output handling."""
        if state is None:
            state = self.init_state()
        stats = None
        for it in range(start_iteration, n_iterations):
            state, stats = self.step(state, it)
            if callback is not None:
                callback(it, state, stats)
        return state, stats
