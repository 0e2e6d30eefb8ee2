"""Cached decoded-plane kernels: trade HBM for VPU decode arithmetic.

The packed-byte kernels (ops/window_kernels.py) decode 2-bit genotypes
arithmetically on every pass — ~6 VPU ops per genotype, which is the
measured bound of the whole sweep at N >= 50K (STATUS.md roofline). When
the decoded planes fit in HBM (M x n_pad int8 — e.g. 5 GB at M=100K,
N=50K), decoding ONCE at setup and streaming int8 planes instead halves
the per-genotype op count:

  stats: widen i8->i32->f32 (2 ops) + multiply-accumulate (2)   = 4 ops
  axpy : widen (2 ops) + exact-f32 MXU vecmat                   ~ 2 ops
  vs the packed path's 6-op decode + the same compute            = 8+ ops

at 4x the HBM traffic (1 byte vs 2 bits per genotype) — still far under
the ~800 GB/s roofline, so the sweep stays VPU-bound but with half the
ops. The packed bytes remain the at-scale representation (M=500K planes
would need 25 GB); the cache is an opt-in fast path for problems that
fit (hydra keeps everything packed always — the reference has no
analogue because its LUT decode is nearly free on CPU,
src/BayesRRm.cpp:1774-1808).

HARDWARE VERDICT (v5e, 2026-08, scripts/probe_planes.py): the op-count
model above is wrong on the real chip — this path measures 15x SLOWER
than decode-on-the-fly (70.4 vs 4.63 ms/sweep at M=10K x N=50K W=256).
Two independent pathologies: (1) the per-window XLA row-gather of
(W, 4*NB) int8 runs at ~8 GB/s (1521 us/window alone — two orders under
the DMA roofline), and (2) even gather-free, the in-kernel i8->i32->f32
widen costs ~704 us/window — int8 (32,128)-tiled loads pay a 4x sublane
relayout per sub-slice that dwarfs the 6-op arithmetic decode it was
meant to replace. The sampler therefore never auto-enables this path
(samplers/bayesrrm.py); it stays behind --cache-planes on as a measured
negative result.

Layout: planes are stored FLAT-DEINTERLEAVED, (M, n_pad) int8 with
column k*NB + b = genotype of individual 4b + k — i.e. each marker row
is the plane-major (4, NB) decode of window_kernels laid end to end. The
residual in the same layout is just deinterleave(eps).reshape(1, 4*NB),
so the kernels need no per-plane pairing at all: one elementwise
multiply/VPU reduce (stats) or one (1,W)x(W,tn) MXU vecmat (axpy) over
the flat columns. Missing codes decode to 0, so pad individuals (padding
bytes are the missing pattern 0b01010101) contribute exactly nothing —
complete-data semantics only (the sampler gates on complete=True, the
case after the reference's own NA-individual removal).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hydra_tpu.ops.window_kernels import _pick_tile

f32 = jnp.float32

# byte -> (g(k=0), g(k=1), g(k=2), g(k=3)); codes 00->2, 10->1, 11->0,
# 01 (missing / pad) -> 0
_LUT = None


def _lut() -> np.ndarray:
    global _LUT
    if _LUT is None:
        codes = (np.arange(256, dtype=np.uint16)[:, None]
                 >> (2 * np.arange(4, dtype=np.uint16)[None, :])) & 3
        _LUT = np.choose(codes, [2, 0, 1, 0]).astype(np.int8)   # (256, 4)
    return _LUT


def build_planes_host(packed: np.ndarray) -> np.ndarray:
    """(M, NB) packed uint8 -> (M, 4*NB) int8 flat-deinterleaved planes.

    Uses the native OpenMP expander (native/bedio.cpp:bed_expand_planes)
    when available — the NumPy LUT fallback is single-threaded fancy
    indexing, ~10s at M=100K x N=50K."""
    from hydra_tpu import native

    out = native.bed_expand_planes(packed)
    if out is not None:
        return out
    lut = _lut()
    m, nb = packed.shape
    out = np.empty((m, 4 * nb), dtype=np.int8)
    for k in range(4):
        out[:, k * nb:(k + 1) * nb] = lut[packed, k]
    return out


def _auto_tile_planes(np_cols: int, w: int) -> int:
    """Tile of the flat column dim. The i8 block itself can be big (the
    widen is SUB-TILED inside the kernel, so the live f32 temp stays
    ~1 MB regardless); what matters is keeping the per-window grid-step
    count comparable to the packed kernels' (each step costs ~1.4 us of
    fixed overhead). Budget the (double-buffered) i8 block at ~6 MB."""
    budget = 6 * 1024 * 1024
    pref = int(budget / max(w, 8))
    return _pick_tile(np_cols, max(512, (pref // 128) * 128))


def _sub_slices(tn: int, target: int = 2048):
    """Static sub-slice width dividing tn, close to `target` columns —
    bounds the in-kernel widened f32 temp to W x sub x 4 bytes."""
    best = tn
    for cand in range(128, tn + 1, 128):
        if tn % cand == 0 and cand <= target:
            best = cand
    return best


def _stats_kernel(n_sub: int, sub: int, pl_ref, eps_ref, s1_ref):
    # VPU lane reduction — MXU matvecs with one live output column are
    # pathological (window_kernels module docstring). The i8 -> f32 widen
    # is done per sub-slice so its temp stays small while the HBM block
    # stays big (few grid steps). First grid step stores, later steps
    # accumulate (a zeros_like init would strip the vma annotation under
    # shard_map's interpret-mode checker).
    val = None
    for j in range(n_sub):
        g = pl_ref[:, j * sub:(j + 1) * sub].astype(jnp.int32).astype(f32)
        e = eps_ref[:, j * sub:(j + 1) * sub]        # (1, sub)
        a = jnp.sum(g * e, axis=1, keepdims=True)
        val = a if val is None else val + a

    @pl.when(pl.program_id(0) == 0)
    def _():
        s1_ref[:, :] = val

    @pl.when(pl.program_id(0) != 0)
    def _():
        s1_ref[:, :] += val


def window_stats_planes(planes: jax.Array, eps_flat: jax.Array,
                        tile_cols: int = 0, vma=None,
                        interpret: bool = False) -> jax.Array:
    """s1 (W,) = planes @ eps for one window.

    planes: (W, NP) int8 flat-deinterleaved; eps_flat: (1, NP) f32 =
    deinterleave(eps).reshape(1, -1). Complete-data semantics: the mask
    dot is sum(eps) (pads decode to 0), supplied by the caller.
    """
    W, NP = planes.shape
    tn = tile_cols if tile_cols else _auto_tile_planes(NP, W)
    grid = (NP // tn,)
    sub = _sub_slices(tn)
    sds = (jax.ShapeDtypeStruct((W, 1), f32, vma=set(vma)) if vma
           else jax.ShapeDtypeStruct((W, 1), f32))
    s1 = pl.pallas_call(
        functools.partial(_stats_kernel, tn // sub, sub),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((W, tn), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tn), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((W, 1), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=sds,
        interpret=interpret,
    )(planes, eps_flat)
    return s1[:, 0]


def _axpy_kernel(n_sub: int, sub: int, pl_ref, c1_ref, out_ref):
    # 2-pass exact-f32 MXU vecmat: g values {0,1,2} are bf16-exact, so
    # only the coefficient row needs the hi/lo split. Widen sub-slice by
    # sub-slice (see _stats_kernel).
    c1 = c1_ref[:, :]
    c1h = c1.astype(jnp.bfloat16).astype(f32)
    c1l = c1 - c1h

    # always-true pl.when: shard_map's interpret-mode vma checker rejects
    # bare stores of varying values into the (unannotated) output carry;
    # routing the store through the cond unifies the types (the pattern
    # every kernel in ops/ relies on implicitly — their stores all sit
    # under grid-position conds)
    @pl.when(pl.program_id(0) >= 0)
    def _():
        for j in range(n_sub):
            g = pl_ref[:, j * sub:(j + 1) * sub].astype(
                jnp.int32).astype(f32)
            out_ref[:, j * sub:(j + 1) * sub] = (
                jnp.dot(c1h, g, preferred_element_type=f32)
                + jnp.dot(c1l, g, preferred_element_type=f32))


def window_axpy_planes(planes: jax.Array, c1: jax.Array,
                       tile_cols: int = 0, vma=None,
                       interpret: bool = False) -> jax.Array:
    """dEps_flat (1, NP) = sum_m c1_m * G_m over the flat planes.

    Complete-data contract mirrors window_axpy(complete=True): the caller
    adds sum(c2) and multiplies by the flat individual mask.
    """
    W, NP = planes.shape
    tn = tile_cols if tile_cols else _auto_tile_planes(NP, W)
    grid = (NP // tn,)
    sub = _sub_slices(tn)
    sds = (jax.ShapeDtypeStruct((1, NP), f32, vma=set(vma)) if vma
           else jax.ShapeDtypeStruct((1, NP), f32))
    return pl.pallas_call(
        functools.partial(_axpy_kernel, tn // sub, sub),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((W, tn), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, W), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tn), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=sds,
        interpret=interpret,
    )(planes, c1.reshape(1, W).astype(f32))
