"""Cached decoded-plane kernels (ops/planes.py): interpret-mode checks.

1. Kernel level: window_stats_planes / window_axpy_planes against a NumPy
   decode of the same packed bytes.
2. Sampler level: the use_planes chain equals the XLA window path bit-for-
   RNG-site (same stale semantics, f32 accumulation-order noise only) —
   mirroring tests/test_sweep_kernel.py for the mega path.
"""

import dataclasses

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from hydra_tpu.ops.planes import (build_planes_host, window_axpy_planes,
                                  window_stats_planes)
from hydra_tpu.parallel.mesh import make_mesh
from hydra_tpu.samplers.bayesrrm import BayesRRm

from tests.test_bayesrrm import simulate


def _random_planes(w=16, nb=256, seed=0):
    rs = np.random.RandomState(seed)
    # complete-data packed bytes: avoid the missing code 0b01 in every slot
    codes = rs.choice([0b00, 0b10, 0b11], size=(w, nb, 4))
    packed = (codes[..., 0] | (codes[..., 1] << 2) | (codes[..., 2] << 4)
              | (codes[..., 3] << 6)).astype(np.uint8)
    planes = build_planes_host(packed)
    # NumPy golden decode in the same flat-deinterleaved layout
    lut = np.array([2, 0, 1, 0], np.int64)
    g = np.concatenate(
        [lut[(packed.astype(np.int64) >> (2 * k)) & 3] for k in range(4)],
        axis=1)
    np.testing.assert_array_equal(planes, g)
    return packed, planes, g


def test_build_planes_matches_decode():
    _random_planes()


def test_stats_planes_kernel():
    _, planes, g = _random_planes(w=16, nb=256, seed=1)
    rs = np.random.RandomState(2)
    eps_flat = rs.randn(1, 4 * 256).astype(np.float32)
    s1 = np.asarray(window_stats_planes(
        jax.numpy.asarray(planes), jax.numpy.asarray(eps_flat),
        interpret=True))
    ref = g.astype(np.float64) @ eps_flat[0].astype(np.float64)
    np.testing.assert_allclose(s1, ref, rtol=1e-5, atol=1e-4)


def test_axpy_planes_kernel():
    _, planes, g = _random_planes(w=16, nb=256, seed=3)
    rs = np.random.RandomState(4)
    c1 = rs.randn(16).astype(np.float32) * 0.01
    d = np.asarray(window_axpy_planes(
        jax.numpy.asarray(planes), jax.numpy.asarray(c1), interpret=True))
    ref = c1.astype(np.float64) @ g.astype(np.float64)
    np.testing.assert_allclose(d[0], ref, rtol=1e-5, atol=1e-6)


def _planes_sampler(ds, window, seed, n_shards=1, n_dcn=1):
    from hydra_tpu.parallel.mesh import marker_axes

    s = BayesRRm(ds, window=window, exact=False, seed=seed,
                 mesh=make_mesh(n_shards, n_dcn=n_dcn), n_dcn=n_dcn)
    assert s.cfg.complete, "planes path is complete-data only"
    s.cfg = dataclasses.replace(s.cfg, use_planes=True, use_mega=False,
                                interpret=True)
    from hydra_tpu.ops.decode import unhpack_bytes

    # device bytes are h-packed; build_planes_host expects PLINK coding
    packed_g = unhpack_bytes(np.asarray(jax.device_get(s.packed)))
    s.planes = jax.device_put(
        build_planes_host(packed_g),
        NamedSharding(s.mesh, P(marker_axes(n_dcn), None)))
    s._step = s._build_step()
    s._multi = {}
    return s


def _compare(ds, window, seed=7, iters=3, n_shards=1, n_dcn=1):
    ref = BayesRRm(ds, window=window, exact=False, seed=seed,
                   mesh=make_mesh(n_shards, n_dcn=n_dcn), n_dcn=n_dcn)
    assert not ref.cfg.use_planes       # CPU backend: XLA path
    pls = _planes_sampler(ds, window, seed, n_shards, n_dcn)
    sr = ref.init_state()
    sp = pls.init_state()
    for it in range(iters):
        sr, str_ = ref.step(sr, it)
        sp, stp = pls.step(sp, it)
        np.testing.assert_allclose(np.asarray(str_.cass),
                                   np.asarray(stp.cass))
    np.testing.assert_allclose(np.asarray(sr.eps), np.asarray(sp.eps),
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(sr.beta), np.asarray(sp.beta),
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_array_equal(np.asarray(sr.components),
                                  np.asarray(sp.components))
    np.testing.assert_allclose(np.asarray(sr.sigma_g),
                               np.asarray(sp.sigma_g), rtol=1e-3, atol=1e-6)


def test_planes_matches_window_path():
    ds, _, _ = simulate(m=192, n=400, h2=0.5, seed=5)
    _compare(ds, window=16)


def test_planes_matches_window_path_sharded():
    ds, _, _ = simulate(m=256, n=300, h2=0.5, seed=6)
    _compare(ds, window=16, n_shards=4)


def test_planes_matches_window_path_dcn():
    # hierarchical (dcn, markers) mesh: planes rows shard over both axes
    ds, _, _ = simulate(m=256, n=300, h2=0.5, seed=8)
    _compare(ds, window=16, n_shards=4, n_dcn=2)
