"""BayesW whole-sweep mega-kernel equivalence (interpret mode on CPU).

The mega path (ops/sweep_kernel_bw.py) must continue the same chain as the
per-window XLA path: identical RNG sites (component uniform + the slice
sampler's per-window exponential/bracket/shrink schedule), identical
stale-window semantics, only f32 accumulation-order differences.
"""

import dataclasses

import numpy as np
import pytest

from hydra_tpu.parallel.mesh import make_mesh
from hydra_tpu.samplers.bayesw import BayesW

from tests.test_bayesw import simulate_weibull


def _mega_sampler(ds, window, seed, quad_points, schedule="auto"):
    s = BayesW(ds, window=window, seed=seed, mesh=make_mesh(1),
               quad_points=quad_points, schedule=schedule)
    s.cfg = dataclasses.replace(s.cfg, use_mega=True, interpret=True)
    s._step = s._build_step()
    s._multi = {}
    return s


def _compare(ds, window, seed=7, iters=3, quad_points=9,
             beta_atol=5e-4, schedule="auto"):
    ref = BayesW(ds, window=window, seed=seed, mesh=make_mesh(1),
                 quad_points=quad_points, schedule=schedule)
    mega = _mega_sampler(ds, window, seed, quad_points, schedule=schedule)
    assert not ref.cfg.use_mega            # CPU backend: XLA path
    sr = ref.init_state()
    sm = mega.init_state()
    for it in range(iters):
        sr, str_ = ref.step(sr, it)
        sm, stm = mega.step(sm, it)
        np.testing.assert_allclose(np.asarray(str_.cass),
                                   np.asarray(stm.cass))
    np.testing.assert_allclose(np.asarray(sr.eps), np.asarray(sm.eps),
                               atol=beta_atol, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(sr.beta), np.asarray(sm.beta),
                               atol=beta_atol, rtol=1e-3)
    np.testing.assert_array_equal(np.asarray(sr.components),
                                  np.asarray(sm.components))
    np.testing.assert_allclose(float(sr.alpha), float(sm.alpha), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sr.sigma_g),
                               np.asarray(sm.sigma_g), rtol=1e-3, atol=1e-7)
    np.testing.assert_allclose(np.asarray(sr.pi_l),
                               np.asarray(sm.pi_l), rtol=1e-3, atol=1e-6)
    return sr, sm


# All three equality runs are slow-tier: the cost is COMPILING the
# interpret-mode mega kernel (~60-90 s on this host, measured: first step
# 89 s, second step 8 ms), so shrinking the problem cannot produce a fast
# variant. Fast-tier BayesW coverage lives in test_bayesw.py (XLA window
# path); the mega kernel is additionally checked compiled-vs-interpret on
# real TPU by scripts/kernel_check.py.
@pytest.mark.slow
def test_bw_mega_matches_window_path():
    ds, *_ = simulate_weibull(m=128, n=400, seed=5)
    _compare(ds, window=32)


@pytest.mark.slow
def test_bw_mega_matches_window_path_w8():
    ds, *_ = simulate_weibull(m=64, n=300, seed=9)
    _compare(ds, window=8, quad_points=25)


@pytest.mark.slow
def test_bw_mega_matches_window_path_censoring():
    ds, *_ = simulate_weibull(m=96, n=300, censor_frac=0.3, seed=11)
    _compare(ds, window=24)


@pytest.mark.slow
def test_bw_block_schedule_mega_matches_window_path():
    """Block-schedule bw mega (win_perm prefetch, no gather) == the XLA
    per-window path on the same composite schedule."""
    ds, *_ = simulate_weibull(m=96, n=240, seed=31)
    _compare(ds, window=32, schedule="block")


@pytest.mark.slow
def test_bw_mega_w1_exact_sequential():
    """window=1 mega == the W=1 XLA window path: EXACT sequential BayesW
    (level sums + draw + vi refresh per marker). This is the only viable
    exact-BayesW route on TPU — the per-window path pays ~90 us of glue
    per window (~9 s/sweep at M=100K for W=1) — so the mega gate admits
    W=1 and this pins its semantics."""
    ds, *_ = simulate_weibull(m=48, n=240, seed=13)
    _compare(ds, window=1, quad_points=9)
