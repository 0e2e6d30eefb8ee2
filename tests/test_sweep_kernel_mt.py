"""Multi-trait whole-sweep mega-kernel equivalence (interpret mode on CPU).

The mt mega path (ops/sweep_kernel_mt.py) must produce the same chain as
the per-window XLA path: identical RNG sites, identical stale-window
semantics, only f32 accumulation-order differences.
"""

import dataclasses

import numpy as np

from hydra_tpu.parallel.mesh import make_mesh
from hydra_tpu.samplers.bayesrrm_mt import BayesRRmMT

from tests.test_bayesrrm_mt import simulate_mt


def _mega_sampler(ds, phenos, window, seed, schedule="auto"):
    s = BayesRRmMT(ds, phenos, window=window, exact=False,
                   seed=seed, mesh=make_mesh(1), schedule=schedule)
    s.cfg = dataclasses.replace(s.cfg, use_mega=True, interpret=True)
    s._step = s._build_step()
    return s


def _states_close(sa, sb, atol=5e-4):
    np.testing.assert_allclose(np.asarray(sa.eps), np.asarray(sb.eps),
                               atol=atol, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(sa.beta), np.asarray(sb.beta),
                               atol=atol, rtol=1e-3)
    np.testing.assert_array_equal(np.asarray(sa.components),
                                  np.asarray(sb.components))
    np.testing.assert_allclose(np.asarray(sa.sigma_e),
                               np.asarray(sb.sigma_e), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(sa.sigma_g),
                               np.asarray(sb.sigma_g), rtol=1e-3, atol=1e-6)


def _compare(ds, phenos, window, seed=7, iters=3, schedule="auto"):
    ref = BayesRRmMT(ds, phenos, window=window, exact=False,
                     seed=seed, mesh=make_mesh(1), schedule=schedule)
    assert not ref.cfg.use_mega          # CPU backend: XLA path
    mega = _mega_sampler(ds, phenos, window, seed, schedule=schedule)
    sr = ref.init_state()
    sm = mega.init_state()
    for it in range(iters):
        sr, str_ = ref.step(sr, it)
        sm, stm = mega.step(sm, it)
        np.testing.assert_allclose(np.asarray(str_.cass),
                                   np.asarray(stm.cass))
    _states_close(sr, sm)


def _compare_exact(ds, phenos, window, seed=7, iters=3, schedule="auto"):
    """Exact mt mega kernel (interpret) vs the exact XLA window path."""
    ref = BayesRRmMT(ds, phenos, window=window, seed=seed, mesh=make_mesh(1),
                     schedule=schedule)
    assert ref.cfg.exact and not ref.cfg.use_mega
    mega = BayesRRmMT(ds, phenos, window=window, seed=seed,
                      mesh=make_mesh(1), schedule=schedule)
    mega.cfg = dataclasses.replace(mega.cfg, use_mega=True, interpret=True)
    mega._step = mega._build_step()
    sr = ref.init_state()
    sm = mega.init_state()
    for it in range(iters):
        sr, str_ = ref.step(sr, it)
        sm, stm = mega.step(sm, it)
        np.testing.assert_allclose(np.asarray(str_.cass),
                                   np.asarray(stm.cass))
    _states_close(sr, sm)


def test_mt_mega_matches_window_path():
    ds, phenos, _ = simulate_mt(m=96, n=320, n_traits=3, seed=5)
    _compare(ds, phenos, window=16)


def test_mt_exact_mega_matches_window_path():
    """Exact mt mega (shared integer Gram + (T, W) in-VMEM recurrence)
    must continue the exact window path's chain."""
    ds, phenos, _ = simulate_mt(m=96, n=320, n_traits=3, seed=5)
    _compare_exact(ds, phenos, window=16)


def test_mt_exact_mega_with_padded_markers():
    """M % W != 0: pads shuffle into windows; the trait-mask rows must
    null their lanes (incl. the h-decode csum constant)."""
    ds, phenos, _ = simulate_mt(m=68, n=256, n_traits=2, seed=19)
    _compare_exact(ds, phenos, window=16, iters=4)


def test_mt_mega_matches_window_path_with_nans():
    # NaN-masked phenotypes: incomplete eps/mask handling in the kernel
    ds, phenos, _ = simulate_mt(m=96, n=320, n_traits=2, seed=9,
                                na_frac=0.15)
    _compare(ds, phenos, window=16)


def test_mt_mega_matches_window_path_w32():
    ds, phenos, _ = simulate_mt(m=128, n=256, n_traits=2, seed=11)
    _compare(ds, phenos, window=32)


def test_mt_mega_matches_window_path_missing_genotypes():
    # inject missing genotype codes (0b01) -> complete=False kernel branch
    import dataclasses as dc

    from hydra_tpu.data.genotypes import GenotypeData

    ds, phenos, _ = simulate_mt(m=96, n=320, n_traits=2, seed=13)
    rs = np.random.RandomState(3)
    pk = np.asarray(ds.geno.packed).copy()
    n = ds.geno.n
    for _ in range(60):
        m_i = rs.randint(pk.shape[0])
        ind = rs.randint(n)
        b, sh = divmod(ind, 4)
        pk[m_i, b] = ((pk[m_i, b] & (0xFF ^ (0b11 << (2 * sh))))
                      | (0b01 << (2 * sh)))
    gd = GenotypeData.from_packed(pk, n, np.array([], np.int64))
    assert gd.nm.sum() > 0
    ds = dc.replace(ds, geno=gd)
    _compare(ds, phenos, window=16)


def test_mt_block_schedule_mega_matches_window_path():
    """Block-schedule mt mega (win_perm prefetch, no gather) == the XLA
    per-window path on the same composite schedule."""
    ds, phenos, _ = simulate_mt(m=128, n=300, n_traits=3, seed=21)
    _compare(ds, phenos, window=32, schedule="block")


def test_mt_exact_block_schedule_mega_matches_window_path():
    """EXACT mt mega on the block schedule (win_perm prefetch) == the exact
    XLA window path on the same composite schedule — exact semantics are
    scan-order-only under block (see bayesrrm_mt schedule resolution)."""
    ds, phenos, _ = simulate_mt(m=96, n=250, n_traits=3, seed=23)
    _compare_exact(ds, phenos, window=16, schedule="block")
