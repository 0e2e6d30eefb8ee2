"""Whole-sweep mega-kernel equivalence (interpret mode on CPU).

The mega path (ops/sweep_kernel.py) must produce the same chain as the
per-window XLA path: identical RNG sites, identical stale-window semantics,
only f32 accumulation-order differences.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from hydra_tpu.parallel.mesh import make_mesh
from hydra_tpu.samplers.bayesrrm import BayesRRm

from tests.test_bayesrrm import simulate


def _mega_sampler(ds, window, seed, **kw):
    s = BayesRRm(ds, window=window, exact=False, seed=seed,
                 mesh=make_mesh(1), **kw)
    s.cfg = dataclasses.replace(s.cfg, use_mega=True, interpret=True)
    s._step = s._build_step()
    s._multi = {}
    return s


def _states_close(sa, sb, atol=5e-4):
    np.testing.assert_allclose(np.asarray(sa.eps), np.asarray(sb.eps),
                               atol=atol, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(sa.beta), np.asarray(sb.beta),
                               atol=atol, rtol=1e-3)
    # a component flip needs u to land within fp noise of a cum boundary —
    # not observed at these sizes; assert exact agreement
    np.testing.assert_array_equal(np.asarray(sa.components),
                                  np.asarray(sb.components))
    np.testing.assert_allclose(float(sa.sigma_e), float(sb.sigma_e),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(sa.sigma_g),
                               np.asarray(sb.sigma_g), rtol=1e-3, atol=1e-6)


def _compare(ds, window, seed=7, iters=3, **kw):
    ref = BayesRRm(ds, window=window, exact=False, seed=seed,
                   mesh=make_mesh(1), **kw)
    mega = _mega_sampler(ds, window, seed, **kw)
    assert not ref.cfg.use_mega          # CPU backend: XLA path
    sr = ref.init_state()
    sm = mega.init_state()
    for it in range(iters):
        sr, str_ = ref.step(sr, it)
        sm, stm = mega.step(sm, it)
        np.testing.assert_allclose(np.asarray(str_.cass),
                                   np.asarray(stm.cass))
    _states_close(sr, sm)
    return sr, sm


def test_mega_matches_window_path():
    ds, _, _ = simulate(m=192, n=400, h2=0.5, seed=5)
    _compare(ds, window=32)


def test_mega_matches_window_path_groups():
    ds, _, _ = simulate(m=192, n=400, h2=0.5, seed=9, num_groups=2)
    _compare(ds, window=48)


def test_mega_matches_window_path_missing_data():
    """Missing genotypes (complete=False) exercise the mask-plane path."""
    ds, _, _ = simulate(m=128, n=300, h2=0.5, seed=11)
    pk = np.asarray(ds.geno.packed).copy()
    # punch missing codes (01) into some bytes' first genotype
    rs = np.random.RandomState(1)
    rows = rs.choice(pk.shape[0], 40, replace=False)
    for r in rows:
        pk[r, rs.randint(0, 60)] = (pk[r, 0] & 0b11111100) | 0b01
    from hydra_tpu.data.genotypes import Dataset, GenotypeData
    geno = GenotypeData.from_packed(pk, ds.geno.n,
                                    np.array([], dtype=np.int64))
    ds2 = Dataset(geno=geno, y=ds.y, groups=ds.groups,
                  num_groups=ds.num_groups, mS=ds.mS)
    ref = BayesRRm(ds2, window=32, exact=False, seed=3, mesh=make_mesh(1))
    assert not ref.cfg.complete
    _compare(ds2, window=32, seed=3)


def test_mega_matches_window_path_fh():
    ds, _, _ = simulate(m=128, n=300, h2=0.5, seed=13)
    sr, sm = _compare(ds, window=32, seed=5, fh=True)
    np.testing.assert_allclose(np.asarray(sr.lambda_var),
                               np.asarray(sm.lambda_var),
                               rtol=1e-3, atol=1e-5)
