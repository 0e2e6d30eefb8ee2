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


def test_sd_sub_windowing_matches_two_phase():
    """sweep_stale_sd with sub_window < window (d_eps accumulated across
    sub-steps, applied at the window boundary) must match the two-phase
    kernel: identical stats per marker, identical draws, eps equal up to
    f32 accumulation order of the chunked axpy."""
    from hydra_tpu.ops.sweep_kernel import (mrow_width, sweep_stale,
                                            sweep_stale_sd)

    from hydra_tpu.ops.decode import hpack_bytes

    rs = np.random.RandomState(3)
    m, NB, W, K = 64, 256, 32, 4
    geno = rs.randint(0, 3, (m, 4 * NB)).astype(np.uint8)
    code = np.select([geno == 0, geno == 1, geno == 2],
                     [0b11, 0b10, 0b00]).astype(np.uint8)
    pk = hpack_bytes(
        (code[:, 0::4] | (code[:, 1::4] << 2) | (code[:, 2::4] << 4)
         | (code[:, 3::4] << 6)).astype(np.uint8))
    eps_d = rs.randn(4, NB).astype(np.float32)
    mask = np.ones((4, NB), np.float32)

    C = mrow_width(K)
    mrow = np.zeros((m, C), np.float32)
    mrow[:, 0] = rs.uniform(0.2, 1.8, m)           # mave
    mrow[:, 1] = rs.uniform(0.8, 1.6, m)           # mstd
    mrow[:, 2] = rs.randn(m) * 0.02                # beta_old
    mrow[:, 3] = rs.uniform(0, 1, m)               # u
    mrow[:, 4] = rs.randn(m)                       # nrm
    mrow[:, 5] = 1.0                               # act
    mrow[:, 6:6 + K] = np.log(rs.dirichlet(np.ones(K), m))
    mrow[:, 6 + K:6 + 2 * K - 1] = rs.uniform(8e-4, 1.2e-3, (m, K - 1))
    mrow[:, 6 + 2 * K - 1:] = rs.uniform(0.02, 0.04, (m, K - 1))

    args = (jnp.asarray(pk), jnp.asarray(eps_d), jnp.asarray(mrow),
            jnp.float32(0.7), jnp.float32(999.0))
    kw = dict(window=W, n_mix=K, complete=True,
              ind_mask4=jnp.asarray(mask), interpret=True)
    eps_a, out_a = sweep_stale(*args, **kw)
    for wt in (8, 16, 32):
        eps_b, out_b = sweep_stale_sd(*args, sub_window=wt, **kw)
        np.testing.assert_array_equal(np.asarray(out_a[:, 1]),
                                      np.asarray(out_b[:, 1]))  # components
        np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                                   rtol=2e-5, atol=2e-6, err_msg=f"wt={wt}")
        np.testing.assert_allclose(np.asarray(eps_a), np.asarray(eps_b),
                                   rtol=1e-4, atol=2e-5, err_msg=f"wt={wt}")


def _mega_exact_sampler(ds, window, seed, **kw):
    s = BayesRRm(ds, window=window, exact=True, seed=seed,
                 mesh=make_mesh(1), **kw)
    s.cfg = dataclasses.replace(s.cfg, use_mega=True, interpret=True)
    s._step = s._build_step()
    s._multi = {}
    return s


def _compare_exact(ds, window, seed=7, iters=3, **kw):
    ref = BayesRRm(ds, window=window, exact=True, seed=seed,
                   mesh=make_mesh(1), **kw)
    mega = _mega_exact_sampler(ds, window, seed, **kw)
    assert not ref.cfg.use_mega
    sr = ref.init_state()
    sm = mega.init_state()
    for it in range(iters):
        sr, str_ = ref.step(sr, it)
        sm, stm = mega.step(sm, it)
        np.testing.assert_allclose(np.asarray(str_.cass),
                                   np.asarray(stm.cass))
    _states_close(sr, sm)
    return sr, sm


def test_exact_mega_matches_window_path():
    """Exact-mode mega kernel (stats + Gram + in-VMEM recurrence + axpy in
    one launch) must continue the per-window exact path's chain."""
    ds, _, _ = simulate(m=128, n=300, h2=0.5, seed=15)
    _compare_exact(ds, window=32)


def test_exact_mega_matches_window_path_w8():
    ds, _, _ = simulate(m=64, n=256, h2=0.5, seed=19)
    _compare_exact(ds, window=8)


def test_exact_mega_with_padded_markers():
    """M not divisible by W: shard padding adds idle marker slots and the
    per-sweep shuffle can park one at ANY window position — including
    slot 0. The complete-mode c2 broadcast must therefore ride the
    explicit lane mask, never a decoded marker mask row (a pad marker's
    row is all-zero and would silently drop the window's c2 term)."""
    ds, _, _ = simulate(m=68, n=256, h2=0.5, seed=31)   # m_loc=80: 12 pads
    _compare_exact(ds, window=16, iters=4)


def test_exact_mega_matches_window_path_missing():
    """Missing genotypes force the general (non-integer-Gram) exact path;
    it must still continue the per-window exact chain."""
    from hydra_tpu.data.genotypes import Dataset, GenotypeData, \
        make_default_groups
    from hydra_tpu.io.plink import bed_bytes_per_marker, MISSING_CODE

    rs = np.random.RandomState(27)
    m, n = 64, 256
    maf = rs.uniform(0.1, 0.5, m)
    geno = (rs.binomial(1, maf[:, None], (m, n))
            + rs.binomial(1, maf[:, None], (m, n)))
    geno[rs.random((m, n)) < 0.05] = -1          # 5% missing
    code = np.select([geno == 0, geno == 1, geno == 2, geno < 0],
                     [0b11, 0b10, 0b00, MISSING_CODE]).astype(np.uint8)
    nbytes = bed_bytes_per_marker(n)
    padded = np.full((m, nbytes * 4), MISSING_CODE, dtype=np.uint8)
    padded[:, :n] = code
    packed = (padded[:, 0::4] | (padded[:, 1::4] << 2)
              | (padded[:, 2::4] << 4) | (padded[:, 3::4] << 6)
              ).astype(np.uint8)
    gd = GenotypeData.from_packed(packed, n, np.array([], dtype=np.int64))
    assert int(np.asarray(gd.nm).sum()) > 0
    x = np.where(geno >= 0, geno, 0).astype(np.float64)
    beta = rs.randn(m) * np.sqrt(0.5 / m)
    y = x.T @ beta + rs.randn(n) * np.sqrt(0.5)
    groups, mS = make_default_groups(m, [0.001, 0.01, 0.1])
    ds = Dataset(geno=gd, y=y, groups=groups, num_groups=1, mS=mS)
    ref = BayesRRm(ds, window=16, exact=True, seed=7, mesh=make_mesh(1))
    assert not ref.cfg.complete
    _compare_exact(ds, window=16)


def test_exact_mega_matches_window_path_fh():
    ds, _, _ = simulate(m=96, n=256, h2=0.5, seed=23)
    sr, sm = _compare_exact(ds, window=16, seed=9, fh=True)
    np.testing.assert_allclose(np.asarray(sr.lambda_var),
                               np.asarray(sm.lambda_var),
                               rtol=1e-3, atol=1e-5)


# ---------------------------------------------------------------------------
# Multi-shard per-window fused launches (use_wmega): the same sweep kernels,
# one launch + one residual psum per window (VERDICT r3 #1c). Must continue
# the XLA multi-shard chain exactly (stale windows; exact cross_sync=W).
# ---------------------------------------------------------------------------

def _wmega_sampler(ds, window, seed, n_dev, exact, **kw):
    s = BayesRRm(ds, window=window, exact=exact, seed=seed,
                 mesh=make_mesh(n_dev), **kw)
    s.cfg = dataclasses.replace(s.cfg, use_wmega=True, interpret=True)
    s._step = s._build_step()
    s._multi = {}
    return s


def _compare_wmega(ds, window, n_dev, exact, seed=7, iters=3, **kw):
    ref = BayesRRm(ds, window=window, exact=exact, seed=seed,
                   mesh=make_mesh(n_dev), **kw)
    wm = _wmega_sampler(ds, window, seed, n_dev, exact, **kw)
    assert not ref.cfg.use_wmega and not ref.cfg.use_mega
    assert wm.cfg.n_dev == n_dev
    sr = ref.init_state()
    sm = wm.init_state()
    for it in range(iters):
        sr, str_ = ref.step(sr, it)
        sm, stm = wm.step(sm, it)
        np.testing.assert_allclose(np.asarray(str_.cass),
                                   np.asarray(stm.cass))
    _states_close(sr, sm)
    return sr, sm


def test_wmega_stale_matches_window_path():
    ds, _, _ = simulate(m=128, n=300, h2=0.5, seed=35)
    _compare_wmega(ds, window=16, n_dev=4, exact=False)


def test_wmega_exact_matches_window_path():
    """Exact default on D>1 (cross_sync=W): per-window sweep_exact launch +
    psum must equal the XLA local-Gram scan path."""
    ds, _, _ = simulate(m=128, n=300, h2=0.5, seed=37)
    _compare_wmega(ds, window=16, n_dev=4, exact=True)


def test_wmega_exact_padded_markers():
    ds, _, _ = simulate(m=100, n=256, h2=0.5, seed=39)  # pads on each shard
    _compare_wmega(ds, window=8, n_dev=4, exact=True, iters=4)


# ---- block schedule (win_perm scalar-prefetch mega, round 4) ----

def test_block_schedule_mega_matches_window_path():
    """Block-schedule mega (win_perm prefetch DMA, no gather) must equal
    the XLA per-window path running the SAME composite schedule."""
    ds, _, _ = simulate(m=192, n=400, h2=0.5, seed=5)
    _compare(ds, window=32, schedule="block")


def test_block_schedule_mega_missing_data():
    ds, _, _ = simulate(m=128, n=300, h2=0.5, seed=11)
    pk = np.asarray(ds.geno.packed).copy()
    rs = np.random.RandomState(1)
    for r in rs.choice(pk.shape[0], 40, replace=False):
        pk[r, rs.randint(0, 60)] = (pk[r, 0] & 0b11111100) | 0b01
    from hydra_tpu.data.genotypes import Dataset, GenotypeData
    geno = GenotypeData.from_packed(pk, ds.geno.n,
                                    np.array([], dtype=np.int64))
    ds2 = Dataset(geno=geno, y=ds.y, groups=ds.groups,
                  num_groups=ds.num_groups, mS=ds.mS)
    _compare(ds2, window=32, seed=3, schedule="block")


def test_block_schedule_differs_from_marker_but_recovers():
    """The two schedules are different (valid) chains over the same
    posterior: same setup-permuted slot layout question — sanity that the
    block chain moves and keeps finite state."""
    ds, _, _ = simulate(m=192, n=400, h2=0.5, seed=5)
    sb = BayesRRm(ds, window=32, exact=False, seed=7, mesh=make_mesh(1),
                  schedule="block")
    assert sb.cfg.schedule == "block"
    # slot layout is permuted, and slot_to_marker still covers every marker
    assert not np.array_equal(sb.slot_to_marker, np.arange(192))
    assert set(sb.slot_to_marker.tolist()) >= set(range(192))
    st = sb.init_state()
    for it in range(3):
        st, _ = sb.step(st, it)
    assert np.isfinite(np.asarray(st.eps)).all()
    assert float(np.asarray(st.sigma_g).sum()) > 0


def test_block_schedule_exact_is_honored_and_matches_window_path():
    """Explicit exact + block: the chain stays EXACT sequential Gibbs on
    the composite schedule (window-width invariance is waived, chain
    equality between mega and per-window paths is not)."""
    ds, _, _ = simulate(m=128, n=300, h2=0.5, seed=5)
    s = BayesRRm(ds, window=32, exact=True, seed=7, mesh=make_mesh(1),
                 schedule="block")
    assert s.cfg.schedule == "block"

    ref = BayesRRm(ds, window=32, exact=True, seed=7, mesh=make_mesh(1),
                   schedule="block")
    mega = BayesRRm(ds, window=32, exact=True, seed=7, mesh=make_mesh(1),
                    schedule="block")
    mega.cfg = dataclasses.replace(mega.cfg, use_mega=True, interpret=True)
    mega._step = mega._build_step()
    mega._multi = {}
    assert not ref.cfg.use_mega
    sr = ref.init_state()
    sm = mega.init_state()
    for it in range(3):
        sr, _ = ref.step(sr, it)
        sm, _ = mega.step(sm, it)
    _states_close(sr, sm)


def test_block_schedule_auto_stays_marker_for_exact():
    ds, _, _ = simulate(m=128, n=300, h2=0.5, seed=5)
    s = BayesRRm(ds, window=32, exact=True, seed=7, mesh=make_mesh(1),
                 schedule="auto")
    assert s.cfg.schedule == "marker"
