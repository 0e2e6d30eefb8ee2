"""Distributional validation of the slice sampler (the ARS/ARMS replacement).

The reference trusts Gilks' ARMS (BayesW_arms.cpp) for the four log-concave
BayesW conditionals; the rebuild uses fixed-budget slice sampling
(utils/slice_sampler.py) whose stationary law must be the target density for
ANY width. These tests draw many independent chains from dispersed inits and
KS-compare the pooled end states against ground-truth CDFs — closed-form for
normal/gamma, grid-integrated for the actual BayesW mu/alpha conditionals.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hydra_tpu.utils.slice_sampler import slice_sample

B = 4096          # independent chains
N_TRANS = 60      # transitions from a dispersed init
KS_TOL = 0.035    # D_n at n=4096: 1% critical value is 0.025; slack for
                  # residual autocorrelation of the last transition


def _chain_samples(logf, x0, width, lower=-jnp.inf, upper=jnp.inf, seed=0):
    key = jax.random.key(seed)

    def body(i, x):
        return slice_sample(logf, x, jax.random.fold_in(key, i), width,
                            lower=lower, upper=upper)

    x = jax.lax.fori_loop(0, N_TRANS, body, x0)
    return np.asarray(x)


def _ks(samples, cdf):
    s = np.sort(samples)
    n = len(s)
    emp_hi = np.arange(1, n + 1) / n
    emp_lo = np.arange(0, n) / n
    c = cdf(s)
    return max(np.abs(emp_hi - c).max(), np.abs(emp_lo - c).max())


def test_slice_normal():
    mu, sd = 2.0, 0.5

    def logf(x):
        return -0.5 * ((x - mu) / sd) ** 2

    x0 = jnp.linspace(-3.0, 7.0, B)      # deliberately over-dispersed
    s = _chain_samples(logf, x0, width=0.3, seed=1)
    from math import erf, sqrt
    cdf = np.vectorize(lambda v: 0.5 * (1 + erf((v - mu) / (sd * sqrt(2)))))
    d = _ks(s, cdf)
    assert d < KS_TOL, f"KS={d}"


def test_slice_gamma():
    k, theta = 3.0, 2.0

    def logf(x):
        xs = jnp.maximum(x, 1e-9)
        return (k - 1) * jnp.log(xs) - xs / theta

    x0 = jnp.linspace(0.2, 30.0, B)
    s = _chain_samples(logf, x0, width=1.5, lower=jnp.float32(0.0), seed=2)
    from jax.scipy.special import gammainc
    cdf = lambda v: np.asarray(gammainc(k, jnp.asarray(v) / theta))
    d = _ks(s, cdf)
    assert d < KS_TOL, f"KS={d}"


def _grid_cdf(logf_np, lo, hi, n=20001):
    """Ground-truth CDF by dense trapezoid integration of the density."""
    g = np.linspace(lo, hi, n)
    lf = logf_np(g)
    p = np.exp(lf - lf.max())
    c = np.concatenate([[0.0], np.cumsum((p[1:] + p[:-1]) * 0.5 * np.diff(g))])
    c /= c[-1]
    return lambda v: np.interp(v, g, c)


@pytest.mark.slow
def test_slice_bayesw_mu_density():
    """The actual mu conditional (mu_dens, BayesW.cpp:77-88) with synthetic
    residuals: KS of the slice chain vs the grid-integrated truth."""
    rs = np.random.RandomState(7)
    n, alpha, mu_true = 400, 8.0, 4.0
    eps = np.log(rs.exponential(1.0, n)) / alpha + 0.5772156649 / alpha
    d_events = float(n)  # all events observed
    w0 = float(np.sum(np.exp(alpha * eps - 0.5772156649)))
    sigma_mu = 100.0

    def logf(x):
        return (-alpha * d_events * x
                - w0 * jnp.expm1(-alpha * x)
                - x * x / (2.0 * sigma_mu))

    def logf_np(x):
        return (-alpha * d_events * x
                - w0 * np.expm1(-alpha * x)
                - x * x / (2.0 * sigma_mu))

    # conditional concentrates near 0 (the residual already removed mu)
    x0 = jnp.linspace(-0.2, 0.2, B)
    width = 2.0 / (alpha * np.sqrt(n))   # the sampler's own scale rule
    s = _chain_samples(logf, x0, width=width, seed=3)
    cdf = _grid_cdf(logf_np, -0.5, 0.5)
    d = _ks(s, cdf)
    assert d < KS_TOL, f"KS={d}"


@pytest.mark.slow
def test_slice_bayesw_alpha_density():
    """The Weibull-shape conditional (alpha_dens, BayesW.cpp:132-142)."""
    rs = np.random.RandomState(8)
    n, alpha0 = 300, 10.0
    eps = np.log(rs.exponential(1.0, n)) / alpha0 + 0.5772156649 / alpha0
    d_events = float(n)
    vi = np.exp(alpha0 * eps - 0.5772156649)
    c_lin = float(np.sum(eps)) - 1.0   # kappa_0 = 1
    a0 = 0.01
    eps_j = jnp.asarray(eps, jnp.float32)
    vi_j = jnp.asarray(vi, jnp.float32)

    def logf(x):
        dx = x[:, None] - alpha0
        return ((a0 + d_events - 1.0) * (jnp.log(jnp.maximum(x, 1e-9)) - np.log(alpha0))
                + (x - alpha0) * c_lin
                - jnp.sum(vi_j[None, :] * jnp.expm1(eps_j[None, :] * dx), axis=1))

    def logf_np(x):
        dx = x[:, None] - alpha0
        return ((a0 + d_events - 1.0) * (np.log(np.maximum(x, 1e-9)) - np.log(alpha0))
                + (x - alpha0) * c_lin
                - np.sum(vi[None, :] * np.expm1(eps[None, :] * dx), axis=1))

    x0 = jnp.linspace(7.0, 14.0, B)
    width = 1.6 * alpha0 / np.sqrt(n)
    s = _chain_samples(logf, x0, width=width, lower=jnp.float32(1e-6), seed=4)
    cdf = _grid_cdf(logf_np, 5.0, 20.0, n=8001)
    d = _ks(s, cdf)
    assert d < KS_TOL, f"KS={d}"
