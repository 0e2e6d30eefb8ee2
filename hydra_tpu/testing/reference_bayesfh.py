"""Slow NumPy golden model of one BayesFH (Finnish horseshoe) Gibbs sweep.

Independent sequential transcription of the reference's bayesFHMPI branches
inside BayesRRm::runMpiGibbs: per-marker nu draw + lambda_tilde shrinkage
(BayesRRm.cpp:1725-1739), the FH denom/logL overrides (:1747-1751,
:1869-1872), the post-beta local-variance draw (:1952), the global
hypTau/tau/c_slab chain and sigmaG := beta_squaredNorm (:2557-2565), and
scaledBSQN = sum beta_i^2 / lambda_i (:2505-2508). Non-FH parts (mu, pi,
sigmaE) follow reference_bayesrrm.py.

Every draw uses NumPy RNG directly (inv-gamma-rate X = rate/Gamma(shape);
inv-scaled-chi^2 X = dof*scale/2 / Gamma(dof/2)) — independent of
hydra_tpu's jax.random streams; agreement is posterior-level.
"""

from __future__ import annotations

import numpy as np


def inv_gamma_rate(rng, shape, rate):
    return rate / rng.gamma(shape)


def inv_scaled_chisq(rng, dof, scale):
    return (0.5 * dof * scale) / rng.gamma(0.5 * dof)


def init_fh(rng, num_groups, m_tot, tau0=1.0, v0t=3.0, v0c=3.0, s02c=1.0):
    """FH initialisation (BayesRRm.cpp:1125-1163)."""
    hyp_tau = inv_gamma_rate(rng, 0.5, 1.0 / (tau0 * tau0))
    tau = inv_gamma_rate(rng, 0.5 * v0t, v0t / hyp_tau)
    c_slab = np.array([inv_scaled_chisq(rng, v0c, s02c)
                       for _ in range(num_groups)])
    lam = np.full(m_tot, c_slab.sum() / m_tot)
    return dict(hyp_tau=hyp_tau, tau=tau, c_slab=c_slab, lam=lam)


def sweep(
    xt: np.ndarray,        # (M, N) standardized genotypes
    y_eps: np.ndarray,     # (N,) residual
    beta: np.ndarray,      # (M,)
    groups: np.ndarray,    # (M,)
    est_pi: np.ndarray,    # (G, K)
    sigma_e: float,
    mu: float,
    fh: dict,              # hyp_tau, tau, c_slab (G,), lam (M,)
    rng: np.random.RandomState,
    v0L: float = 3.0, v0t: float = 3.0, v0c: float = 3.0,
    s02c: float = 1.0, tau0: float = 1.0,
    v0e: float = 1e-4, s02e: float = 1e-4,
):
    m, n = xt.shape
    G, K = est_pi.shape
    dN, dNm1 = float(n), float(n - 1)
    eps = y_eps.copy()
    beta = beta.copy()
    lam = fh["lam"].copy()
    nu = np.zeros(m)
    tau, hyp_tau = fh["tau"], fh["hyp_tau"]
    c_slab = fh["c_slab"].copy()

    eps += mu
    mu = rng.normal(eps.sum() / dN, np.sqrt(sigma_e / dN))
    eps -= mu

    comps = np.zeros(m, dtype=int)
    i2se = 0.5 / sigma_e
    for j in range(m):
        g = groups[j]
        b_old = beta[j]
        # nu draw + shrinkage (BayesRRm.cpp:1729-1730)
        nu[j] = inv_gamma_rate(rng, 0.5 + 0.5 * v0L, v0L / lam[j] + 1.0)
        lam_t = tau * c_slab[g] / (tau + c_slab[g] * lam[j])
        num = xt[j] @ eps + b_old * dNm1
        denom = dNm1 + sigma_e / lam_t               # same for every k
        muk = num / denom
        km1 = K - 1
        logL = np.concatenate([
            [np.log(est_pi[g, 0])],
            np.log(est_pi[g, 1:])
            - 0.5 * np.log((lam_t / sigma_e) * dNm1 + 1.0)
            + muk * num * i2se * np.ones(km1),
        ])
        pr = np.exp(logL - logL.max())
        pr /= pr.sum()
        u = rng.uniform()
        comp = min(int(np.searchsorted(np.cumsum(pr), u)), K - 1)
        if comp == 0:
            b_new = 0.0
        else:
            b_new = rng.normal(muk, np.sqrt(sigma_e / denom))
        comps[j] = comp
        eps += (b_old - b_new) * xt[j]
        beta[j] = b_new
        # post-beta local variance (BayesRRm.cpp:1952)
        lam[j] = inv_gamma_rate(rng, 0.5 + 0.5 * v0L,
                                0.5 * b_new * b_new / tau + v0L / nu[j])

    cass = np.zeros((G, K))
    bsqn = np.zeros(G)
    for j in range(m):
        cass[groups[j], comps[j]] += 1
        bsqn[groups[j]] += beta[j] ** 2
    scaled_bsqn = float(np.sum(beta * beta / lam))   # :2505-2508

    sigma_g = np.zeros(G)
    for g in range(G):
        m0 = cass[g].sum() - cass[g, 0]
        if m0 > 0:
            # sequential per-group global chain (BayesRRm.cpp:2557-2565)
            hyp_tau = inv_gamma_rate(rng, 0.5 + 0.5 * v0t,
                                     1.0 / (tau0 * tau0) + 1.0 / tau)
            tau = inv_gamma_rate(rng, 0.5 * (m0 + v0t),
                                 v0t / hyp_tau + 0.5 * scaled_bsqn)
            c_slab[g] = inv_scaled_chisq(
                rng, v0c + m0, (bsqn[g] * m0 + v0c * s02c) / (v0c + m0))
            sigma_g[g] = bsqn[g]                     # :2565
            draw = rng.gamma(cass[g] + 1.0)
            est_pi[g] = draw / draw.sum()

    e_sqn = eps @ eps
    dof = v0e + dN
    sigma_e = (0.5 * dof * ((e_sqn + v0e * s02e) / dof)) / rng.gamma(0.5 * dof)
    return dict(eps=eps, beta=beta, comps=comps, mu=mu, sigma_g=sigma_g,
                sigma_e=sigma_e, est_pi=est_pi, cass=cass, bsqn=bsqn,
                fh=dict(hyp_tau=hyp_tau, tau=tau, c_slab=c_slab, lam=lam))
