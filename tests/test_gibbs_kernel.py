"""Pallas window-Gibbs kernel parity vs the scan implementation (interpret
mode on CPU; the same kernel runs compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from hydra_tpu.ops.gibbs_kernel import window_gibbs


def _scan_ref(gram, num0, logl, invd, sdk, u, nrm, act, bold, i2se):
    W, K = logl.shape
    km1 = K - 1

    def step(dbeta, j):
        num = num0[j] + jnp.dot(gram[j], dbeta)
        muk = num * invd[j]
        logL = jnp.concatenate([logl[j, :1], logl[j, 1:] + muk * num * i2se])
        pr = jnp.exp(jnp.maximum(logL - jnp.max(logL), -60.0))
        probs = pr / jnp.sum(pr)
        cum = jnp.cumsum(probs)
        comp = jnp.minimum(jnp.sum((u[j] > cum).astype(jnp.int32)), km1)
        ksel = jnp.maximum(comp - 1, 0)
        bn = jnp.where((comp > 0) & (act[j] > 0),
                       muk[ksel] + nrm[j] * sdk[j, ksel], 0.0)
        comp = jnp.where(act[j] > 0, comp, 0)
        acum0 = jnp.where(act[j] > 0, probs[0], 1.0)
        dbeta = dbeta.at[j].set(bold[j] - bn)
        return dbeta, (bn, comp, acum0)

    dbeta, (bn, comp, ac) = jax.lax.scan(step, jnp.zeros(W, jnp.float32),
                                         jnp.arange(W))
    return dbeta, bn, comp, ac


def test_kernel_matches_scan():
    W, K = 128, 4
    km1 = K - 1
    rs = np.random.RandomState(0)
    xt = rs.randn(W, 512).astype(np.float32) / 20
    gram = jnp.asarray(xt @ xt.T)
    num0 = jnp.asarray((rs.randn(W) * 4).astype(np.float32))
    logl = jnp.asarray(np.log(np.full((W, K), 0.25, np.float32)))
    invd = jnp.asarray((np.full((W, km1), 1 / 300.0)
                        * np.array([1.0, 2.0, 3.0])).astype(np.float32))
    sdk = jnp.sqrt(0.5 * invd)
    u = jnp.asarray(rs.rand(W).astype(np.float32))
    nrm = jnp.asarray(rs.randn(W).astype(np.float32))
    act = jnp.asarray((rs.rand(W) > 0.1).astype(np.float32))
    bold = jnp.asarray((rs.randn(W) * 0.02).astype(np.float32))

    args = (gram, num0, logl, invd, sdk, u, nrm, act, bold, 1.0)
    r_scan = _scan_ref(*args)
    r_ker = window_gibbs(*args, interpret=True)
    np.testing.assert_array_equal(np.asarray(r_scan[2]), np.asarray(r_ker[2]))
    np.testing.assert_allclose(np.asarray(r_scan[0]), np.asarray(r_ker[0]),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(r_scan[1]), np.asarray(r_ker[1]),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(r_scan[3]), np.asarray(r_ker[3]),
                               atol=2e-5)
    # make sure inactive lanes stayed at the spike
    inact = np.asarray(act) == 0
    assert np.all(np.asarray(r_ker[2])[inact] == 0)
    assert np.all(np.asarray(r_ker[1])[inact] == 0)
