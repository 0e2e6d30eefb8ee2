"""Distribution sampler moment tests (replacing Distributions_boost)."""

import jax
import jax.numpy as jnp
import numpy as np

from hydra_tpu.utils import dist

N = 200_000


def _key(i=0):
    return jax.random.key(i)


def test_norm_rng_moments():
    x = np.asarray(dist.norm_rng(_key(1), 2.0, 9.0, (N,)))
    assert abs(x.mean() - 2.0) < 0.05
    assert abs(x.var() - 9.0) < 0.15


def test_gamma_scale_and_rate():
    x = np.asarray(dist.gamma_rng(_key(2), 3.0, 2.0, (N,)))
    assert abs(x.mean() - 6.0) < 0.1          # shape*scale
    y = np.asarray(dist.gamma_rate_rng(_key(3), 3.0, 2.0, (N,)))
    assert abs(y.mean() - 1.5) < 0.05         # shape/rate


def test_inv_gamma():
    # E[1/Gamma(shape, scale=1/scale_param)] -> InvGamma mean = scale/(shape-1)
    x = np.asarray(dist.inv_gamma_rng(_key(4), 4.0, 6.0, (N,)))
    assert abs(x.mean() - 2.0) < 0.05


def test_inv_scaled_chisq():
    # InvScaledChi2(dof, s): mean = dof*s/(dof-2)
    dof, s = 10.0, 0.5
    x = np.asarray(dist.inv_scaled_chisq_rng(_key(5), dof, s, (N,)))
    assert abs(x.mean() - dof * s / (dof - 2.0)) < 0.02


def test_beta_rng():
    x = np.asarray(dist.beta_rng(_key(6), 2.0, 5.0, (N,)))
    assert abs(x.mean() - 2.0 / 7.0) < 0.01


def test_dirichlet_rows():
    alpha = jnp.array([[1.0, 2.0, 3.0], [5.0, 1.0, 1.0]])
    x = np.asarray(dist.dirichlet_rng(_key(7), alpha))
    assert x.shape == (2, 3)
    np.testing.assert_allclose(x.sum(axis=1), 1.0, rtol=1e-6)
    big = np.asarray(
        jax.vmap(lambda k: dist.dirichlet_rng(k, jnp.array([1.0, 2.0, 3.0])))(
            jax.random.split(_key(8), 20000)
        )
    )
    np.testing.assert_allclose(big.mean(axis=0), [1 / 6, 2 / 6, 3 / 6], atol=0.01)
