"""run_steps (fused k-sweep dispatch) must be chain-identical to k step()
calls for every sampler — the scan carries the iteration number, so every
per-(seed, iteration, slot) RNG key matches the one-step path bitwise.
"""

import numpy as np
import jax

from hydra_tpu.parallel.mesh import make_mesh
from hydra_tpu.samplers.bayesrrm import BayesRRm
from hydra_tpu.samplers.bayesw import BayesW
from hydra_tpu.samplers.bayesrrm_mt import BayesRRmMT

from tests.test_bayesrrm import simulate
from tests.test_bayesw import simulate_weibull
from tests.test_bayesrrm_mt import simulate_mt


def _assert_states_equal(a, b):
    fa, _ = jax.tree.flatten(a)
    fb, _ = jax.tree.flatten(b)
    for xa, xb in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))


def test_run_steps_matches_step_bayesrrm():
    ds, _, _ = simulate(m=64, n=200, h2=0.5, seed=17)
    s = BayesRRm(ds, window=8, seed=101, mesh=make_mesh(4))
    st_seq = s.init_state()
    for it in range(1, 6):
        st_seq, last_stats = s.step(st_seq, it)
    st_fused, stats = s.run_steps(s.init_state(), 1, 5)
    _assert_states_equal(st_seq, st_fused)
    # stacked stats: last row equals the final step's stats
    np.testing.assert_array_equal(np.asarray(stats.cass)[-1],
                                  np.asarray(last_stats.cass))


def test_run_steps_matches_step_bayesw():
    ds, _, _, _ = simulate_weibull(m=48, n=300, seed=23)
    s = BayesW(ds, window=4, seed=77, mesh=make_mesh(2), quad_points=7)
    st_seq = s.init_state()
    for it in range(1, 4):
        st_seq, _ = s.step(st_seq, it)
    st_fused, _ = s.run_steps(s.init_state(), 1, 3)
    _assert_states_equal(st_seq, st_fused)


def test_run_steps_matches_step_mt():
    ds, phenos, _ = simulate_mt(m=48, n=200, n_traits=2, seed=29)
    s = BayesRRmMT(ds, phenos, window=4, seed=55, mesh=make_mesh(2))
    st_seq = s.init_state()
    for it in range(1, 4):
        st_seq, _ = s.step(st_seq, it)
    st_fused, _ = s.run_steps(s.init_state(), 1, 3)
    _assert_states_equal(st_seq, st_fused)
