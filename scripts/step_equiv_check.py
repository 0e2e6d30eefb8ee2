"""On-hardware pallas-vs-XLA one-step equivalence check (run each round).

Complements scripts/kernel_check.py: instead of checking each kernel in
isolation, this runs the FULL BayesRRm sweep twice on the live backend —
once with the fused Pallas kernels, once on the XLA decode path — and
asserts the chains agree to f32 tolerance for both stale and exact modes.
One bad kernel integration (layout, vma, fast-path gating) fails here even
if every kernel passes its unit check.

Usage: python scripts/step_equiv_check.py   (needs a TPU backend)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
import numpy as np
import jax, jax.numpy as jnp
from test_bayesrrm import simulate
from hydra_tpu.parallel.mesh import make_mesh
from hydra_tpu.samplers.bayesrrm import BayesRRm

ds, _, _ = simulate(m=256, n=1000, h2=0.5, seed=3)
mesh = make_mesh(1)
sp = BayesRRm(ds, window=32, exact=False, seed=9, mesh=mesh)
assert sp.cfg.use_pallas, "pallas not enabled (not TPU?)"
sx = BayesRRm(ds, window=32, exact=False, seed=9, mesh=mesh)
object.__setattr__(sx.cfg, 'use_pallas', False)
sx._step = sx._build_step()
st_p = sp.init_state(); st_x = sx.init_state()
for it in range(1, 4):
    st_p, _ = sp.step(st_p, it)
    st_x, _ = sx.step(st_x, it)
for name in ("eps", "beta", "sigma_e", "sigma_g"):
    a, b = np.asarray(getattr(st_p, name)), np.asarray(getattr(st_x, name))
    d = np.max(np.abs(a - b)) / max(1e-9, np.max(np.abs(b)))
    print(f"{name:8s} rel-diff = {d:.2e}")
    assert d < 5e-5, name
# exact mode too
se_p = BayesRRm(ds, window=32, exact=True, seed=9, mesh=mesh)
se_x = BayesRRm(ds, window=32, exact=True, seed=9, mesh=mesh)
object.__setattr__(se_x.cfg, 'use_pallas', False)
se_x._step = se_x._build_step()
st_p = se_p.init_state(); st_x = se_x.init_state()
for it in range(1, 4):
    st_p, _ = se_p.step(st_p, it)
    st_x, _ = se_x.step(st_x, it)
for name in ("eps", "beta"):
    a, b = np.asarray(getattr(st_p, name)), np.asarray(getattr(st_x, name))
    d = np.max(np.abs(a - b)) / max(1e-9, np.max(np.abs(b)))
    print(f"exact {name:8s} rel-diff = {d:.2e}")
print("OK")
