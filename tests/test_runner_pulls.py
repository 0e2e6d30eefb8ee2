"""Runner thin/save/log boundary coverage (ADVICE r4).

The runners batch every device->host pull at a boundary into ONE dict
(`pulls`) fed to `_fetch_host`; a later edit that reads `h["key"]` in some
branch without adding the key to `pulls` only fails AT RUNTIME on that
boundary combination. These chains are sized so `_iter_blocks` hits every
combination — thin+log (it=0), thin-only (3, 9), thin+save (6, 12), LOG-ONLY
(10, the branch that pulls just the telemetry keys) and the final iteration
— for all four runner paths (BayesRRm, FH, BayesW incl. covariates, mt).
A missing key raises KeyError; the writer outputs must also parse.
"""

import os

import numpy as np
import pytest

from hydra_tpu import postproc
from hydra_tpu.options import parse_args

CHAIN = ["--chain-length", "13", "--thin", "3", "--save", "6", "--seed", "3",
         "--S", "0.01,0.1"]
M, N = 24, 60


@pytest.fixture()
def panel(tmp_path):
    from tests.conftest import make_synthetic_bed

    base, _ = make_synthetic_bed(tmp_path, M, N, seed=21, missing_rate=0.05)
    rs = np.random.RandomState(2)
    with open(base + ".phen", "w") as fh:
        for i in range(N):
            fh.write(f"per{i} per{i} {rs.randn():.5f}\n")
    with open(base + ".fail", "w") as fh:
        for i in range(N):
            fh.write(f"{int(rs.random() < 0.8)}\n")
    with open(base + ".cov", "w") as fh:
        for i in range(N):
            fh.write(f"per{i} per{i} {rs.randn():.4f}\n")
    with open(base + ".phen2", "w") as fh:
        for i in range(N):
            fh.write(f"per{i} per{i} {rs.randn():.5f}\n")
    return base


def _opt(base, out, bayes, extra=()):
    argv = ["--mpibayes", bayes, "--bfile", base, "--pheno", base + ".phen",
            "--mcmc-out-dir", str(out), "--mcmc-out-name", "pp",
            *CHAIN, *extra]
    return parse_args(argv)


def _check_outputs(out, suffix="", survival=False):
    csv = os.path.join(str(out), f"pp{suffix}.csv")
    rows = [r for r in open(csv).read().splitlines() if r]
    assert [int(r.split(",")[0]) for r in rows] == [0, 3, 6, 9, 12]
    bet = list(postproc._read_records(
        os.path.join(str(out), f"pp{suffix}.bet"), np.float64))
    assert [it for it, _ in bet] == [0, 3, 6, 9, 12]
    assert all(len(v) == M for _, v in bet)


def test_bayesrrm_all_boundaries(panel, tmp_path):
    from hydra_tpu.runner import run_bayesrrm

    out = tmp_path / "o1"
    run_bayesrrm(_opt(panel, out, "bayesMPI"), verbose=True)
    _check_outputs(out)


def test_bayesfh_all_boundaries(panel, tmp_path):
    from hydra_tpu.runner import run_bayesrrm

    out = tmp_path / "o2"
    run_bayesrrm(_opt(panel, out, "bayesFHMPI"), verbose=True)
    _check_outputs(out)
    assert os.path.exists(str(out / "pp.fh.npz"))


def test_bayesw_cov_all_boundaries(panel, tmp_path):
    from hydra_tpu.runner_bayesw import run_bayesw

    out = tmp_path / "o3"
    run_bayesw(_opt(panel, out, "bayesWMPI",
                    extra=["--failure", panel + ".fail",
                           "--covariates", panel + ".cov"]), verbose=True)
    _check_outputs(out, survival=True)
    assert os.path.exists(str(out / "pp.gam"))


def test_mt_all_boundaries(panel, tmp_path):
    from hydra_tpu.runner import run_bayesrrm_mt

    out = tmp_path / "o4"
    opt = _opt(panel, out, "bayesMPI")
    opt.phenotype_files = [panel + ".phen", panel + ".phen2"]
    opt.multi_phen = True
    run_bayesrrm_mt(opt, verbose=True)
    for t in (0, 1):
        _check_outputs(out, suffix=f".t{t}")
