"""Option parsing / validation rules, incl. the TPU-fast faithful defaults.

Exact mode is window-invariant (test_bayesrrm.py::
test_exact_mode_is_exact_across_shards), so the default CLI run must take
the fused Pallas path (window >= 8) instead of a per-marker scan; BayesW
stale windows > 64 are measurably biased (BIAS_SWEEP_BW.md) and must warn.
"""

from hydra_tpu.options import parse_args


def test_exact_default_window_is_64(capsys):
    opt = parse_args(["--mpibayes", "bayesMPI", "--bfile", "x",
                      "--pheno", "x.phen"])
    assert opt.exact and opt.sync_rate == 1
    assert opt.window == 64
    assert "window=64" in capsys.readouterr().out


def test_exact_explicit_window_respected():
    opt = parse_args(["--mpibayes", "bayesMPI", "--bfile", "x",
                      "--pheno", "x.phen", "--window", "16"])
    assert opt.window == 16


def test_stale_window_follows_sync_rate():
    opt = parse_args(["--mpibayes", "bayesMPI", "--bfile", "x",
                      "--pheno", "x.phen", "--stale", "--sync-rate", "32"])
    assert not opt.exact
    assert opt.window == 32


def test_bayesw_default_window_follows_sync_rate():
    # BayesW has no exact Gram mode and its windows are NOT invariant
    # (BIAS_SWEEP_BW.md) — the default stays tied to --sync-rate.
    opt = parse_args(["--mpibayes", "bayesWMPI", "--bfile", "x",
                      "--pheno", "x.phen", "--failure", "x.fail",
                      "--sync-rate", "8"])
    assert opt.window == 8


def test_bayesw_wide_window_warns(capsys):
    opt = parse_args(["--mpibayes", "bayesWMPI", "--bfile", "x",
                      "--pheno", "x.phen", "--failure", "x.fail",
                      "--window", "256"])
    assert opt.window == 256          # warned, not clamped
    assert "BIAS_SWEEP_BW" in capsys.readouterr().out


def test_bayesw_window_64_no_warning(capsys):
    parse_args(["--mpibayes", "bayesWMPI", "--bfile", "x",
                "--pheno", "x.phen", "--failure", "x.fail",
                "--window", "64"])
    assert "BIAS_SWEEP_BW" not in capsys.readouterr().out


def test_cache_planes_auto_is_alias_of_off():
    opt = parse_args(["--mpibayes", "bayesMPI", "--bfile", "x",
                      "--pheno", "x.phen", "--cache-planes", "auto"])
    assert opt.plane_cache == "auto"   # accepted; behaviorally == off
    opt2 = parse_args(["--mpibayes", "bayesMPI", "--bfile", "x",
                       "--pheno", "x.phen"])
    assert opt2.plane_cache == "off"
