"""Postproc converter + compression tests."""

import io
import os
import subprocess
import sys

import numpy as np

from hydra_tpu import postproc
from hydra_tpu.utils.compression import compress_doubles, decompress_doubles


def _write_bet(path, m, records):
    with open(path, "wb") as fh:
        fh.write(np.asarray([m], np.uint32).tobytes())
        for it, vals in records:
            fh.write(np.asarray([it], np.uint32).tobytes())
            fh.write(np.asarray(vals, np.float64).tobytes())


def test_beta_convert_and_extract(tmp_path):
    m = 5
    recs = [(0, [0.0, 1.5, 0.0, -2.25, 0.0]), (5, [0.125, 0.0, 0.0, 0.0, 3.0])]
    p = str(tmp_path / "x.bet")
    _write_bet(p, m, recs)
    buf = io.StringIO()
    postproc.beta_convert(p, 1, out=buf)
    lines = buf.getvalue().strip().split("\n")
    assert len(lines) == 10
    assert "1.5" in lines[1]
    buf = io.StringIO()
    postproc.extract_nonzero(p, 0, 1, np.float64, out=buf)
    rows = [l.split() for l in buf.getvalue().strip().split("\n")]
    assert len(rows) == 4  # 2 + 2 nonzero
    assert rows[0][:2] == ["0", "1"]


def test_beta_check(tmp_path):
    recs = [(0, [1.0, 2.0]), (5, [3.0, 4.0])]
    a, b = str(tmp_path / "a.bet"), str(tmp_path / "b.bet")
    _write_bet(a, 2, recs)
    _write_bet(b, 2, recs)
    assert postproc.beta_check(a, b) == 0
    _write_bet(b, 2, [(0, [1.0, 2.0]), (5, [3.0, 4.5])])
    assert postproc.beta_check(a, b) == 1


def test_combine_csv(tmp_path):
    p1 = tmp_path / "a.csv"
    p2 = tmp_path / "b.csv"
    p1.write_text("0, 1.0\n5, 2.0\n10, 3.0\n")
    p2.write_text("10, 3.5\n15, 4.0\n")
    out = str(tmp_path / "c.csv")
    postproc.combine_csv(out, [str(p1), str(p2)])
    rows = open(out).read().strip().split("\n")
    assert [int(r.split(",")[0]) for r in rows] == [0, 5, 10, 15]
    assert rows[2] == "10, 3.0"  # first file wins for duplicates


def test_postproc_cli_runs_on_real_output(tmp_path):
    """Drive the module CLI on a real sampler .bet file."""
    from tests.conftest import make_synthetic_bed
    base, _ = make_synthetic_bed(tmp_path, 10, 40, seed=2)
    with open(base + ".phen", "w") as fh:
        rs = np.random.RandomState(0)
        for i in range(40):
            fh.write(f"per{i} per{i} {rs.randn():.5f}\n")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    out = str(tmp_path / "o")
    subprocess.run([sys.executable, "-m", "hydra_tpu.cli", "--mpibayes",
                    "bayesMPI", "--bfile", base, "--pheno", base + ".phen",
                    "--mcmc-out-dir", out, "--mcmc-out-name", "pp",
                    "--chain-length", "4", "--thin", "2", "--save", "2",
                    "--seed", "1", "--S", "0.01,0.1"],
                   check=True, env=env, capture_output=True, timeout=600)
    r = subprocess.run([sys.executable, "-m", "hydra_tpu.postproc",
                        "beta-convert", os.path.join(out, "pp.bet"), "1"],
                       check=True, env=env, capture_output=True, text=True)
    assert len(r.stdout.strip().split("\n")) == 20


def test_compression_roundtrip():
    x = np.random.RandomState(3).randn(1000)
    blob = compress_doubles(x)
    assert len(blob) < 8000
    y = decompress_doubles(blob, 1000)
    np.testing.assert_array_equal(x, y)
