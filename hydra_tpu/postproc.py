"""Post-processing tools — equivalents of the reference's postproc/ binaries.

One Python CLI replaces the seven small C++/shell tools (postproc/*.cpp,
extractBeta.sh, extractCpn.sh, combineCSV.sh). Output formats match so
downstream R analysis (example/plot_example.R, postproc/postproc.R) keeps
working:

  beta-convert  <file.bet> <niter>                 (beta_converter.cpp:17-60)
  cpn-convert   <file.cpn> <niter>                 (components_converter.cpp)
  eps-convert   <file.eps.0>                       (epsilon_converter.cpp)
  extract-beta  <file.bet> <min_it> <max_it>       (extract_non_zero_betaAll.cpp)
  extract-cpn   <file.cpn> <min_it> <max_it>       (extract_non_zero_cpnAll.cpp)
  beta-check    <a.bet> <b.bet>                    (beta_checker.cpp)
  combine-csv   <out.csv> <in1.csv> [in2.csv ...]  (combineCSV.sh)

Usage: python -m hydra_tpu.postproc <command> [args]
"""

from __future__ import annotations

import sys

import numpy as np


def _read_records(path: str, dtype):
    """Yield (iteration, values) from a .bet/.cpn-layout file."""
    itemsize = np.dtype(dtype).itemsize
    with open(path, "rb") as fh:
        m = int(np.frombuffer(fh.read(4), dtype=np.uint32)[0])
        rec = 4 + m * itemsize
        while True:
            raw = fh.read(rec)
            if len(raw) < rec:
                break
            it = int(np.frombuffer(raw[:4], dtype=np.uint32)[0])
            vals = np.frombuffer(raw[4:], dtype=dtype)
            yield it, vals


def beta_convert(path: str, niter: int, out=sys.stdout):
    """Emit records 0..niter INCLUSIVE — the reference's own loop is
    `for (iter=0; iter<=niter; ++iter)` (postproc/beta_converter.cpp:41)."""
    for i, (it, vals) in enumerate(_read_records(path, np.float64)):
        if i > niter:
            break
        for marker, b in enumerate(vals):
            out.write(f"{it:5d}/{marker:7d} = {b:20.12f}\n")


def cpn_convert(path: str, niter: int, out=sys.stdout):
    for i, (it, vals) in enumerate(_read_records(path, np.int32)):
        if i > niter:
            break
        for marker, c in enumerate(vals):
            out.write(f"{it:5d}/{marker:7d} = {c:3d}\n")


def eps_convert(path: str, out=sys.stdout):
    with open(path, "rb") as fh:
        it, n = np.frombuffer(fh.read(8), dtype=np.uint32)
        eps = np.frombuffer(fh.read(), dtype=np.float64, count=n)
    out.write(f"iteration {it}, N = {n}\n")
    for i, e in enumerate(eps):
        out.write(f"{i:7d} = {e:20.12f}\n")


def extract_nonzero(path: str, min_rec: int, max_rec: int, dtype,
                    out=sys.stdout):
    """Long-format (record, marker, value) rows for non-zero entries."""
    fmt = "{:7d} {:7d} {:20.12f}\n" if dtype == np.float64 else "{:7d} {:7d} {:3d}\n"
    for i, (it, vals) in enumerate(_read_records(path, dtype)):
        if i < min_rec or i > max_rec:
            continue
        nz = np.nonzero(np.abs(vals) > 1e-17)[0] if dtype == np.float64 \
            else np.nonzero(vals)[0]
        for marker in nz:
            out.write(fmt.format(i, int(marker), vals[marker]))


def beta_check(a: str, b: str) -> int:
    """Compare two .bet files; returns count of mismatches (beta_checker.cpp)."""
    ra = list(_read_records(a, np.float64))
    rb = list(_read_records(b, np.float64))
    bad = 0
    for (ia, va), (ib, vb) in zip(ra, rb):
        if ia != ib or not np.allclose(va, vb, atol=1e-12):
            bad += 1
            print(f"MISMATCH at record it {ia} vs {ib}: "
                  f"max |d| = {np.max(np.abs(va - vb)) if len(va) == len(vb) else 'shape'}")
    if len(ra) != len(rb):
        bad += abs(len(ra) - len(rb))
    print(f"{bad} mismatching records")
    return bad


def combine_csv(out_path: str, inputs):
    """Stitch restart CSVs, dropping duplicate iterations (combineCSV.sh)."""
    seen = set()
    rows = []
    for path in inputs:
        with open(path) as fh:
            for line in fh:
                if not line.strip():
                    continue
                it = int(line.split(",")[0])
                if it not in seen:
                    seen.add(it)
                    rows.append((it, line))
    rows.sort(key=lambda r: r[0])
    with open(out_path, "w") as fh:
        for _, line in rows:
            fh.write(line)


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 1
    cmd, args = argv[0], argv[1:]
    if cmd == "beta-convert":
        beta_convert(args[0], int(args[1]))
    elif cmd == "cpn-convert":
        cpn_convert(args[0], int(args[1]))
    elif cmd == "eps-convert":
        eps_convert(args[0])
    elif cmd == "extract-beta":
        extract_nonzero(args[0], int(args[1]), int(args[2]), np.float64)
    elif cmd == "extract-cpn":
        extract_nonzero(args[0], int(args[1]), int(args[2]), np.int32)
    elif cmd == "beta-check":
        return 1 if beta_check(args[0], args[1]) else 0
    elif cmd == "combine-csv":
        combine_csv(args[0], args[1:])
    else:
        print(f"unknown command: {cmd}\n{__doc__}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
