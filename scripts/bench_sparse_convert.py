"""Measure --bed-to-sparse converter throughput at M >= 1M.

Builds a synthetic .bed (native HWE generator, blockwise to disk), then times
`hydra_tpu.io.sparse.write_sparse_files` end-to-end (read + count + fill +
write). The reference's converter (write_sparse_data_files,
BayesRRm.cpp:437-770) is an MPI job at UKB scale; the target here is >= 1 GB/s
of .bed single-host so M=14.8M x N=457K (1.69 TB) converts in < 30 min/host.

Usage: python scripts/bench_sparse_convert.py [--m 1000000] [--n 10000]
"""

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hydra_tpu import native
from hydra_tpu.io.plink import bed_bytes_per_marker


def make_bed(path, m, n, seed=0, block=65536, maf_mode="rare"):
    nbytes = bed_bytes_per_marker(n)
    rs = np.random.Generator(np.random.SFC64(seed))
    t0 = time.time()
    with open(path, "wb") as fh:
        fh.write(bytes([0x6C, 0x1B, 0x01]))
        for s in range(0, m, block):
            b = min(block, m - s)
            if maf_mode == "rare":
                # log-uniform maf in [0.001, 0.5] — UKB-like spectrum
                # (median ~2%), what the reference's fnz thresholds assume
                maf = np.exp(rs.uniform(np.log(0.001), np.log(0.5), b))
            else:
                maf = rs.uniform(0.05, 0.5, b)
            # per-marker HWE thresholds on a u8 grid
            thr_a = np.clip((maf * 256), 1, 255).astype(np.uint8)
            thr_b = np.clip((maf * maf * 256), 0, 255).astype(np.uint8)
            rb = rs.integers(0, 256, size=(b, n), dtype=np.uint8)
            packed = native.bed_generate(rb, thr_a, thr_b, nbytes)
            if packed is None:
                raise SystemExit("native toolchain required for this bench")
            fh.write(packed.tobytes())
    return time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=1_000_000)
    ap.add_argument("--n", type=int, default=10_000)
    ap.add_argument("--block", type=int, default=16384)
    ap.add_argument("--maf", choices=("rare", "uniform"), default="rare")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--devnull", action="store_true",
                    help="route .si index output to /dev/null: measures the "
                    "compute path (read+count+fill) alone. On VMs where "
                    "fresh-page allocation runs ~0.2-0.3 GB/s (check: dd "
                    "if=/dev/zero to a file), end-to-end is that wall, not "
                    "the converter.")
    args = ap.parse_args()

    from hydra_tpu.io.sparse import write_sparse_files

    d = tempfile.mkdtemp(prefix="sparsebench_")
    bed = os.path.join(d, "big.bed")
    nbytes = bed_bytes_per_marker(args.n)
    gb = args.m * nbytes / 1e9
    print(f"generating {bed}: M={args.m} N={args.n} ({gb:.2f} GB)...")
    tg = make_bed(bed, args.m, args.n, maf_mode=args.maf)
    print(f"  generated in {tg:.1f} s ({gb / tg:.2f} GB/s)")

    out = os.path.join(d, "big")
    if args.devnull:
        import builtins
        orig_open = builtins.open

        def null_open(path, mode="r", *a, **k):
            if isinstance(path, str) and path.startswith(out + ".si") \
                    and "w" in mode:
                return orig_open(os.devnull, mode)
            return orig_open(path, mode, *a, **k)

        builtins.open = null_open
    t0 = time.time()
    write_sparse_files(bed, args.n, args.m, out, block_size=args.block)
    dt = time.time() - t0
    if args.devnull:
        builtins.open = orig_open
        out_bytes = 0
    else:
        out_bytes = sum(os.path.getsize(out + f".{k}{t}")
                        for k in ("ss", "sl", "si") for t in ("1", "2", "m"))
    print(f"converted in {dt:.1f} s: {gb / dt:.2f} GB/s of .bed "
          f"({gb:.2f} GB in, {out_bytes / 1e9:.2f} GB out, "
          f"native={native.available()}, block={args.block}, "
          f"devnull={args.devnull})")
    if not args.keep:
        import shutil
        shutil.rmtree(d)


if __name__ == "__main__":
    main()
