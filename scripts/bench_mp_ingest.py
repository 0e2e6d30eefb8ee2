"""Multi-process sharded .bed ingest measurement (VERDICT r4 item 6).

K separate processes concurrently read ONLY their own marker-shard rows of
one multi-GB .bed (the same shard_layout + read_bed slice path the
multi-process runner uses — runner._mp_marker_slice), then compute the
load-time marker statistics (native bed_counts). Replaces
UKB_FEASIBILITY.md's single-host extrapolation with a measured table:
per-process and aggregate GB/s, cold vs warm page cache, and per-process
peak RSS. Mirrors the reference's MPI-IO collective reads
(load_data_from_bed_file, data.cpp:671-739).

Usage: python scripts/bench_mp_ingest.py [--bed /tmp/big_keep.bed]
           [--n 10000] [--procs 4] [--drop-caches]
"""

import argparse
import json
import multiprocessing as mp
import os
import resource
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def worker(bed, n, m, lo, cnt, q, blk=16384, stagger=False):
    import numpy as np

    from hydra_tpu import native
    from hydra_tpu.io.plink import bed_bytes_per_marker, read_bed

    nbytes = bed_bytes_per_marker(n)
    t0 = time.time()
    # block-wise into a reused buffer (cold-page faults cost ~6 s/GB on
    # cloud VMs; one full-slice np.empty would dominate)
    buf = np.empty(blk * nbytes, np.uint8)
    t_read = 0.0
    t_stats = 0.0
    done = 0
    lock_fh = open(bed + ".ingest_lock", "w") if stagger else None
    import fcntl
    while done < cnt:
        b = min(blk, cnt - done)
        t1 = time.time()
        if stagger:
            fcntl.flock(lock_fh, fcntl.LOCK_EX)
        pk = read_bed(bed, n, m, lo + done, b, out=buf)
        if stagger:
            fcntl.flock(lock_fh, fcntl.LOCK_UN)
        t2 = time.time()
        native.bed_counts(pk, n)
        t3 = time.time()
        t_read += t2 - t1
        t_stats += t3 - t2
        done += b
    wall = time.time() - t0
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    q.put(dict(pid=os.getpid(), rows=cnt, bytes=cnt * nbytes, wall=wall,
               t_read=t_read, t_stats=t_stats, rss_gb=rss))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bed", default="/tmp/big_keep.bed")
    ap.add_argument("--n", type=int, default=10000)
    ap.add_argument("--procs", type=int, default=4)
    ap.add_argument("--drop-caches", action="store_true")
    ap.add_argument("--stagger", action="store_true",
                    help="serialize reads with an flock (one reader at a "
                    "time): on storage that collapses under concurrent "
                    "streams this recovers single-stream bandwidth while "
                    "stats overlap")
    ap.add_argument("--block", type=int, default=16384,
                    help="markers per read block (bigger = longer sequential "
                    "runs per process; matters for cold concurrent reads)")
    args = ap.parse_args()

    from hydra_tpu.data.genotypes import shard_layout
    from hydra_tpu.io.plink import bed_bytes_per_marker

    nbytes = bed_bytes_per_marker(args.n)
    m = (os.path.getsize(args.bed) - 3) // nbytes
    print(f"# {args.bed}: M={m} N={args.n} "
          f"({m * nbytes / 1e9:.2f} GB), {args.procs} processes")

    if args.drop_caches:
        with open("/proc/sys/vm/drop_caches", "w") as fh:
            fh.write("3\n")
        print("# page caches dropped (cold read)")

    starts, lens, _ = shard_layout(m, args.procs, 1, None)
    q = mp.Queue()
    procs = []
    t0 = time.time()
    for p in range(args.procs):
        pr = mp.Process(target=worker, args=(
            args.bed, args.n, m, int(starts[p]), int(lens[p]), q,
            args.block, args.stagger))
        pr.start()
        procs.append(pr)
    results = [q.get() for _ in procs]
    for pr in procs:
        pr.join()
    wall = time.time() - t0

    total = sum(r["bytes"] for r in results)
    for r in sorted(results, key=lambda r: r["pid"]):
        print(f"  proc {r['pid']}: {r['bytes'] / 1e9:.2f} GB in "
              f"{r['wall']:.1f} s (read {r['t_read']:.1f} + stats "
              f"{r['t_stats']:.1f}) = {r['bytes'] / 1e9 / r['wall']:.2f} "
              f"GB/s, peak RSS {r['rss_gb']:.2f} GB")
    print(json.dumps(dict(
        aggregate_gbps=round(total / 1e9 / wall, 3),
        total_gb=round(total / 1e9, 2), wall_s=round(wall, 1),
        procs=args.procs,
        max_rss_gb=round(max(r["rss_gb"] for r in results), 2))))


if __name__ == "__main__":
    main()
