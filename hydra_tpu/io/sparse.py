"""hydra sparse-genotype file format (reader + writer + converters).

File-format-compatible with the reference's 9-file representation
(write_sparse_data_files BayesRRm.cpp:437-770; load_data_from_sparse_files
data.cpp:742-823):

    basename.ss{1,2,m}  per-marker start offsets   (uint64, Mtot entries)
    basename.sl{1,2,m}  per-marker element counts  (uint64, Mtot entries)
    basename.si{1,2,m}  individual indices         (uint32, concatenated)
    basename.dim        text "N M"

Index lists hold the individuals whose genotype is 1 ("1"), 2 ("2") or
missing ("m"); zeros are implicit.

On TPU the compute representation is packed BED bytes in HBM, so the sparse
format exists for interchange with reference deployments: `read_sparse_files`
+ `sparse_to_packed_bed` rebuild the packed representation, and
`write_sparse_files` implements the `--bed-to-sparse` converter (C6).
The mixed BED/sparse representation (C7, --threshold-fnz) is intentionally
subsumed: dense LUT decode from packed bytes is bandwidth-optimal on TPU,
making the per-marker representation switch unnecessary (numerics identical).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

from hydra_tpu.io.plink import (
    MISSING_CODE,
    bed_bytes_per_marker,
    decode_bed_numpy,
    read_bed,
)


@dataclass
class SparseGenotypes:
    n: int
    m: int
    s1: np.ndarray  # starts, uint64 (local to this slice)
    l1: np.ndarray  # lengths, uint64
    i1: np.ndarray  # indices, uint32
    s2: np.ndarray
    l2: np.ndarray
    i2: np.ndarray
    sm: np.ndarray
    lm: np.ndarray
    im: np.ndarray


def write_sparse_files(
    bed_path: str,
    n: int,
    m: int,
    out_basename: str,
    block_size: int = 8192,
) -> None:
    """Convert a .bed to the 9-file sparse representation (--bed-to-sparse).

    Streaming two-pass-free equivalent of write_sparse_data_files
    (BayesRRm.cpp:437-770): processes markers in blocks, appending index data
    and accumulating global offsets. Each block goes through the native
    OpenMP kernels (bed_counts + bed_sparse_fill, native/bedio.cpp) — the
    count pass sizes per-marker output slices, the fill pass scatters
    individual indices in parallel — with the NumPy per-marker loop as the
    no-toolchain fallback. Reused block buffers + a writer thread overlap
    the .si appends with the next block's read+count+fill. Measured at
    M=1M x N=10K (2.5 GB .bed, rare-maf panel, 4-core VM): compute path
    0.51 GB/s (0.13 GB/s/core, OpenMP-linear over markers); end-to-end
    bound by the host's write wall (this VM allocates fresh pages at
    ~0.2-0.3 GB/s — dd measures the same). The old per-marker np.nonzero
    loop ran ~0.04 GB/s, unusable at the reference's M=14.8M scale.
    """
    import queue
    import threading

    from hydra_tpu import native

    use_native = native.available()
    files = {}
    for tag in ("1", "2", "m"):
        files[f"si{tag}"] = open(out_basename + f".si{tag}", "wb")
    starts = {"1": [], "2": [], "m": []}
    lengths = {"1": [], "2": [], "m": []}
    offs = {"1": 0, "2": 0, "m": 0}
    # persistent block buffers: cold-page faults run ~6 s/GB on cloud VMs,
    # so per-block np.empty would dominate the whole conversion. Three
    # rotating index-buffer sets let a writer thread overlap the .si appends
    # (disk-bound) with the next blocks' read+count+fill: with queue depth 1,
    # set k is provably idle again by the time block k+3 fills it.
    pk_buf = np.empty(block_size * bed_bytes_per_marker(n), np.uint8)
    idx_sets = [[np.empty(0, np.uint32) for _ in range(3)] for _ in range(3)]
    wq: "queue.Queue" = queue.Queue(maxsize=1)
    werr = []

    def _writer():
        while True:
            item = wq.get()
            if item is None:
                return
            try:
                for fh, view in item:
                    fh.write(view)
            except Exception as e:  # surfaced after join
                werr.append(e)

    wthread = threading.Thread(target=_writer, daemon=True)
    wthread.start()
    try:
        for bi, blk_start in enumerate(range(0, m, block_size)):
            blk = min(block_size, m - blk_start)
            packed = read_bed(bed_path, n, m, blk_start, blk, out=pk_buf)
            if use_native:
                n1, n2, nm = native.bed_counts(packed, n)
                local = {}
                for tag, cnt in (("1", n1), ("2", n2), ("m", nm)):
                    local[tag] = np.concatenate(
                        ([0], np.cumsum(cnt[:-1], dtype=np.int64)))
                bufs = idx_sets[bi % 3]
                for k, cnt in enumerate((n1, n2, nm)):
                    need = int(cnt.sum())
                    if bufs[k].size < need:
                        bufs[k] = np.empty(int(need * 1.3), np.uint32)
                i1, i2, im = native.bed_sparse_fill(
                    packed, n, local["1"], local["2"], local["m"],
                    n1, n2, nm, out=bufs)
                wq.put([(files[f"si{tag}"], memoryview(idx))
                        for tag, idx in (("1", i1), ("2", i2), ("m", im))])
                for tag, cnt in (("1", n1), ("2", n2), ("m", nm)):
                    starts[tag].extend((offs[tag] + local[tag]).tolist())
                    lengths[tag].extend(cnt.tolist())
                    offs[tag] += int(cnt.sum())
                continue
            geno, mask = decode_bed_numpy(packed, n)
            for tag, sel in (
                ("1", (geno == 1.0) & (mask == 1.0)),
                ("2", (geno == 2.0) & (mask == 1.0)),
                ("m", mask == 0.0),
            ):
                for j in range(blk):
                    idx = np.nonzero(sel[j])[0].astype(np.uint32)
                    files[f"si{tag}"].write(idx.tobytes())
                    starts[tag].append(offs[tag])
                    lengths[tag].append(len(idx))
                    offs[tag] += len(idx)
    finally:
        wq.put(None)
        wthread.join()
        for fh in files.values():
            fh.close()
    if werr:
        raise werr[0]
    for tag in ("1", "2", "m"):
        np.asarray(starts[tag], dtype=np.uint64).tofile(out_basename + f".ss{tag}")
        np.asarray(lengths[tag], dtype=np.uint64).tofile(out_basename + f".sl{tag}")
    with open(out_basename + ".dim", "w") as fh:
        fh.write(f"{n} {m}\n")


def read_dim(basename: str) -> Tuple[int, int]:
    """(N, M) from the text .dim file (data.cpp:1072-1079)."""
    with open(basename + ".dim") as fh:
        parts = fh.read().split()
    return int(parts[0]), int(parts[1])


def read_sparse_files(
    basename: str,
    marker_start: int = 0,
    marker_count: Optional[int] = None,
) -> SparseGenotypes:
    """Read a marker slice from sparse files (data.cpp:742-823, :1072-1106)."""
    n, m = read_dim(basename)
    if marker_count is None:
        marker_count = m - marker_start

    def load(tag: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        ss = np.fromfile(
            basename + f".ss{tag}", dtype=np.uint64, count=marker_count,
            offset=marker_start * 8,
        )
        sl = np.fromfile(
            basename + f".sl{tag}", dtype=np.uint64, count=marker_count,
            offset=marker_start * 8,
        )
        n_elem = int(ss[-1] + sl[-1] - ss[0]) if marker_count > 0 else 0
        si = np.fromfile(
            basename + f".si{tag}", dtype=np.uint32, count=n_elem,
            offset=int(ss[0]) * 4,
        )
        return ss - ss[0] if marker_count > 0 else ss, sl, si

    s1, l1, i1 = load("1")
    s2, l2, i2 = load("2")
    sm, lm, im = load("m")
    return SparseGenotypes(n, marker_count, s1, l1, i1, s2, l2, i2, sm, lm, im)


def sparse_to_packed_bed(sp: SparseGenotypes) -> np.ndarray:
    """Rebuild packed BED bytes from sparse index lists.

    Inverse of the decode; equivalent role to get_bed_marker_from_sparse
    (data.cpp:826-865). Codes: 0->0b11, 1->0b10, 2->0b00, missing->0b01.
    """
    m, n = sp.m, sp.n
    codes = np.full((m, n), 0b11, dtype=np.uint8)  # default genotype 0
    for j in range(m):
        codes[j, sp.i1[int(sp.s1[j]): int(sp.s1[j] + sp.l1[j])]] = 0b10
        codes[j, sp.i2[int(sp.s2[j]): int(sp.s2[j] + sp.l2[j])]] = 0b00
        codes[j, sp.im[int(sp.sm[j]): int(sp.sm[j] + sp.lm[j])]] = MISSING_CODE
    nbytes = bed_bytes_per_marker(n)
    padded = np.full((m, nbytes * 4), MISSING_CODE, dtype=np.uint8)
    padded[:, :n] = codes
    return (
        padded[:, 0::4]
        | (padded[:, 1::4] << 2)
        | (padded[:, 2::4] << 4)
        | (padded[:, 3::4] << 6)
    ).astype(np.uint8)
