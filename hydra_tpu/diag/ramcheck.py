"""HBM/RAM usage estimator — TPU analogue of --check-RAM (C24).

The reference simulates per-node malloc of the sparse structures across a
SLURM layout (checkRamUsage, BayesRRm.cpp:2947-3084). Here the model is the
packed-BED layout: per-chip HBM = genotype shard + replicated residual
buffers + per-marker state + window workspace.
"""

from __future__ import annotations

from hydra_tpu.data.genotypes import pad_individuals
from hydra_tpu.options import Options


def estimate_bytes(m_tot: int, n: int, n_chips: int, window: int,
                   k: int = 4, num_groups: int = 1, n_ind: int = 1) -> dict:
    """Per-chip HBM for an (n_chips/n_ind markers) x (n_ind inds) mesh.

    n_ind > 1 (--ind-shards) divides every N-length buffer — residual,
    workspace planes, genotype byte columns — by the inds axis size."""
    n_pad = pad_individuals(n)
    n_marker_chips = max(1, n_chips // max(n_ind, 1))
    n_loc = -(-n_pad // max(n_ind, 1))
    m_loc = -(-m_tot // n_marker_chips)
    m_loc = -(-m_loc // window) * window
    geno = m_loc * (n_loc // 4)                    # packed 2-bit genotypes
    eps = 2 * n_loc * 4                            # eps + delta buffer
    marker_state = m_loc * (4 + 4 + 4 + 4 + 4 + 4)  # beta/comp/acum/mave/mstd/valid
    window_ws = window * n_loc * 4 * 2             # decoded planes (transient)
    gram = window * window * 4
    total = geno + eps + marker_state + window_ws + gram
    return dict(geno=geno, eps=eps, marker_state=marker_state,
                window_ws=window_ws, gram=gram, total=total,
                m_loc=m_loc, n_pad=n_pad, n_loc=n_loc)


def check_ram_usage(opt: Options) -> dict:
    from hydra_tpu.io import plink
    n = opt.number_individuals or plink.read_fam(opt.bed_file + ".fam").n
    m = opt.number_markers or plink.read_bim(opt.bed_file + ".bim").m
    chips = max(1, opt.check_ram_tasks or 1)
    est = estimate_bytes(m, n, chips, max(opt.window, 1),
                         n_ind=max(getattr(opt, "ind_shards", 1), 1))
    gb = est["total"] / 1e9
    print(f"INFO   : M={m} N={n} over {chips} chip(s), window={opt.window}, "
          f"ind-shards={getattr(opt, 'ind_shards', 1)}")
    print(f"INFO   : per-chip HBM estimate: {gb:.3f} GB "
          f"(geno {est['geno'] / 1e9:.3f}, workspace {est['window_ws'] / 1e9:.3f})")
    # --check-RAM-tasks-per-node: chips per host (the reference's per-node
    # grouping, BayesRRm.cpp:2947-3084). Host RAM must stage every local
    # chip's genotype shard during load, so report the per-host aggregate.
    tpn = max(0, opt.check_ram_tpn)
    if tpn:
        hosts = -(-chips // tpn)
        host_gb = est["total"] * min(tpn, chips) / 1e9
        est["hosts"] = hosts
        est["per_host"] = est["total"] * min(tpn, chips)
        print(f"INFO   : {tpn} chip(s)/host -> {hosts} host(s); per-host "
              f"aggregate (HBM + host staging at load): {host_gb:.3f} GB")
    hbm_per_chip = 16e9  # v5e class
    if est["total"] > hbm_per_chip:
        print(f"WARNING: exceeds ~{hbm_per_chip / 1e9:.0f} GB HBM per chip; "
              f"need >= {-(-est['total'] // int(hbm_per_chip))} chips or smaller window")
    return est
