"""Command-line entry point: `python -m hydra_tpu.cli <hydra-style flags>`.

Dispatch mirrors main.cpp:47-177:
  --bed-to-sparse                 -> sparse-file converter (C6)
  --check-RAM                     -> HBM/RAM usage estimator (C24)
  --mpibayes bayesMPI             -> BayesRRm
  --mpibayes bayesFHMPI           -> BayesRRm with horseshoe priors
  --mpibayes bayesWMPI            -> BayesW (Weibull survival)
"""

from __future__ import annotations

import sys

from hydra_tpu.options import parse_args


def main(argv=None) -> int:
    opt = parse_args(argv)

    if opt.device:
        # Platform override BEFORE any backend init. On this class of host a
        # sitecustomize may import jax and register a TPU plugin at
        # interpreter startup; env JAX_PLATFORMS is already consumed by
        # then, but jax.config.update still works until the first backend
        # use. The reference binary runs anywhere MPI does (main.cpp) —
        # --device cpu restores that property here.
        import jax
        jax.config.update("jax_platforms", opt.device)

    # multi-host pods: no-op on a single host (parallel/distributed.py)
    from hydra_tpu.parallel.distributed import init_distributed
    init_distributed()

    if opt.bed_to_sparse:
        from hydra_tpu.io import plink
        from hydra_tpu.io.sparse import write_sparse_files
        n = opt.number_individuals or plink.read_fam(opt.bed_file + ".fam").n
        m = opt.number_markers or plink.read_bim(opt.bed_file + ".bim").m
        out = (opt.sparse_dir + "/" + opt.sparse_basename
               if opt.sparse_dir else opt.bed_file)
        # --blocks-per-rank splits the conversion into independent passes to
        # bound memory (BayesRRm.cpp:469-471; single logical rank here)
        block_size = min(8192, -(-m // max(1, opt.blocks_per_rank)))
        print(f"INFO   : converting {opt.bed_file}.bed (M={m}, N={n}) -> {out}.s* "
              f"in blocks of {block_size} markers")
        write_sparse_files(opt.bed_file + ".bed", n, m, out,
                           block_size=block_size)
        return 0

    if opt.check_ram:
        from hydra_tpu.diag.ramcheck import check_ram_usage
        check_ram_usage(opt)
        return 0

    if opt.bayes_type in ("bayesMPI", "bayesFHMPI"):
        if opt.multi_phen:
            from hydra_tpu.runner import run_bayesrrm_mt
            run_bayesrrm_mt(opt)
        else:
            from hydra_tpu.runner import run_bayesrrm
            run_bayesrrm(opt)
        return 0

    if opt.bayes_type == "bayesWMPI":
        from hydra_tpu.runner_bayesw import run_bayesw
        run_bayesw(opt)
        return 0

    print(f"FATAL  : Wrong analysis requested: {opt.bayes_type!r} "
          f"(expected bayesMPI | bayesWMPI | bayesFHMPI)", file=sys.stderr)
    return 1


if __name__ == "__main__":
    sys.exit(main())
