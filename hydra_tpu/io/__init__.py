from hydra_tpu.io.plink import (  # noqa: F401
    read_fam,
    read_bim,
    read_bed,
    write_bed,
    read_dim,
    bed_bytes_per_marker,
)
from hydra_tpu.io.pheno import (  # noqa: F401
    read_phenotype_file,
    read_phen_cov_files,
    read_phen_fail_files,
    read_phen_fail_cov_files,
    read_failure_file,
    read_csv_covariates,
    center_and_scale,
)
from hydra_tpu.io.groups import (  # noqa: F401
    read_group_file,
    read_ms_file,
    read_group_priors,
    read_dirichlet_priors,
    read_marker_blocks_file,
)
from hydra_tpu.io.sparse import (  # noqa: F401
    write_sparse_files,
    read_sparse_files,
    sparse_to_packed_bed,
)
