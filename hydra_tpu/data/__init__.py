from hydra_tpu.data.genotypes import GenotypeData, Dataset, load_dataset  # noqa: F401
