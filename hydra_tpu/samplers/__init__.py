from hydra_tpu.samplers.bayesrrm import BayesRRm  # noqa: F401
