from hydra_tpu.outputs.writers import McmcWriter  # noqa: F401
from hydra_tpu.outputs.restart import RestartData, read_restart  # noqa: F401
