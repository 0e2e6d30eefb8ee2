from hydra_tpu.utils import dist  # noqa: F401
from hydra_tpu.utils.gadgets import Timer  # noqa: F401
