from hydra_tpu.ops.decode import (  # noqa: F401
    decode_planes,
    standardized_window,
    window_dot,
    marker_counts,
)
