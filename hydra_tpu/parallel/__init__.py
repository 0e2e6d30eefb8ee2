from hydra_tpu.parallel.mesh import make_mesh, MARKER_AXIS  # noqa: F401
