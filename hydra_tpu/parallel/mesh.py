"""Device mesh setup for marker sharding.

The reference's only parallelism strategy is 1-D marker sharding over MPI
ranks with a replicated residual vector (SURVEY §2 C12). The TPU equivalent
is a 1-D `jax.sharding.Mesh` over axis "markers": per-marker state is sharded
on that axis, the residual (epsilon) is replicated, and residual deltas are
combined with `jax.lax.psum` over ICI — replacing MPI_Allreduce and making
the sparse/BED Allgatherv codecs (BayesRRm.cpp:2080-2452) unnecessary (dense
N-vectors are cheap on ICI).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

MARKER_AXIS = "markers"


def make_mesh(n_devices: int = 0, devices: Optional[list] = None) -> Mesh:
    """1-D mesh over the marker axis.

    n_devices == 0 uses all visible devices. Multi-host: pass the global
    device list (jax.devices() already spans hosts under jax.distributed).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices > 0:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (MARKER_AXIS,))
