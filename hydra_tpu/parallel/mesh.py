"""Device mesh setup for marker (and optional individual) sharding.

The reference's only parallelism strategy is 1-D marker sharding over MPI
ranks with a replicated residual vector (SURVEY §2 C12). The TPU equivalent
is a 1-D `jax.sharding.Mesh` over axis "markers": per-marker state is sharded
on that axis, the residual (epsilon) is replicated, and residual deltas are
combined with `jax.lax.psum` over ICI — replacing MPI_Allreduce and making
the sparse/BED Allgatherv codecs (BayesRRm.cpp:2080-2452) unnecessary (dense
N-vectors are cheap on ICI).

Beyond the reference: an optional second axis "inds" shards the *individual*
dimension. The reference replicates the full N-vector epsilon on every rank
(BayesRRm.cpp:1528-1537) so N is bounded by node RAM; on TPU the bound is
HBM, and for biobank-scale N the residual, covariates and the packed byte
columns shard over "inds", with partial dot products combined by one extra
psum over that axis (SURVEY §5 "long-context" analogue — the extension the
reference has no prior art for).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

MARKER_AXIS = "markers"
IND_AXIS = "inds"


def make_mesh(n_devices: int = 0, devices: Optional[list] = None,
              n_ind: int = 1) -> Mesh:
    """Mesh over ("markers",) — or ("markers", "inds") when n_ind > 1.

    n_devices == 0 uses all visible devices. n_ind splits the device pool:
    n_devices must be a multiple of n_ind; marker axis gets n_devices/n_ind.
    Multi-host: pass the global device list (jax.devices() already spans
    hosts under jax.distributed). Keep "inds" within a host/slice so its
    psums ride ICI.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices > 0:
        devices = devices[:n_devices]
    if n_ind <= 1:
        return Mesh(np.asarray(devices), (MARKER_AXIS,))
    if len(devices) % n_ind:
        raise ValueError(
            f"n_ind={n_ind} must divide the device count {len(devices)}")
    grid = np.asarray(devices).reshape(len(devices) // n_ind, n_ind)
    return Mesh(grid, (MARKER_AXIS, IND_AXIS))


def mesh_axes(mesh: Mesh) -> tuple:
    """(n_marker_shards, n_ind_shards) for a 1-D or 2-D mesh."""
    n_ind = mesh.shape.get(IND_AXIS, 1)
    return mesh.shape[MARKER_AXIS], n_ind
