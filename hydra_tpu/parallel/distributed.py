"""Multi-host initialization — the TPU-pod analogue of hydra's SLURM/MPI setup.

The reference launches via `srun`/mvapich (CSCS/*.sh); here each host of a
TPU pod slice runs the same CLI and `init_distributed()` wires them into one
`jax.distributed` job. After initialization `jax.devices()` spans all hosts,
so the marker mesh and psum residual sync work unchanged — ICI within a
slice, DCN across slices (raise --window to amortize DCN latency, the direct
analogue of raising --sync-rate across nodes).
"""

from __future__ import annotations

import os
from typing import Optional


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed from args or environment.

    On Cloud TPU pods, `jax.distributed.initialize()` with no arguments
    autodetects everything; explicit settings come from
    HYDRA_COORDINATOR / HYDRA_NUM_PROCS / HYDRA_PROC_ID (or SLURM variables).
    Returns True if distributed mode was initialized.
    """
    import jax

    coordinator = coordinator or os.environ.get("HYDRA_COORDINATOR")
    if num_processes is None:
        num_processes = int(os.environ.get(
            "HYDRA_NUM_PROCS", os.environ.get("SLURM_NTASKS", "0")) or 0)
    if process_id is None:
        process_id = int(os.environ.get(
            "HYDRA_PROC_ID", os.environ.get("SLURM_PROCID", "0")) or 0)

    if coordinator:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
        return True
    # explicit opt-in only: single-worker environments may still export
    # TPU_WORKER_HOSTNAMES=localhost, which must not trigger a coordinator
    if os.environ.get("HYDRA_DISTRIBUTED") == "1" or \
            os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
        return True
    return False


def is_primary() -> bool:
    import jax
    return jax.process_index() == 0
