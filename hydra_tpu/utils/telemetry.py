"""Run telemetry: sync-vs-proc timing and reference-format RESULT lines.

The reference instruments every run with hand-rolled wall-clock counters —
per-iteration proc vs sync seconds split into the Sum|dBeta| allreduce (ar1)
and the dense epsilon resync (ar2) (BayesRRm.cpp:2713-2722), an exit line
with %-time-in-allreduce (:2931-2936), and data-load bandwidth (:1420-1424).

Under XLA the whole Gibbs sweep is one fused program, so the collective time
cannot be carved out of a single step's wall clock. Instead the collectives
are profiled in isolation on the same mesh (same shapes, same axis) and the
per-iteration sync estimate is n_syncs x measured-per-op cost; the printed
lines carry the same fields as the reference's. On a 1-device marker axis
every psum compiles to a no-op and sync is exactly zero.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from hydra_tpu.parallel.mesh import IND_AXIS, MARKER_AXIS


@dataclass
class SyncProfile:
    """Per-iteration collective cost on the live mesh.

    ar1 = scalar psums (the reference's Sum|dBeta| MPI_Allreduce,
    BayesRRm.cpp:2051); ar2 = N-length dense epsilon-delta psums
    (:2456). n-counts are per Gibbs sweep.
    """
    ar1_s: float = 0.0        # seconds per scalar psum
    ar2_s: float = 0.0        # seconds per N-length psum
    n_ar1: int = 0            # scalar psums per iteration
    n_ar2: int = 0            # N-length psums per iteration
    n_dev: int = 1            # marker-axis size the profile was taken on

    @property
    def sync_per_iter(self) -> float:
        return self.ar1_s * self.n_ar1 + self.ar2_s * self.n_ar2


def _time_op(fn, arg, reps: int) -> float:
    out = fn(arg)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(arg)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def measure_sync_profile(mesh, n_len: int, n_windows: int,
                         n_ind: int = 1, reps: int = 30) -> SyncProfile:
    """Profile the two collective shapes of a Gibbs sweep on `mesh`.

    n_len is the (padded) epsilon length; per sweep there are n_windows
    scalar psums and n_windows N-length psums over the marker axis.
    """
    prof = SyncProfile(n_ar1=n_windows, n_ar2=n_windows,
                       n_dev=mesh.shape[MARKER_AXIS])
    if mesh.shape[MARKER_AXIS] == 1:
        return prof  # psum over a singleton axis is a compiled no-op

    espec = P(IND_AXIS) if n_ind > 1 else P()

    def psum_eps(e):
        return jax.lax.psum(e, MARKER_AXIS)

    f_eps = jax.jit(jax.shard_map(
        psum_eps, mesh=mesh, in_specs=espec, out_specs=espec))
    f_scal = jax.jit(jax.shard_map(
        psum_eps, mesh=mesh, in_specs=P(), out_specs=P()))
    from hydra_tpu.parallel.distributed import put_global
    eps = put_global(jnp.zeros(n_len, jnp.float32),
                     NamedSharding(mesh, espec))
    scal = put_global(jnp.zeros((), jnp.float32),
                      NamedSharding(mesh, P()))
    prof.ar2_s = _time_op(f_eps, eps, reps)
    prof.ar1_s = _time_op(f_scal, scal, reps)
    return prof


def result_line(it: int, proc_s: float, prof: SyncProfile, sigma_g: float,
                sigma_e: float, betasq: float, m0: int) -> str:
    """The reference's per-iteration RESULT line (BayesRRm.cpp:2713-2722);
    rank is always 0 (single logical writer), sync fields are the profiled
    estimate (module docstring)."""
    s1 = prof.ar1_s * prof.n_ar1
    s2 = prof.ar2_s * prof.n_ar2
    ms1 = prof.ar1_s * 1000.0
    ms2 = prof.ar2_s * 1000.0
    return (f"RESULT : it {it:4d}, rank    0: proc = {proc_s:9.3f} s, "
            f"sync = {s1 + s2:9.3f} ({s1:9.3f} + {s2:9.3f}), "
            f"n_sync = {prof.n_ar1 + prof.n_ar2:8d} ({prof.n_ar1:8d} + {prof.n_ar2:8d}) "
            f"({ms1:7.3f} / {ms2:7.3f}), "
            f"sigmaG = {sigma_g:15.10f}, sigmaE = {sigma_e:15.10f}, "
            f"betasq = {betasq:15.10f}, m0 = {m0:10d}")


def exit_line(total_s: float, prof: SyncProfile, n_iter: int) -> str:
    """The reference's exit summary with %-time-in-allreduce
    (BayesRRm.cpp:2931-2936)."""
    t1 = prof.ar1_s * prof.n_ar1 * n_iter
    t2 = prof.ar2_s * prof.n_ar2 * n_iter
    pct = (t1 + t2) / total_s * 100.0 if total_s > 0 else 0.0
    # On a 1-device marker axis every psum is a compiled no-op; the zeros
    # carry no information, so the line says so instead of reading as a
    # measurement. Multi-device numbers are still modeled from isolated
    # collective timing (module docstring) — labelled as such.
    tag = (" [1-device axis: no collectives]" if prof.n_dev == 1
           else " [sync modeled from isolated collective timing]")
    return (f"INFO   : rank    0, time to process the data: {total_s:.3f} sec, "
            f"with {t1 + t2:.3f} ({t1:.3f}, {t2:.3f}) = {pct:4.1f}% spent on "
            f"allred ({prof.n_ar1 * n_iter}, {prof.n_ar2 * n_iter}){tag}")


def cass_table(it: int, mtot_grp, sigma_g, cass) -> str:
    """Per-group cass table printed each reported iteration
    (BayesRRm.cpp:2588-2607)."""
    lines = [f"INFO   : global cass on iteration {it}:"]
    for g in range(len(mtot_grp)):
        row = f"         MtotGrp[{g:3d}] = {int(mtot_grp[g]):8d}  | "
        if int(mtot_grp[g]) == 0:
            row += " (empty group)"
        elif float(sigma_g[g]) == 0.0:
            row += " excluded (sigmaG set to zero)"
        else:
            row += " cass:" + "".join(f" {int(v):8d}" for v in cass[g])
        lines.append(row)
    return "\n".join(lines)
