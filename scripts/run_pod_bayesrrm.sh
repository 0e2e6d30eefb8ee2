#!/bin/bash
# Multi-host TPU pod launch for hydra_tpu BayesRRm — the analogue of the
# reference's CSCS strong-scaling scripts (CSCS/strong_scaling_fullSim/*.sh).
#
# Run this same script on every host of a TPU pod slice, e.g. via
#   gcloud compute tpus tpu-vm ssh $TPU --worker=all --command "bash run_pod_bayesrrm.sh"
# jax.distributed autodetects the pod topology; the marker mesh then spans
# all chips and epsilon deltas psum over ICI. Each host loads ONLY its own
# marker shards' .bed rows (runner._mp_marker_slice) and only host 0 writes
# outputs. To validate the exact same multi-process code path WITHOUT a pod:
#   python scripts/run_multiprocess.py --nprocs 2 --devices-per-proc 4 -- \
#       --mpibayes bayesMPI ... --det-sync 1
# (tests/test_multiprocess.py asserts 1x8 == 2x4 == 4x2 bitwise under
# --det-sync, including a kill-one-process --restart leg.)
#
# Strong-scaling reference configuration (UKB-sim): M=14,794,840, N=458,783,
# chain length 10, sync-rate 5 — set BED=... accordingly.

set -euo pipefail

BED=${BED:?path to .bed basename}
PHEN=${PHEN:?path to .phen}
OUT=${OUT:-./out}
CHAIN=${CHAIN:-10}
WINDOW=${WINDOW:-256}          # DCN-friendly: large windows amortize sync
SEED=${SEED:-1}

python -m hydra_tpu.cli \
  --mpibayes bayesMPI \
  --bfile "$BED" --pheno "$PHEN" \
  --chain-length "$CHAIN" --window "$WINDOW" --stale \
  --mcmc-out-dir "$OUT" --mcmc-out-name "pod_$(date +%s)" \
  --seed "$SEED" "$@"
