#!/bin/bash
# Hardware measurement battery — run when the axon tunnel is up.
# Captures, in order (each under its own timeout, output to $OUT):
#   1. kernel_check (all compiled kernels vs the XLA golden path)
#   2. profile_sweep (flagship-config kernel-vs-glue split)
#   3. bench flagship default (M=10K N=5K W=64)  [driver config]
#   4. exact mode: mega vs per-window, small + at-scale
#   5. stale at scale: M=100K / M=500K x N=50K (mega)
#   6. BayesW + multi-trait
# Historic probes (int8 plane cache, single-decode sweep) are opt-in:
#   --cache-planes on / HYDRA_TPU_SD=auto — both measured SLOWER and
#   documented in STATUS.md; not re-run by default.
OUT=${1:-/tmp/hw_battery.log}
: > "$OUT"
log() { echo "=== $* ($(date +%H:%M:%S)) ===" | tee -a "$OUT"; }

log "1 kernel_check"
timeout 1500 python -u scripts/kernel_check.py >> "$OUT" 2>&1
log "2 profile_sweep"
timeout 1500 python -u scripts/profile_sweep.py >> "$OUT" 2>&1
log "3a bench default W=64"
timeout 1500 python -u bench.py --skip-baseline >> "$OUT" 2>&1
log "3b bench default W=256"
timeout 1500 python -u bench.py --skip-baseline --window 256 >> "$OUT" 2>&1
log "4a bench exact default config (exact mega, auto)"
timeout 1500 python -u bench.py --skip-baseline --exact --window 64 \
    --iters 60 >> "$OUT" 2>&1
log "4b bench exact default config (per-window)"
timeout 1500 python -u bench.py --skip-baseline --exact --window 64 \
    --iters 60 --mega off >> "$OUT" 2>&1
log "4c bench exact 100Kx50K W=64 (mega auto — integer-Gram path wins)"
timeout 2400 python -u bench.py --skip-baseline --m 100000 --n 50000 \
    --window 64 --exact --iters 60 >> "$OUT" 2>&1
log "4d bench exact 500Kx50K W=64 (mega auto)"
timeout 3000 python -u bench.py --skip-baseline --m 500000 --n 50000 \
    --window 64 --exact --iters 40 >> "$OUT" 2>&1
log "5a bench 10Kx50K stale W=256"
timeout 1800 python -u bench.py --skip-baseline --m 10000 --n 50000 \
    --window 256 >> "$OUT" 2>&1
log "5b bench 100Kx50K stale W=256 (mega auto)"
timeout 2400 python -u bench.py --skip-baseline --m 100000 --n 50000 \
    --window 256 --iters 60 >> "$OUT" 2>&1
log "5c bench 500Kx50K stale W=256 (north star, mega auto)"
timeout 3000 python -u bench.py --skip-baseline --m 500000 --n 50000 \
    --window 256 --iters 60 >> "$OUT" 2>&1
log "6a bench BayesW"
timeout 1500 python -u bench.py --skip-baseline --model bayesw \
    --window 64 >> "$OUT" 2>&1
log "6b bench mt T=4 (mega auto)"
timeout 1800 python -u bench.py --skip-baseline --model mt --m 10000 \
    --n 50000 --window 256 >> "$OUT" 2>&1
log "6c bench BayesW at scale (100Kx50K, mega auto)"
timeout 2400 python -u bench.py --skip-baseline --model bayesw \
    --m 100000 --n 50000 --window 64 --iters 40 >> "$OUT" 2>&1
log "6d bench mt exact T=4 (exact mt mega)"
timeout 2400 python -u bench.py --skip-baseline --model mt --m 10000 \
    --n 50000 --window 64 --exact >> "$OUT" 2>&1
log "done"
