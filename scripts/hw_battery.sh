#!/bin/bash
# Hardware measurement battery — run when the axon tunnel is up.
# Captures, in order (each under its own timeout, output to $OUT):
#   1. kernel_check (all compiled kernels incl. the new planes kernels)
#   2. profile_sweep (flagship-config kernel-vs-glue split)
#   3. bench flagship default (M=10K N=5K W=64)  [driver config]
#   4. bench flagship W=256 probe
#   5. bench M=10K x N=50K W=256: planes ON vs OFF
#   6. bench M=100K x N=50K W=256: planes ON vs OFF
#   7. bench BayesW (post sigma_ad fix re-measure)
OUT=${1:-/tmp/hw_battery.log}
: > "$OUT"
log() { echo "=== $* ($(date +%H:%M:%S)) ===" | tee -a "$OUT"; }

log "1 kernel_check"
timeout 1500 python -u scripts/kernel_check.py >> "$OUT" 2>&1
log "2 profile_sweep"
timeout 1500 python -u scripts/profile_sweep.py >> "$OUT" 2>&1
log "3 bench default W=64"
timeout 1500 python -u bench.py --skip-baseline >> "$OUT" 2>&1
log "4 bench default W=256"
timeout 1500 python -u bench.py --skip-baseline --window 256 >> "$OUT" 2>&1
log "4c bench exact mode (default config)"
timeout 1500 python -u bench.py --skip-baseline --exact --window 64 \
    --iters 60 >> "$OUT" 2>&1
log "5a bench 10Kx50K planes off"
timeout 1800 python -u bench.py --skip-baseline --m 10000 --n 50000 \
    --window 256 --cache-planes off >> "$OUT" 2>&1
log "5b bench 10Kx50K planes on"
timeout 1800 python -u bench.py --skip-baseline --m 10000 --n 50000 \
    --window 256 --cache-planes on >> "$OUT" 2>&1
log "6a bench 100Kx50K planes off"
timeout 2400 python -u bench.py --skip-baseline --m 100000 --n 50000 \
    --window 256 --iters 60 --cache-planes off >> "$OUT" 2>&1
log "6b bench 100Kx50K planes on"
timeout 2400 python -u bench.py --skip-baseline --m 100000 --n 50000 \
    --window 256 --iters 60 --cache-planes on >> "$OUT" 2>&1
log "7 bench BayesW"
timeout 1500 python -u bench.py --skip-baseline --model bayesw >> "$OUT" 2>&1
log "8a bench 10Kx50K mega forced"
timeout 1800 python -u bench.py --skip-baseline --m 10000 --n 50000 \
    --window 256 --mega on >> "$OUT" 2>&1
log "8b bench 100Kx50K mega forced"
timeout 2400 python -u bench.py --skip-baseline --m 100000 --n 50000 \
    --window 256 --iters 60 --mega on >> "$OUT" 2>&1
log "9a bench mt (mega auto)"
timeout 1800 python -u bench.py --skip-baseline --model mt --m 10000 \
    --n 50000 --window 256 >> "$OUT" 2>&1
log "9b bench mt (mega off)"
timeout 1800 python -u bench.py --skip-baseline --model mt --m 10000 \
    --n 50000 --window 256 --mega off >> "$OUT" 2>&1
log "done"
