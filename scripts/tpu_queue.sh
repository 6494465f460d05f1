#!/bin/bash
# Round-3 TPU measurement battery (NOTES_ROUND3.md queue), run
# sequentially and unattended the moment the tunnel is healthy.
# Each step is bounded; outputs land in tpu_queue_out/.
cd "$(dirname "$0")/.."
OUT=tpu_queue_out
mkdir -p $OUT
log() { echo "=== $(date +%H:%M:%S) $*" | tee -a $OUT/queue.log; }

log "0: tunnel probe"
timeout 300 python -c "
import time, jax, jax.numpy as jnp
t0=time.time(); x=jnp.ones((256,256)); (x@x).block_until_ready()
print('probe ok %.1fs' % (time.time()-t0), jax.devices()[0])
" >> $OUT/queue.log 2>&1 || { log "tunnel DOWN - aborting"; exit 1; }

log "1: probe_exec_size"
timeout 1800 python scripts/probe_exec_size.py > $OUT/probe_exec_size.txt 2>&1
tail -20 $OUT/probe_exec_size.txt | tee -a $OUT/queue.log

log "2a: e2e run A (fine timers; cold if libtpu rolled)"
CSW_FINE_TIMERS=1 timeout 3000 python scripts/e2e_fit.py > $OUT/e2e_a.txt 2>&1
tail -6 $OUT/e2e_a.txt | tee -a $OUT/queue.log

log "2b: e2e run B (warm, same command)"
CSW_FINE_TIMERS=1 timeout 3000 python scripts/e2e_fit.py > $OUT/e2e_b.txt 2>&1
tail -6 $OUT/e2e_b.txt | tee -a $OUT/queue.log

log "2c: e2e run C (warm + AOT dispatch)"
CSW_AOT_BLOCK=1 CSW_FINE_TIMERS=1 timeout 3000 python scripts/e2e_fit.py > $OUT/e2e_c.txt 2>&1
tail -6 $OUT/e2e_c.txt | tee -a $OUT/queue.log

log "3: bench headline"
timeout 2400 python bench.py > $OUT/bench.txt 2>&1
tail -2 $OUT/bench.txt | tee -a $OUT/queue.log

log "4: attr_bench 656k"
ATTR_ICO_SUB=8 timeout 2400 python scripts/attr_bench.py > $OUT/attr_656k.txt 2>&1
tail -8 $OUT/attr_656k.txt | tee -a $OUT/queue.log

log "5: e2e bucketed warm retest"
CSW_FINE_TIMERS=1 timeout 3000 python scripts/e2e_fit.py --capacity-mode bucketed > $OUT/e2e_bucketed.txt 2>&1
tail -6 $OUT/e2e_bucketed.txt | tee -a $OUT/queue.log

log "queue complete"
