#!/bin/bash
# Round-5 chip queue (single tunneled TPU — serialize everything).
# 1. SEG_SPLIT sweep at the headline (the unmeasured reorder-floor lever).
# 2. configs 3 and 7 with the LBVH-build skip + warm persistent cache
#    (VERDICT r4 item 5 — the prior cells died at 1700 s on compiles).
# 3. config-4 sweep re-run (the prior run hit a transient edit-state bug).
set -u
cd /root/repo
exec >> /tmp/chip_queue3.log 2>&1
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_rtf
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1

echo "=== queue3 start $(date -u +%H:%M:%S) ==="
echo "--- seg split sweep ---"
python -u scripts/sweep_seg.py baseline split2 split3 split4 split2_wdepth4
tail -6 /tmp/sweep_seg.log

echo "--- config 3 (BTF sphere, LBVH skip active) $(date -u +%H:%M:%S) ---"
timeout 4000 python -u bench.py --config 3 > /tmp/config3.log 2>&1
echo "config3 rc=$? $(date -u +%H:%M:%S)"
grep -E "^AUX|^RESULT" /tmp/config3.log | tail -3

echo "--- config 7 (strands) $(date -u +%H:%M:%S) ---"
timeout 4000 python -u bench.py --config 7 > /tmp/config7.log 2>&1
echo "config7 rc=$? $(date -u +%H:%M:%S)"
grep -E "^AUX|^RESULT" /tmp/config7.log | tail -3

echo "--- config4 sweep $(date -u +%H:%M:%S) ---"
python -u scripts/sweep_config4.py baseline group16 group8 dbits1 \
  group8_dbits1 subbits mbits5 chunk128 sub8
echo "=== queue3 done $(date -u +%H:%M:%S) ==="
