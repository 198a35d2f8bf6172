#!/bin/bash
# Serialized chip work queue (single tunneled TPU — one job at a time).
# Stage 1: wait for the running ab_config37 cell to finish.
# Stage 2: config-3 timeout diagnosis with compile logging (VERDICT r4
#          item 5: configs 3/7 cells died at 1700 s; find out where the
#          time goes — remote compiles vs execution vs hang).
# Stage 3: trimmed config-4 sweep (VERDICT r4 item 4).
set -u
cd /root/repo
exec >> /tmp/chip_queue2.log 2>&1

echo "=== queue2 start $(date -u +%H:%M:%S) ==="
while kill -0 20696 2>/dev/null; do sleep 30; done
echo "=== ab_config37 done $(date -u +%H:%M:%S) ==="
tail -2 /tmp/ab_config37.log

echo "=== diag config3 (JAX_LOG_COMPILES=1, 5400s cap) $(date -u +%H:%M:%S) ==="
JAX_LOG_COMPILES=1 JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_rtf \
JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1 \
timeout 5400 python -u bench.py --config 3 > /tmp/diag3.log 2>&1
echo "diag3 rc=$? $(date -u +%H:%M:%S)"
tail -5 /tmp/diag3.log

echo "=== config4 sweep (trimmed) $(date -u +%H:%M:%S) ==="
python -u scripts/sweep_config4.py baseline group16 group8 dbits1 \
  group8_dbits1 subbits subbits_group16 mbits5 chunk128 sub8 \
  subiv2 subiv2_group16
echo "=== queue2 done $(date -u +%H:%M:%S) ==="
