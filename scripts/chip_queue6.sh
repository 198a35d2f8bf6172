#!/bin/bash
# Round-5 chip queue, part 3: configs 3 and 7 need longer-than-1800s
# cold-cache budgets (the BTF wavefront path's remote Mosaic compiles;
# VERDICT r4 item 5) — run them standalone with generous timeouts, then
# re-run fast from the warmed persistent cache for the timed number.
set -u
cd /root/repo
exec >> /tmp/chip_queue6.log 2>&1
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_rtf
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1

echo "=== queue6 start $(date -u +%H:%M:%S) ==="
if [ -f /tmp/queue5.pid ]; then
  while kill -0 "$(cat /tmp/queue5.pid)" 2>/dev/null; do sleep 30; done
fi
echo "=== queue5 done $(date -u +%H:%M:%S) ==="

for c in 3 7; do
  echo "--- config $c cold (cache warm-up, 5400s cap) $(date -u +%H:%M:%S) ---"
  timeout 5400 python -u bench.py --config "$c" > "/tmp/config${c}_cold.log" 2>&1
  echo "cold rc=$? $(date -u +%H:%M:%S)"
  grep -E "^AUX" "/tmp/config${c}_cold.log" | tail -2
  echo "--- config $c warm $(date -u +%H:%M:%S) ---"
  timeout 1800 python -u bench.py --config "$c" > "/tmp/config${c}_warm.log" 2>&1
  echo "warm rc=$? $(date -u +%H:%M:%S)"
  grep -E "^AUX" "/tmp/config${c}_warm.log" | tail -2
done
echo "=== queue6 done $(date -u +%H:%M:%S) ==="
