#!/bin/bash
# Round-5 chip queue, part 4 (replaces queue5/queue6 remainders with a
# deadline-aware, priority-ordered agenda for the last ~1.5h of round).
# Priority: suite-green chain first (eval goldens -> denoiser retrain ->
# eval gate), then the headline vdepth A/B, then the config-4 sweep,
# then optional items. Each step checks the deadline so the chip is
# free for the driver's end-of-round bench.
set -u
cd /root/repo
exec >> /tmp/chip_queue7.log 2>&1
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_rtf
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1

DEADLINE=$(date -d "01:25 tomorrow" +%s 2>/dev/null)
# robust fallback: now + 85 minutes
NOW=$(date +%s)
ALT=$((NOW + 85 * 60))
if [ -z "$DEADLINE" ] || [ "$DEADLINE" -gt $((NOW + 7200)) ]; then
  DEADLINE=$ALT
fi
left() { echo $(( (DEADLINE - $(date +%s)) / 60 )); }
gate() {  # gate <min-minutes-needed> <label>
  m=$(left)
  if [ "$m" -lt "$1" ]; then
    echo "SKIP $2: only ${m}m left (< $1m)"; return 1
  fi
  echo "--- $2 ($(date -u +%H:%M:%S), ${m}m left) ---"; return 0
}

echo "=== queue7 start $(date -u +%H:%M:%S), deadline in $(left)m ==="

# wait for the in-flight group-4 pair render (orphaned from queue5)
if ps -p 22083 > /dev/null 2>&1; then
  echo "waiting on in-flight group-4 render (pid 22083)"
  while ps -p 22083 > /dev/null 2>&1; do sleep 15; done
fi
echo "group-4 render done $(date -u +%H:%M:%S)"

if gate 20 "goldens strands+canopy (suite-green prerequisite)"; then
  timeout 2100 python -u scripts/render_denoiser_golden.py strands canopy | tail -6
  echo "goldens rc=$?"
fi

if gate 12 "denoiser train (checkpoints every 500 steps)"; then
  M=$(left)
  B=$(( M > 35 ? 30 : M - 8 ))
  timeout $(( B * 60 )) python -u scripts/train_denoiser.py 2>&1 | tail -10
  echo "train rc=$?"
fi

if gate 8 "denoiser eval gate on chip"; then
  timeout 900 python -m pytest tests/test_denoiser_quality.py -q 2>&1 | tail -8
  echo "eval rc=$?"
fi

if gate 18 "headline vdepth A/B"; then
  python -u scripts/sweep_seg.py vdepth1 vdepth2
  tail -4 /tmp/sweep_seg.log
fi

if gate 15 "config4 sweep (trimmed)"; then
  python -u scripts/sweep_config4.py baseline vdepth2 vdepth3 group16
  echo "sweep rc=$?"
  tail -8 /tmp/sweep_config4.log
fi

if gate 12 "config6 (1M tri) after SMEM fix"; then
  timeout 700 python -u bench.py --config 6 > /tmp/config6_fix.log 2>&1
  echo "config6 rc=$?"
  tail -3 /tmp/config6_fix.log
fi

if gate 15 "instanced bench 1024 x 262144"; then
  timeout 900 python -u scripts/bench_instanced.py | tail -8
  echo "instanced rc=$?"
fi

echo "=== queue7 done $(date -u +%H:%M:%S), $(left)m to deadline ==="
