#!/bin/bash
# Round-5 chip queue, final: measurements only the chip can produce,
# ordered by value; denoiser training last (its suite gate has a
# CPU-side fallback: evaluate + honest gates). Hard deadline keeps the
# chip free for the driver's end-of-round bench.
set -u
cd /root/repo
exec >> /tmp/chip_queue8.log 2>&1
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_rtf
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1

NOW=$(date +%s)
DEADLINE=$((NOW + 62 * 60))
left() { echo $(( (DEADLINE - $(date +%s)) / 60 )); }
gate() {
  m=$(left)
  if [ "$m" -lt "$1" ]; then
    echo "SKIP $2: only ${m}m left (< $1m)"; return 1
  fi
  echo "--- $2 ($(date -u +%H:%M:%S), ${m}m left) ---"; return 0
}

echo "=== queue8 start $(date -u +%H:%M:%S), deadline in $(left)m ==="
# wait for the in-flight goldens render (from queue7)
while ps -p 24391 > /dev/null 2>&1; do sleep 10; done
echo "goldens done $(date -u +%H:%M:%S)"
ls -la tests/goldens/denoiser_clean_*.npy

if gate 14 "headline vdepth A/B"; then
  python -u scripts/sweep_seg.py vdepth1 vdepth2
  tail -3 /tmp/sweep_seg.log
fi

if gate 12 "config4 sweep (vdepth + group16)"; then
  python -u scripts/sweep_config4.py baseline vdepth2 vdepth3 group16
  echo "sweep rc=$?"
  tail -6 /tmp/sweep_config4.log
fi

if gate 8 "config6 (1M tri) after SMEM fix"; then
  timeout 600 python -u bench.py --config 6 > /tmp/config6_fix.log 2>&1
  echo "config6 rc=$?"
  tail -2 /tmp/config6_fix.log
fi

if gate 10 "instanced bench"; then
  timeout 700 python -u scripts/bench_instanced.py 2>&1 | tail -8
  echo "instanced rc=$?"
fi

if gate 12 "denoiser train (reduced steps)"; then
  M=$(left)
  B=$(( M > 28 ? 25 : M - 4 ))
  RTF_DENOISER_STEPS=2500 timeout $(( B * 60 )) \
    python -u scripts/train_denoiser.py 2>&1 | tail -8
  echo "train rc=$?"
fi

echo "=== queue8 done $(date -u +%H:%M:%S), $(left)m to deadline ==="
