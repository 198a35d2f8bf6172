#!/bin/bash
# Round-5 chip queue, part 2 (single tunneled TPU — serialize everything).
# Runs after the bench.py --all pass (PID in /tmp/bench_all.pid):
#   1. denoiser training pairs (5 scene groups) + retrain (VERDICT item 9)
#   2. pinned converged goldens for the strands/canopy eval scenes
#   3. config-4 knob sweep incl. the visit-axis window (VERDICT item 4)
#   4. headline A/B of the visit-axis window (RTF_TPU_SEG_VDEPTH)
#   5. instanced-engine bench at denormalized-infeasible scale (item 7)
set -u
cd /root/repo
exec >> /tmp/chip_queue5.log 2>&1
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_rtf
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1

echo "=== queue5 start $(date -u +%H:%M:%S) ==="
if [ -f /tmp/bench_all.pid ]; then
  while kill -0 "$(cat /tmp/bench_all.pid)" 2>/dev/null; do sleep 30; done
fi
echo "=== bench --all done $(date -u +%H:%M:%S) ==="
tail -4 /tmp/bench_all.log

for g in 0 1 2 3 4; do
  echo "--- denoiser pairs group $g $(date -u +%H:%M:%S) ---"
  timeout 2400 python -u scripts/train_denoiser.py --render "$g" | tail -2
  echo "group $g rc=$?"
done

echo "--- denoiser train $(date -u +%H:%M:%S) ---"
timeout 3600 python -u scripts/train_denoiser.py 2>&1 | tail -8
echo "train rc=$?"

echo "--- goldens strands+canopy $(date -u +%H:%M:%S) ---"
timeout 3000 python -u scripts/render_denoiser_golden.py strands canopy | tail -4
echo "goldens rc=$?"

echo "--- config4 sweep $(date -u +%H:%M:%S) ---"
python -u scripts/sweep_config4.py baseline vdepth2 vdepth3 vdepth4 \
  vdepth3_group16 group16 dbits1 subiv2
echo "sweep rc=$?"
tail -12 /tmp/sweep_config4.log

echo "--- headline vdepth A/B $(date -u +%H:%M:%S) ---"
python -u scripts/sweep_seg.py baseline vdepth1 vdepth2
tail -4 /tmp/sweep_seg.log

echo "--- instanced bench 1024 x 262144 $(date -u +%H:%M:%S) ---"
timeout 2400 python -u scripts/bench_instanced.py | tail -8
echo "instanced rc=$?"
echo "=== queue5 done $(date -u +%H:%M:%S) ==="
