#!/bin/bash
# Round-5 overtime queue: config-4 sweep -> denoiser retrain -> eval
# -> canopy golden retry. Serial on the single chip.
set -u
cd /root/repo
exec >> /tmp/chip_queue9.log 2>&1
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_rtf
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1

echo "=== queue9 start $(date -u +%H:%M:%S) ==="
echo "--- config4 sweep ---"
timeout 2400 python -u scripts/sweep_config4.py baseline vdepth2 vdepth3 group16
echo "sweep rc=$?"
tail -8 /tmp/sweep_config4.log

echo "--- denoiser train $(date -u +%H:%M:%S) ---"
RTF_DENOISER_STEPS=3000 timeout 2400 python -u scripts/train_denoiser.py 2>&1 | tail -8
echo "train rc=$?"

echo "--- denoiser eval gate $(date -u +%H:%M:%S) ---"
timeout 900 python -m pytest tests/test_denoiser_quality.py -q -p no:cacheprovider 2>&1 | tail -6
echo "eval rc=$?"

echo "--- canopy golden retry $(date -u +%H:%M:%S) ---"
timeout 2400 python -u scripts/render_denoiser_golden.py canopy | tail -3
echo "golden rc=$?"
echo "=== queue9 done $(date -u +%H:%M:%S) ==="
