#!/bin/bash
# TPU work queue for the next live-tunnel session (r3 lost the tunnel at
# ~18:10 on 2026-08-17; everything below is ready to run in order).
# Check first: ps aux | grep tpu_init  — if empty, the tunnel is down.
set -x
cd "$(dirname "$0")/.."

# 1. warm .jax_cache + headline number (driver contract; ~5 min warm)
timeout 2400 python bench.py

# 2. train-step number (custom-VJP pallas backward path)
BENCH_TRAIN=1 BENCH_SCAN=4 timeout 3000 python bench.py

# 3. kernel variants: sliding-window DMA + fused eval epilogue (flip the
#    defaults in ops/pallas_pillar.py / backbone3d_pallas.py if they win)
BISECT_ONLY=pallas_conv_l0 BISECT_SCAN=64 timeout 1800 \
    python tools/bisect_perf.py micro
DETZERO_SLIDING_CONV=1 BISECT_ONLY=pallas_conv_l0 BISECT_SCAN=64 \
    timeout 1800 python tools/bisect_perf.py micro
DETZERO_FUSED_EVAL=1 BENCH_BUDGET_S=1800 timeout 2400 python bench.py
DETZERO_FUSED_EVAL=1 DETZERO_SLIDING_CONV=1 BENCH_BUDGET_S=1800 \
    timeout 2400 python bench.py

# 4. batch scaling (r2: batch 4 kernel-faulted, batch 2 ran 2.9x — retest
#    with the pallas backend)
GRAFT_BATCH=2 BENCH_BUDGET_S=1800 timeout 2400 python bench.py
GRAFT_BATCH=4 BENCH_BUDGET_S=1800 timeout 2400 python bench.py

# 5. per-stage table refresh (+ the fused-graph overhead measurement:
#    forward vs voxelize_plan + backbone_head)
BENCH_STAGES=1 timeout 2400 python bench.py

# 6. v3 ladder: train the occlusion-generator detector (~2.5 h), then the
#    CPU refining stages + held-out ladder
python tools/train_det.py \
    --cfg_file configs/det_model_cfgs/centerpoint_synthetic_v3.yaml \
    --extra_tag r4 --steps_per_call 25
# tools/run_synthetic_ladder.sh output/centerpoint_synthetic_v3/r4/ckpt \
#     configs/det_model_cfgs/centerpoint_synthetic_v3.yaml
