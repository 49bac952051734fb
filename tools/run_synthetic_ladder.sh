#!/bin/bash
# One-command synthetic quality-ladder pipeline (VERDICT r1 #6):
#   1. dump refining records from tracked detections on TRAIN-seed scenes
#   2. train per-class GRM / PRM / CRM (reference: one model per class)
#   3. run the 4-stage ladder on HELD-OUT scenes and append LADDER.md
#
# Usage: tools/run_synthetic_ladder.sh <det_ckpt_dir> [<det_cfg>] [<workdir>]
set -e
CKPT=${1:?usage: run_synthetic_ladder.sh <det_ckpt_dir> [cfg] [workdir]}
CFG=${2:-configs/det_model_cfgs/centerpoint_synthetic_big.yaml}
WORK=${3:-output/ladder}
TRAIN_SEQ=${TRAIN_SEQ:-24}
VAL_SEQ=${VAL_SEQ:-8}
REFINE_STEPS=${REFINE_STEPS:-1500}
# Detector-inference phases (dump + eval) platform. "cpu" is the data-free
# default; on a live-TPU box set DET_PLATFORM="" to ride the tunnel — the
# r4 CPU dump cost ~46 s/frame (4h56 for 384 frames) vs ~1-2 s/frame on v5e
# (jitted predict + per-call tunnel dispatch). Host-side phases (tracking,
# record extraction, refiner training, CRM relabel) stay on CPU either way.
DET_PLATFORM=${DET_PLATFORM-cpu}
PLAT_ARGS=()
[ -n "$DET_PLATFORM" ] && PLAT_ARGS=(--platform "$DET_PLATFORM")
cd "$(dirname "$0")/.."

# DET_BATCH=1 on TPU: the batch-1 predict graph (unbatched plan build) is
# the bench-validated, compile-cached path; the vmapped batch-4 eval graph
# hit a pathological >30-min remote compile on v5e.
DET_BATCH=${DET_BATCH:-4}

echo "== 1/3: refining records from ${TRAIN_SEQ} train sequences"
python tools/ladder_synthetic.py --cfg_file "$CFG" --ckpt "$CKPT" \
    "${PLAT_ARGS[@]}" --batch_size "$DET_BATCH" \
    --make_refine_data "$WORK/refine_data" \
    --n_seq "$TRAIN_SEQ"

echo "== 2/3: per-class GRM/PRM/CRM training (${REFINE_STEPS} steps each)"
ARGS=()
for stage in grm prm crm; do
  if [ "$stage" = crm ]; then
    # CRM labels = IoU of the GRM/PRM-REFINED boxes vs GT (reference
    # generate_iou_gt.py: CRM must score the boxes it sees at inference,
    # so it trains only after GRM/PRM exist)
    echo "== 2b: relabel CRM iou_gt with refined boxes"
    python tools/ladder_synthetic.py --cfg_file "$CFG" --ckpt "$CKPT" \
        --platform cpu --relabel_crm "$WORK/refine_data" "${ARGS[@]}"
  fi
  ARGS+=("--${stage}")
  for cls in Vehicle Pedestrian Cyclist; do
    python tools/train_refine.py \
      --cfg_file "configs/ref_model_cfgs/synthetic_${stage}.yaml" \
      --platform cpu --output_dir "$WORK/models" \
      --extra_tag "$cls" --max_steps "$REFINE_STEPS" --batch_size 4 \
      --set DATA_PATH "$WORK/refine_data" CLASS_NAME "$cls" \
      | tail -2
    # all classes ride ONE --<stage> occurrence (argparse nargs=* would
    # keep only the last repeated flag)
    ARGS+=("${cls}=configs/ref_model_cfgs/synthetic_${stage}.yaml:$WORK/models/synthetic_${stage}/${cls}/ckpt")
  done
done

echo "== 3/3: 4-stage ladder on ${VAL_SEQ} held-out sequences"
python tools/ladder_synthetic.py --cfg_file "$CFG" --ckpt "$CKPT" \
    "${PLAT_ARGS[@]}" --batch_size "$DET_BATCH" \
    --n_seq "$VAL_SEQ" --val_seed 1234 "${ARGS[@]}"
echo "ladder table appended to LADDER.md"
