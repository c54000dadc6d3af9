#!/bin/bash
# The round-3 16-kimg recipe (NOTES_PERF round 3a): seg2cat loss recipe at
# 128^2 output / nrr 64 on the synthetic seg dataset.  Produces the trained
# checkpoint the serving quality gates (scripts/eval_frustum_quality.py) and
# the app artifacts run against.  Reference recipe weights per
# train_scripts/afhq_seg.sh (gamma 5, random_c_prob 0.5, lambda_d_semantic
# 0.1, lambda_lpips 1, lambda_cross_view 1e-4, only_raw_recons,
# gen_pose_cond); batch 8 instead of 4 (XLA space-to-batch SIGABRT at
# per-device batch 4, NOTES_PERF round 2) and --sampler frustum + remat
# (the TPU training mode, 26x the gather parity sampler).
set -e
cd "$(dirname "$0")/.."
KIMG="${KIMG:-8}"
exec python train.py --outdir .runs --cfg afhq \
    --data .data/synth/imgs --mask_data .data/synth/masks \
    --data_type seg --batch 8 --mbstd-group 4 --gamma 5 \
    --semantic_channels 6 --render_mask True --dis_mask True \
    --neural_rendering_resolution_initial 64 --gen_pose_cond True \
    --random_c_prob 0.5 --lambda_d_semantic 0.1 --lambda_lpips 1 \
    --lambda_cross_view 1e-4 --only_raw_recons True \
    --sampler frustum --remat True \
    --kimg "$KIMG" --tick 0.5 --snap 4 --seed 0 "$@"
