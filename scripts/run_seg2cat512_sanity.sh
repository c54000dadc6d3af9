#!/bin/bash
# Reference-capability seg2cat-shaped run: 512^2 output, nrr 128, all loss
# terms at the reference recipe's weights (`train_scripts/afhq_seg.sh`:
# gamma 5, random_c_prob 0.5, lambda_d_semantic 0.1, lambda_lpips 1,
# lambda_cross_view 1e-4, only_raw_recons, gen_pose_cond) on the 512^2
# synthetic seg dataset.  Deviations from the reference script, both
# documented: batch 8 instead of 4 (per-device batch 4 SIGABRTs XLA's
# space-to-batch pass, NOTES_PERF round 2) and --sampler frustum + remat
# (the TPU training mode; the gather parity sampler trains the same curves
# ~26x slower, NOTES_PERF round 3a).
set -e
cd "$(dirname "$0")/.."
KIMG="${KIMG:-4}"
exec python train.py --outdir .runs --cfg afhq \
    --data .data/synth512/imgs --mask_data .data/synth512/masks \
    --data_type seg --batch 8 --mbstd-group 4 --gamma 5 \
    --semantic_channels 6 --render_mask True --dis_mask True \
    --neural_rendering_resolution_initial 128 --gen_pose_cond True \
    --random_c_prob 0.5 --lambda_d_semantic 0.1 --lambda_lpips 1 \
    --lambda_cross_view 1e-4 --only_raw_recons True \
    --sampler frustum --remat True \
    --kimg "$KIMG" --tick 0.5 --snap 4 --seed 0 "$@"
