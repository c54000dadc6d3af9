#!/bin/bash
# Edge-conditioned (edge2car-shaped) end-to-end sanity run — VERDICT round-2
# item 7.  Mirrors the reference recipe `train_scripts/shapenet_edge.sh`
# (gamma 0.3, random_c_prob 0.5, lambda_d_semantic 0.1, lambda_lpips 1,
# lambda_cross_view 1e-6, edge_weight 10, geometry_layer 9, data_type=edge,
# render_mask+dis_mask) on the synthetic shapenet-geometry edge dataset
# (scripts/make_synth_dataset.py --cfg shapenet --edge: radius-1.7 full-orbit
# cameras, white background, box_warp 1.6, 128^2) at batch 8 (the per-device
# batch-4 XLA space-to-batch crash workaround, NOTES_PERF round 2) for a
# short multi-tick run.  semantic_channels=1: the released edge2car models
# render a 1-channel edge map with sigmoid decoding (ref
# triplane_cond.py:758 gates sigmoid on semantic_channels==1).
#
# Sampler: gather (reference parity).  The frustum fast path's calibrated
# windows assume the seg2cat S=256/box_warp=1 geometry and would fall back
# to the (uneconomical) full contraction here.
set -e
cd "$(dirname "$0")/.."
KIMG="${KIMG:-2}"
exec python train.py --outdir .runs --cfg shapenet \
    --data .data/synth_edge/imgs --mask_data .data/synth_edge/edges \
    --data_type edge --render_mask True --dis_mask True \
    --batch 8 --mbstd-group 4 --gamma 0.3 \
    --random_c_prob 0.5 --lambda_d_semantic 0.1 --lambda_lpips 1 \
    --lambda_cross_view 1e-6 --edge_weight 10 --geometry_layer 9 \
    --semantic_channels 1 --neural_rendering_resolution_initial 64 \
    --kimg "$KIMG" --tick 0.25 --snap 4 --seed 0 "$@"
