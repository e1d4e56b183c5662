#!/bin/bash
# Unsharp-mask synthetic-target workload, HDRNetFeaturesPyrNN
# (reference: scripts/usm/train_fpyrnn.sh). Usage: train_fpyrnn.sh <blur_sigma> <sharpen>.
blur=${1:-4}
sharpen=${2:-1}
python -m hdrnet_tpu.bin.train \
        output/checkpoints/usm_fpyrnn_radius${blur}_sharpen${sharpen} \
        data/local_laplacian_hl_2048/train/filelist.txt \
        --eval_data_dir data/local_laplacian_hl_2048/test/filelist.txt \
        --data_pipeline UnsharpMaskDataPipeline \
        --blur_sigma $blur --sharpen $sharpen \
        --learning_rate 1e-4 --batch_size 1 \
        --model_name HDRNetFeaturesPyrNN --nobatch_norm \
        --output_resolution 2048 2048
