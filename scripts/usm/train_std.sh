#!/bin/bash
# Unsharp-mask operator, synthetic targets (reference: scripts/usm/*.sh).
python -m hdrnet_tpu.bin.train \
        output/checkpoints/usm_std \
        data/imagenet_1024/train \
        --data_pipeline UnsharpMaskDataPipeline \
        --blur_sigma 4.0 --sharpen 1.0 \
        --learning_rate 1e-4 --batch_size 4 \
        --model_name HDRNetCurves --nobatch_norm \
        --output_resolution 1024 1024 \
        --luma_bins 8 --spatial_bin 16
