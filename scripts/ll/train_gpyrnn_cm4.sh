#!/bin/bash
# Local Laplacian, Gaussian-pyramid NN guide, 4x channels (reference: scripts/ll/train_gpyrnn_cm4.sh).
python -m hdrnet_tpu.bin.train \
        output/checkpoints/ll_2048_gpyrnn_l8_s16_cm4 \
        data/local_laplacian_hl_2048/train/filelist.txt \
        --eval_data_dir data/local_laplacian_hl_2048/test/filelist.txt \
        --learning_rate 1e-4 \
        --batch_size 1 \
        --model_name HDRNetGaussianPyrNN \
        --nobatch_norm \
        --output_resolution 2048 2048 \
        --luma_bins 8 \
        --spatial_bin 16 \
        --channel_multiplier 4
