#!/bin/bash
# Strong local Laplacian, Gaussian pyramid (fixed guide) (reference: scripts/ll_strong/train_gpyrnn.sh).
python -m hdrnet_tpu.bin.train \
        output/checkpoints/ll_strong_1024_gpyrnn \
        data/local_laplacian_2048/train/filelist.txt \
        --eval_data_dir data/local_laplacian_2048/test/filelist.txt \
        --learning_rate 1e-4 \
        --batch_size 4 \
        --model_name HDRNetGaussianPyr \
        --nobatch_norm \
        --output_resolution 1024 1024 \
        --luma_bins 8 \
        --spatial_bin 16 \
        --channel_multiplier 1
