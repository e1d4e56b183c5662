#!/bin/bash
# Local Laplacian (1024 data), pointwise-NN guide (reference: scripts/ll/train_nn_1024.sh).
python -m hdrnet_tpu.bin.train \
        output/checkpoints/ll_1024_nn_cm1 \
        data/local_laplacian_hl_1024/train/filelist.txt \
        --eval_data_dir data/local_laplacian_hl_1024/test/filelist.txt \
        --learning_rate 1e-4 \
        --batch_size 4 \
        --model_name HDRNetPointwiseNNGuide \
        --nobatch_norm \
        --output_resolution 512 512 \
        --channel_multiplier 1
