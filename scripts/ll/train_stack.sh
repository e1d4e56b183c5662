#!/bin/bash
# Local Laplacian, HDRNetStack (reference: scripts/ll/train_stack.sh).
python -m hdrnet_tpu.bin.train \
        output/checkpoints/ll_2048_stack \
        data/local_laplacian_hl_2048/train/filelist.txt \
        --eval_data_dir data/local_laplacian_hl_2048/test/filelist.txt \
        --learning_rate 1e-4 --batch_size 1 \
        --model_name HDRNetStack --nobatch_norm \
        --output_resolution 2048 2048 \
        --luma_bins 8 --spatial_bin 16 --channel_multiplier 1
