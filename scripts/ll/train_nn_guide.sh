#!/bin/bash
# Local Laplacian, HDRNetPointwiseNNGuide (reference: scripts/ll/train_nn_guide.sh).
python -m hdrnet_tpu.bin.train \
        output/checkpoints/ll_2048_nn_guide \
        data/local_laplacian_hl_2048/train/filelist.txt \
        --eval_data_dir data/local_laplacian_hl_2048/test/filelist.txt \
        --learning_rate 1e-4 --batch_size 1 \
        --model_name HDRNetPointwiseNNGuide --nobatch_norm \
        --output_resolution 2048 2048 \
        --luma_bins 8 --spatial_bin 16 --channel_multiplier 1
