#!/bin/bash
# Style transfer, pointwise-NN guide (reference: scripts/st/st_nn.sh).
python -m hdrnet_tpu.bin.train \
        output/checkpoints/st_1024_nn_cm2 \
        data/style_transfer_1024/train/filelist.txt \
        --eval_data_dir data/style_transfer_1024/test/filelist.txt \
        --learning_rate 1e-4 \
        --batch_size 16 \
        --model_name HDRNetPointwiseNNGuide \
        --nobatch_norm \
        --output_resolution 512 512 \
        --channel_multiplier 2
