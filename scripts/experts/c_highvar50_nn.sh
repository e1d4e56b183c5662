#!/bin/bash
# MIT-Adobe FiveK expert C (highvar50 subset) (reference: scripts/experts/c_highvar50_nn.sh).
python -m hdrnet_tpu.bin.train \
        output/checkpoints/expertC_highvar50_256_nn_cm1 \
        data/expertC_highvar50/train/filelist.txt \
        --eval_data_dir data/expertC_highvar50/test/filelist.txt \
        --learning_rate 1e-4 \
        --batch_size 16 \
        --model_name HDRNetPointwiseNNGuide \
        --nobatch_norm \
        --output_resolution 256 256 \
        --channel_multiplier 1
