#!/bin/bash
# MIT-Adobe FiveK expert C (random250 subset) (reference: scripts/experts/c_random250_nn.sh).
python -m hdrnet_tpu.bin.train \
        output/checkpoints/expertC_random250_256_nn_cm1 \
        data/expertC_random250/train/filelist.txt \
        --eval_data_dir data/expertC_random250/test/filelist.txt \
        --learning_rate 1e-4 \
        --batch_size 16 \
        --model_name HDRNetPointwiseNNGuide \
        --nobatch_norm \
        --output_resolution 256 256 \
        --channel_multiplier 1
