#!/bin/bash
# Face-brightening operator (reference: scripts/faces/train_nn.sh).
python -m hdrnet_tpu.bin.train \
        output/checkpoints/faces_nn \
        data/faces/train/filelist.txt \
        --learning_rate 1e-4 --batch_size 16 \
        --model_name HDRNetPointwiseNNGuide --nobatch_norm \
        --output_resolution 512 512 --random_crop \
        --luma_bins 8 --spatial_bin 16
