#!/bin/bash
# Photoshop action "instagram1", pointwise-NN guide (reference: scripts/ps/instagram1_nn.sh).
python -m hdrnet_tpu.bin.train \
        output/checkpoints/ps_instagram1_1024 \
        data/photoshop_actions/instagram1_1024/train/filelist.txt \
        --eval_data_dir data/photoshop_actions/instagram1_1024/test/filelist.txt \
        --learning_rate 1e-4 \
        --batch_size 4 \
        --model_name HDRNetPointwiseNNGuide \
        --nobatch_norm \
        --output_resolution 512 512 \
        --luma_bins 8 \
        --spatial_bin 16 \
        --channel_multiplier 1
