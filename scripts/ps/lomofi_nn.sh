#!/bin/bash
# Photoshop action "lomo-fi", pointwise-NN guide (reference: scripts/ps/lomofi_nn.sh).
python -m hdrnet_tpu.bin.train \
        output/checkpoints/ps_lomo-fi_256 \
        data/photoshop_actions/lomo-fi/train/filelist.txt \
        --eval_data_dir data/photoshop_actions/lomo-fi/test/filelist.txt \
        --learning_rate 1e-4 \
        --batch_size 4 \
        --model_name HDRNetPointwiseNNGuide \
        --nobatch_norm \
        --output_resolution 256 256 \
        --luma_bins 8 \
        --spatial_bin 16 \
        --channel_multiplier 1
