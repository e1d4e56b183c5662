#!/bin/bash
# Photoshop-action operator 'eboye' (reference: scripts/ps/eboye_nn.sh).
python -m hdrnet_tpu.bin.train \
        output/checkpoints/ps_eboye_nn \
        data/ps_eboye/train/filelist.txt \
        --learning_rate 1e-4 --batch_size 16 \
        --model_name HDRNetPointwiseNNGuide --nobatch_norm \
        --output_resolution 512 512 --random_crop \
        --luma_bins 8 --spatial_bin 16
