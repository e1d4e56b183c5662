#!/bin/bash
# FiveK expert B retouch (reference: scripts/experts/b_nn.sh).
python -m hdrnet_tpu.bin.train \
        output/checkpoints/expert_b_nn \
        data/fivek_expert_b/train/filelist.txt \
        --eval_data_dir data/fivek_expert_b/test/filelist.txt \
        --learning_rate 1e-4 --batch_size 16 \
        --model_name HDRNetPointwiseNNGuide --nobatch_norm \
        --output_resolution 512 512 --random_crop \
        --luma_bins 8 --spatial_bin 16
