#!/bin/bash
# FiveK expert C retouch (reference: scripts/experts/c_nn.sh).
python -m hdrnet_tpu.bin.train \
        output/checkpoints/expert_c_nn \
        data/fivek_expert_c/train/filelist.txt \
        --eval_data_dir data/fivek_expert_c/test/filelist.txt \
        --learning_rate 1e-4 --batch_size 16 \
        --model_name HDRNetPointwiseNNGuide --nobatch_norm \
        --output_resolution 512 512 --random_crop \
        --luma_bins 8 --spatial_bin 16
