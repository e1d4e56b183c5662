#!/bin/bash
# HDR+ 16-bit linear input -> finished photo (reference: scripts/hdrp/train_nn.sh).
python -m hdrnet_tpu.bin.train \
        output/checkpoints/hdrp_nn \
        data/hdrp/train/filelist.txt \
        --data_pipeline HDRpDataPipeline \
        --learning_rate 1e-4 --batch_size 16 \
        --model_name HDRNetPointwiseNNGuide --nobatch_norm \
        --output_resolution 512 512 --random_crop \
        --luma_bins 8 --spatial_bin 16
