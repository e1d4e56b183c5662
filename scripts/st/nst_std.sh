#!/bin/bash
# Neural-style-transfer targets, curves model (reference: scripts/st/nst_std.sh).
python -m hdrnet_tpu.bin.train \
        output/checkpoints/nst_256_std_l8_s16_cm2 \
        data/style_transfer_n/train \
        --eval_data_dir data/style_transfer_n/test \
        --data_pipeline StyleTransferDataPipeline \
        --learning_rate 1e-4 \
        --batch_size 16 \
        --model_name StyleTransferCurves \
        --nobatch_norm \
        --output_resolution 256 256 \
        --luma_bins 8 \
        --spatial_bin 16 \
        --channel_multiplier 2
