#!/bin/bash
# Neural-style-transfer distillation (reference: scripts/st/nst_*.sh).
python -m hdrnet_tpu.bin.train \
        output/checkpoints/st_nn \
        data/style_transfer \
        --data_pipeline StyleTransferDataPipeline \
        --learning_rate 1e-4 --batch_size 4 \
        --model_name StyleTransferNN --nobatch_norm \
        --output_resolution 512 512 --random_crop \
        --luma_bins 8 --spatial_bin 16
