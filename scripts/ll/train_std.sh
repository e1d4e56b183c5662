#!/bin/bash
# Local Laplacian, standard HDRNetCurves (reference: scripts/ll/train_std.sh).
# Device selection: JAX owns all local TPU chips; use --mesh_shape for DP.
luma=${LUMA:-8}; spatial=${SPATIAL:-16}; cm=${CM:-1}
python -m hdrnet_tpu.bin.train \
        output/checkpoints/ll_2048_std_l${luma}_s${spatial}_cm${cm} \
        data/local_laplacian_hl_2048/train/filelist.txt \
        --eval_data_dir data/local_laplacian_hl_2048/test/filelist.txt \
        --learning_rate 1e-4 --batch_size 1 \
        --model_name HDRNetCurves --nobatch_norm \
        --output_resolution 2048 2048 \
        --luma_bins $luma --spatial_bin $spatial --channel_multiplier $cm
