#!/bin/bash
# Quality-parity reproduction (PARITY.md "Quality parity"): procedural
# local-laplacian workload -> train HDRNetCurves l8/s16 with cosine decay
# -> standalone eval + per-image oracle upper bound.
# (The reference's local_laplacian_hl dataset is not distributable; this
# generates the equivalent operator workload, scripts/make_ll_dataset.py.)
set -e
DATA=${DATA:-data_ll}
CKPT=${CKPT:-output/ll_l8s16_cos}
python scripts/make_ll_dataset.py "$DATA" --n_train 220 --n_test 24 --size 1024
python -m hdrnet_tpu.bin.train "$CKPT" "$DATA/train" \
        --eval_data_dir "$DATA/test" \
        --batch_size 4 --output_resolution 1024 1024 \
        --fliplr --flipud --rotate --norandom_crop \
        --cache_images --device_normalize --device_data \
        --learning_rate 1e-4 --lr_schedule cosine --lr_end 1e-6 \
        --lr_warmup_steps 500 --max_steps 120000
python -m hdrnet_tpu.bin.evaluate "$CKPT" "$DATA/test" --json "$CKPT/eval_test.json"
python -m hdrnet_tpu.bin.fit_grid "$DATA/test" --limit 8 --json "$CKPT/oracle_test.json"
