#!/bin/bash
# Migrate a reference-TF checkpoint into hdrnet_tpu Flax format
# (reference: scripts/upgrade.sh -> scripts/upgrade.py name-map).
model=$1
python -m hdrnet_tpu.utils.upgrade \
    output/chkpts_reference/$model output/upgraded/$model
