#!/bin/bash
# Round-4 queue v5a — perf probes, run right after queue v4's
# runtimes-@1024 leg (v4 is killed before its pyramid leg so the tail
# can be re-ordered around two product fixes landed mid-round):
#   * exp_downsample_batch: validates the px-bf16 slab fix on real
#     hardware BEFORE the driver's BENCH_r04 capture, and answers
#     VERDICT item 6 (batch-4 regression) with per-variant stage data.
#   * exp_guide_fma: measured prototype for the maxfma curves guide
#     (VERDICT item 10); its printed VERDICT line gates flipping the
#     serving default.
# Queue v5b (usm retrain -> final bench -> adaptive pyramid ->
# consolidate) launches after the flip decision.
set -x
cd "$(dirname "$0")/../.."

# Clean re-measure of the batch probe: the first capture
# (results/exp_batch_r4_contended.txt) shared the chip with a stale
# queue from the previous session.
if [ ! -s results/exp_batch_r4.txt ]; then
  timeout 1000 python scripts/exp_batch.py > results/exp_batch_r4.txt \
    2>&1 || true
  tail -10 results/exp_batch_r4.txt
fi

if [ ! -s results/exp_downsample_batch.txt ]; then
  timeout 1300 python scripts/exp_downsample_batch.py \
    > results/exp_downsample_batch.txt 2>&1 || true
  tail -12 results/exp_downsample_batch.txt
fi

if [ ! -s results/exp_guide_fma.txt ]; then
  timeout 1000 python scripts/exp_guide_fma.py \
    > results/exp_guide_fma.txt 2>&1 || true
  tail -8 results/exp_guide_fma.txt
fi
echo QUEUE5A_DONE
