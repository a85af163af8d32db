#!/usr/bin/env bash
# End-to-end recipe (mirrors the reference's shell/Template-shell.sh flow):
# train, sample the test set, then compute metrics over the outputs.
set -euo pipefail

CONFIG=configs/Template-LBBDM-f4.yaml
RESULT=results
RUN="$RESULT/dataset_name/LBBDM-f4"

# 1) train
python main.py -c "$CONFIG" --train --sample_at_start --save_top -r "$RESULT"

# 2) sample the test set with the best checkpoint
python main.py -c "$CONFIG" --sample_to_eval -r "$RESULT" \
    --resume_model "$RUN"/checkpoint/top_model_epoch_*.ckpt

# 3) metrics (FID needs BBDM_FID_WEIGHTS; LPIPS needs BBDM_LPIPS_WEIGHTS)
EVAL="$RUN/sample_to_eval"
python preprocess_and_evaluation.py -f rename_samples -r "$EVAL" -s 200 -t renamed
python preprocess_and_evaluation.py -f rename_samples -r "$EVAL" -s ground_truth -t gt_renamed
python preprocess_and_evaluation.py -f FID -s "$EVAL/200" -t "$EVAL/ground_truth"
python preprocess_and_evaluation.py -f LPIPS -s "$EVAL/renamed" -t "$EVAL/gt_renamed" -n 5
python preprocess_and_evaluation.py -f diversity -s "$EVAL/renamed" -n 5
