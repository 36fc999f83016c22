#!/bin/bash
# Round-5 holdout generalization stack (VERDICT r4 task 4): retrain the
# champion latent family on the 450-image train split (holdout_split seed 0)
# with the exact champion recipes, then score each operating point against
# BOTH splits with the evaluate_generalization protocol + NN panels.
# Run from /root/repo; sequential (one TPU process at a time).
set -e
OUT=/tmp/holdout32
mkdir -p $OUT
cd /root/repo

echo "=== 1/7 AE + latent DDPM (champion recipe, 450-image split)"
python -m igdm_tpu.cli.train --model latent --holdout 50 \
  --ae-epochs 400 --kl-weight 1e-2 --epochs 10000 --schedule cosine \
  --ema-decay 0.9995 --compute-dtype bfloat16 --epochs-per-dispatch 100 \
  --patience 100000 --out-dir $OUT > $OUT/ldm.log 2>&1
tail -1 $OUT/ldm.log

echo "=== 2/7 latent flow (450 split, shared AE)"
python -m igdm_tpu.cli.train --model flow --ae $OUT/ae_model.npz --holdout 50 \
  --epochs 10000 --ema-decay 0.9995 --compute-dtype bfloat16 \
  --epochs-per-dispatch 100 --patience 100000 --out-dir $OUT > $OUT/flow.log 2>&1
tail -1 $OUT/flow.log

echo "=== 3/7 latent reflow (teacher-only; no data)"
python -m igdm_tpu.cli.train --model reflow --teacher $OUT/latent_flow_model.npz \
  --epochs 200 --ema-decay 0.9995 --epochs-per-dispatch 10 \
  --patience 100000 --out-dir $OUT > $OUT/reflow.log 2>&1
tail -1 $OUT/reflow.log

echo "=== 4/7 LCM (distill the holdout LDM on the 450 split)"
python -m igdm_tpu.cli.train --model consistency --teacher $OUT/latent_model.npz \
  --holdout 50 --out-dir $OUT > $OUT/lcm.log 2>&1
tail -1 $OUT/lcm.log

echo "=== 5/7 score champion (ancestral-500) vs splits"
python -m igdm_tpu.utils.quality $OUT/latent_model.npz --holdout 50 --ema \
  --sampler textbook --panel artifacts/nn_panel_champion.png \
  > $OUT/q_champion.json 2>$OUT/q_champion.err
tail -2 $OUT/q_champion.err || true

echo "=== 6/7 score reflow-1 vs splits"
python -m igdm_tpu.utils.quality $OUT/reflow_model.npz --holdout 50 --ema \
  --ddim-steps 1 --panel artifacts/nn_panel_reflow1.png \
  > $OUT/q_reflow1.json 2>$OUT/q_reflow1.err
tail -2 $OUT/q_reflow1.err || true

echo "=== 7/7 score LCM-1 vs splits"
python -m igdm_tpu.utils.quality $OUT/consistency_model.npz --holdout 50 \
  --panel artifacts/nn_panel_lcm1.png \
  > $OUT/q_lcm1.json 2>$OUT/q_lcm1.err
tail -2 $OUT/q_lcm1.err || true

echo "=== done; reports in $OUT/q_*.json"
