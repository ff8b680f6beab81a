#!/bin/bash
# Round-2 follow-up measurements (run AFTER queue3):
# 1. Same-wall-clock comparison: the reference needed ~80 min for its 1500
#    NGP steps; ours trains ~21000 steps in that time. PSNR at equal time.
# 2. Eval the pooled-training checkpoint queue3 trains but never evals,
#    and redo pooled training with a warmup-aware switchover (step 400).
# 3. A longer vanilla run for the same table.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

timeout 7200 python -m learn_nerf_tpu.scripts.train_nerf --instant_ngp --batch_size 4096 --lr 1e-2 --seed 0 \
  --occupancy --occ_train_budget 12 --occ_train_budget_start 400 --steps 21000 \
  --save_path runs/ours_ngp_long.pkl runs/scene_train > runs/ours_ngp_long.log 2>&1
sleep 60
timeout 1800 python -m learn_nerf_tpu.scripts.eval_psnr --batch_size 4096 --instant_ngp --occupancy \
  --model_path runs/ours_ngp_long.pkl runs/scene_test > runs/eval_ours_ngp_long.log 2>&1
sleep 60
timeout 1800 python -m learn_nerf_tpu.scripts.eval_psnr --batch_size 4096 --instant_ngp --occupancy \
  --model_path runs/ours_ngp_pooled.pkl runs/scene_test > runs/eval_ours_ngp_pooled.log 2>&1
sleep 60
timeout 2400 python -m learn_nerf_tpu.scripts.train_nerf --batch_size 4096 --lr 1e-4 --seed 0 \
  --occupancy --steps 10000 \
  --save_path runs/ours_vanilla_long.pkl runs/scene_train > runs/ours_vanilla_long.log 2>&1
sleep 60
timeout 1800 python -m learn_nerf_tpu.scripts.eval_psnr --batch_size 4096 --occupancy \
  --model_path runs/ours_vanilla_long.pkl runs/scene_test > runs/eval_ours_vanilla_long.log 2>&1
timeout 1800 python tools/exp_fused_render.py runs/ours_vanilla.pkl \
  runs/scene_test/0000.json runs/scene_train/metadata.json 800 24 > runs/exp_fused2.log 2>&1
echo QUEUE4 DONE
