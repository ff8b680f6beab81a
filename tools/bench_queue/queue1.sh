#!/bin/bash
# Matched-PSNR benchmark queue (BASELINE.md configs 2-3): reference vs ours,
# vanilla + NGP, 1500 steps x batch 4096 on the 400x400 compound STL scene,
# then PSNR on 8 held-out views. ONE python at a time (single TPU chip);
# sleep between jobs so the chip releases.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p runs

timeout 2400 python tools/train_reference.py --batch_size 4096 --steps 1500 --lr 1e-4 \
  --save_path runs/ref_vanilla.pkl runs/scene_train > runs/ref_vanilla.log 2>&1
sleep 60
timeout 2400 python -m learn_nerf_tpu.scripts.train_nerf --batch_size 4096 --lr 1e-4 --seed 0 \
  --occupancy --steps 1500 --save_path runs/ours_vanilla.pkl runs/scene_train > runs/ours_vanilla.log 2>&1
sleep 60
timeout 3000 python -m learn_nerf_tpu.scripts.train_nerf --instant_ngp --batch_size 4096 --lr 1e-2 --seed 0 \
  --occupancy --steps 1500 --save_path runs/ours_ngp.pkl runs/scene_train > runs/ours_ngp.log 2>&1
sleep 60
timeout 7200 python tools/train_reference.py --instant_ngp --batch_size 4096 --steps 1500 --lr 1e-2 \
  --save_path runs/ref_ngp.pkl runs/scene_train > runs/ref_ngp.log 2>&1
sleep 60
timeout 1800 python -m learn_nerf_tpu.scripts.eval_psnr --batch_size 4096 \
  --model_path runs/ref_vanilla.pkl runs/scene_test > runs/eval_ref_vanilla.log 2>&1
sleep 60
timeout 1800 python -m learn_nerf_tpu.scripts.eval_psnr --batch_size 4096 --occupancy \
  --model_path runs/ours_vanilla.pkl runs/scene_test > runs/eval_ours_vanilla.log 2>&1
sleep 60
timeout 1800 python -m learn_nerf_tpu.scripts.eval_psnr --batch_size 4096 --instant_ngp \
  --model_path runs/ref_ngp.pkl runs/scene_test > runs/eval_ref_ngp.log 2>&1
sleep 60
timeout 1800 python -m learn_nerf_tpu.scripts.eval_psnr --batch_size 4096 --instant_ngp --occupancy \
  --model_path runs/ours_ngp.pkl runs/scene_test > runs/eval_ours_ngp.log 2>&1
echo QUEUE1 DONE
