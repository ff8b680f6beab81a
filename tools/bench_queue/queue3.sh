#!/bin/bash
# Remaining round-2 measurement queue: reference NGP train (long), all four
# PSNR evals, bench headlines, frame/fused timing sweeps, pooled-training
# throughput, and the Ref-NeRF shiny-scene convergence run.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

timeout 9000 python tools/train_reference.py --instant_ngp --batch_size 4096 --steps 1500 --lr 1e-2 \
  --save_path runs/ref_ngp.pkl runs/scene_train > runs/ref_ngp.log 2>&1
sleep 60
timeout 1800 python -m learn_nerf_tpu.scripts.eval_psnr --batch_size 4096 \
  --model_path runs/ref_vanilla.pkl runs/scene_test > runs/eval_ref_vanilla.log 2>&1
sleep 60
timeout 1800 python -m learn_nerf_tpu.scripts.eval_psnr --batch_size 4096 --occupancy \
  --model_path runs/ours_vanilla.pkl runs/scene_test > runs/eval_ours_vanilla.log 2>&1
sleep 60
timeout 2400 python -m learn_nerf_tpu.scripts.eval_psnr --batch_size 4096 --instant_ngp \
  --model_path runs/ref_ngp.pkl runs/scene_test > runs/eval_ref_ngp.log 2>&1
sleep 60
timeout 2400 python -m learn_nerf_tpu.scripts.eval_psnr --batch_size 4096 --instant_ngp --occupancy \
  --model_path runs/ours_ngp.pkl runs/scene_test > runs/eval_ours_ngp.log 2>&1
sleep 60
timeout 1500 python bench.py > runs/bench_r2.log 2>&1
sleep 60
BENCH_MODE=parity timeout 1500 python bench.py > runs/bench_r2_parity.log 2>&1
sleep 60
# Pooled-compaction training throughput once the grid culls (real scene).
timeout 1800 python -m learn_nerf_tpu.scripts.train_nerf --instant_ngp --batch_size 4096 \
  --lr 1e-2 --seed 0 --occupancy --occ_train_budget 12 --occ_train_budget_start 150 \
  --steps 700 --save_path runs/ours_ngp_pooled.pkl runs/scene_train > runs/ours_ngp_pooled.log 2>&1
sleep 60
timeout 2400 python tools/exp_frame_render.py runs/ours_ngp.pkl \
  runs/scene_test/0000.json runs/scene_train/metadata.json > runs/exp_frame.log 2>&1
sleep 60
timeout 1800 python tools/exp_fused_render.py runs/ours_vanilla.pkl \
  runs/scene_test/0000.json runs/scene_train/metadata.json 800 24 > runs/exp_fused.log 2>&1
sleep 60
timeout 4500 python -m learn_nerf_tpu.scripts.train_nerf --ref_nerf --batch_size 4096 \
  --lr 1e-4 --seed 0 --occupancy --steps 2000 \
  --save_path runs/refnerf_shiny.pkl runs/scene_shiny_train > runs/refnerf_shiny.log 2>&1
sleep 60
timeout 2400 python -m learn_nerf_tpu.scripts.eval_psnr --batch_size 4096 --ref_nerf --occupancy \
  --model_path runs/refnerf_shiny.pkl runs/scene_shiny_test > runs/eval_refnerf.log 2>&1
sleep 60
timeout 1200 python -m learn_nerf_tpu.scripts.render_nerf --ref_nerf --occupancy \
  --batch_size 4096 --width 256 --height 256 --model_path runs/refnerf_shiny.pkl \
  runs/scene_shiny_train/metadata.json runs/scene_shiny_test/0000.json \
  runs/refnerf_view.png > runs/render_refnerf.log 2>&1
echo QUEUE3 DONE
