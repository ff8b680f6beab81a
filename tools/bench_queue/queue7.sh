#!/bin/bash
# Round-3 queue (relaunch of queue6 after the chip claim wedged mid-morning):
# 0) the /verify end-to-end drive (train + render CLIs on the real chip,
#    including the new --baked path), then
# 1-6) Ref-NeRF and NGP x Ref-NeRF head-to-head vs the reference on the
#    shiny compound scene, equal steps x batch (VERDICT round 3 #2).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

# ---- 0.5 baked-frame measurement (VERDICT round 3 #1) ----------------------
timeout 3600 python tools/measure_baked.py runs/ours_ngp_long.pkl \
  runs/scene_train/metadata.json runs/scene_test/0000.json \
  --size 800 --resolutions 384,512 --budget 10 --eps 1e-2 \
  > runs/measure_baked.log 2>&1
sleep 60

# ---- 0.55 two-phase span selection on the same frame -----------------------
timeout 2400 python tools/measure_baked.py runs/ours_ngp_long.pkl \
  runs/scene_train/metadata.json runs/scene_test/0000.json \
  --size 800 --resolutions 512 --budget 10 --eps 1e-2 --span_candidates 64 \
  > runs/measure_baked_span.log 2>&1
sleep 60

# ---- 0.57 packed-corner baked grids (8/pack gathers per sample) ------------
timeout 2400 python tools/measure_baked.py runs/ours_ngp_long.pkl \
  runs/scene_train/metadata.json runs/scene_test/0000.json \
  --size 800 --resolutions 384,512 --budget 10 --eps 1e-2 --pack 2 \
  > runs/measure_baked_p2.log 2>&1
sleep 60
timeout 2400 python tools/measure_baked.py runs/ours_ngp_long.pkl \
  runs/scene_train/metadata.json runs/scene_test/0000.json \
  --size 800 --resolutions 384 --budget 10 --eps 1e-2 --pack 4 \
  > runs/measure_baked_p4.log 2>&1
sleep 60

# ---- 0.58 combined: span-tightened selection + fewer candidates + pack -----
timeout 2400 python tools/measure_baked.py runs/ours_ngp_long.pkl \
  runs/scene_train/metadata.json runs/scene_test/0000.json \
  --size 800 --resolutions 384 --budget 10 --eps 1e-2 \
  --span_candidates 64 --candidates 96 --pack 4 \
  > runs/measure_baked_combo.log 2>&1
sleep 60
# Aggressive frontier points: fewer candidates inside the span, and a
# 256^3 bake at pack 8 (4.3 GB — full packing fits at this resolution).
timeout 2400 python tools/measure_baked.py runs/ours_ngp_long.pkl \
  runs/scene_train/metadata.json runs/scene_test/0000.json \
  --size 800 --resolutions 384 --budget 10 --eps 1e-2 \
  --span_candidates 64 --candidates 64 --pack 4 \
  > runs/measure_baked_combo64.log 2>&1
sleep 60
timeout 2400 python tools/measure_baked.py runs/ours_ngp_long.pkl \
  runs/scene_train/metadata.json runs/scene_test/0000.json \
  --size 800 --resolutions 256 --budget 10 --eps 1e-2 \
  --span_candidates 64 --candidates 96 --pack 8 \
  > runs/measure_baked_256p8.log 2>&1
sleep 60

# ---- 0. verify drive -------------------------------------------------------
env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -c "
import sys; sys.path.insert(0, '/root/repo')
from tests.synthetic_scene import write_dataset
write_dataset('/tmp/verify_scene', num_views=8, resolution=32)" \
  > runs/verify_r3.log 2>&1

timeout 1200 python -m learn_nerf_tpu.scripts.train_nerf --seed 0 --lr 2e-3 --batch_size 1024 \
  --coarse_samples 16 --fine_samples 16 --steps 600 \
  --save_path /tmp/verify_nerf.pkl /tmp/verify_scene >> runs/verify_r3.log 2>&1
sleep 30
timeout 900 python -m learn_nerf_tpu.scripts.render_nerf --seed 0 --batch_size 1024 \
  --coarse_samples 16 --fine_samples 16 --width 32 --height 32 \
  --model_path /tmp/verify_nerf.pkl \
  /tmp/verify_scene/metadata.json /tmp/verify_scene/0000.json /tmp/verify_out.png >> runs/verify_r3.log 2>&1
env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -c "
from PIL import Image; import numpy as np
p = np.asarray(Image.open('/tmp/verify_out.png')).astype(np.float32)
g = np.asarray(Image.open('/tmp/verify_scene/0000.png')).astype(np.float32)
print('VERIFY dense PSNR', 10*np.log10(255**2/((p-g)**2).mean()))" >> runs/verify_r3.log 2>&1
sleep 30
# Occupancy NGP variant + pooled + auto budget (the flagship path).
timeout 1200 python -m learn_nerf_tpu.scripts.train_nerf --seed 0 --lr 2e-3 --batch_size 1024 \
  --instant_ngp --occupancy --occ_candidates 64 --occ_samples 24 --occ_grid 64 \
  --occ_train_budget auto --occ_train_budget_start 300 --steps 600 \
  --save_path /tmp/verify_ngp.pkl /tmp/verify_scene >> runs/verify_r3.log 2>&1
sleep 30
# Render the occupancy checkpoint live and BAKED; report both PSNRs.
timeout 900 python -m learn_nerf_tpu.scripts.render_nerf --seed 0 --batch_size 1024 \
  --instant_ngp --occupancy --occ_candidates 64 --occ_samples 24 --occ_grid 64 \
  --occ_budget_per_ray auto --width 32 --height 32 \
  --model_path /tmp/verify_ngp.pkl \
  /tmp/verify_scene/metadata.json /tmp/verify_scene/0000.json /tmp/verify_occ.png >> runs/verify_r3.log 2>&1
sleep 30
timeout 900 python -m learn_nerf_tpu.scripts.render_nerf --seed 0 --batch_size 1024 \
  --instant_ngp --occupancy --occ_candidates 64 --occ_samples 24 --occ_grid 64 \
  --occ_budget_per_ray auto --baked 128 --baked_pack 2 --width 32 --height 32 \
  --model_path /tmp/verify_ngp.pkl \
  /tmp/verify_scene/metadata.json /tmp/verify_scene/0000.json /tmp/verify_baked.png >> runs/verify_r3.log 2>&1
env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -c "
from PIL import Image; import numpy as np
g = np.asarray(Image.open('/tmp/verify_scene/0000.png')).astype(np.float32)
for name in ('/tmp/verify_occ.png', '/tmp/verify_baked.png'):
    p = np.asarray(Image.open(name)).astype(np.float32)
    print('VERIFY', name, 'PSNR', 10*np.log10(255**2/((p-g)**2).mean()))" >> runs/verify_r3.log 2>&1
echo VERIFY_DONE
sleep 30

# ---- 0.6 multi-step dispatch training throughput ---------------------------
timeout 1800 python -m learn_nerf_tpu.scripts.train_nerf --instant_ngp --batch_size 4096 \
  --lr 1e-2 --seed 0 --occupancy --occ_train_budget 12 --occ_train_budget_start 400 \
  --steps_per_dispatch 8 --steps 1600 \
  --save_path runs/ours_ngp_scan8.pkl runs/scene_train > runs/ours_ngp_scan8.log 2>&1
sleep 60

# ---- 1-6. head-to-head comparisons ----------------------------------------
timeout 3600 python -m learn_nerf_tpu.scripts.train_nerf --ref_nerf --batch_size 4096 \
  --lr 1e-4 --seed 0 --occupancy --steps 1500 \
  --save_path runs/ours_refnerf_1500.pkl runs/scene_shiny_train > runs/ours_refnerf_1500.log 2>&1
sleep 60
timeout 5400 python -m learn_nerf_tpu.scripts.train_nerf --instant_ngp --ref_nerf --batch_size 4096 \
  --lr 1e-2 --seed 0 --occupancy --steps 1500 \
  --save_path runs/ours_ngpref.pkl runs/scene_shiny_train > runs/ours_ngpref.log 2>&1
sleep 60
timeout 10800 python tools/train_reference.py --ref_nerf --batch_size 4096 --steps 1500 --lr 1e-4 \
  --save_path runs/ref_refnerf.pkl runs/scene_shiny_train > runs/ref_refnerf.log 2>&1
sleep 60
timeout 2400 python tools/measure_reference.py --ref_nerf --steps 20 \
  > runs/measure_ref_refnerf.log 2>&1
sleep 60
timeout 3600 python tools/measure_reference.py --instant_ngp --ref_nerf --steps 10 \
  > runs/measure_ref_ngpref.log 2>&1
sleep 60
timeout 2400 python -m learn_nerf_tpu.scripts.eval_psnr --batch_size 4096 --ref_nerf --occupancy \
  --model_path runs/ours_refnerf_1500.pkl runs/scene_shiny_test > runs/eval_ours_refnerf_1500.log 2>&1
sleep 60
timeout 2400 python -m learn_nerf_tpu.scripts.eval_psnr --batch_size 4096 --instant_ngp --ref_nerf --occupancy \
  --model_path runs/ours_ngpref.pkl runs/scene_shiny_test > runs/eval_ours_ngpref.log 2>&1
sleep 60
timeout 3600 python -m learn_nerf_tpu.scripts.eval_psnr --batch_size 4096 --ref_nerf \
  --model_path runs/ref_refnerf.pkl runs/scene_shiny_test > runs/eval_ref_refnerf.log 2>&1
sleep 60

# ---- 7. Blender-protocol converted-scene train+eval (VERDICT #4) -----------
rm -rf runs/blender_capture runs/scene_blender_train runs/scene_blender_test
env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/make_blender_standin.py \
  runs/blender_capture 64 40 > runs/blender_e2e.log 2>&1
env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m learn_nerf_tpu.convert.blender \
  --split train runs/blender_capture runs/scene_blender_train >> runs/blender_e2e.log 2>&1
env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m learn_nerf_tpu.convert.blender \
  --split test runs/blender_capture runs/scene_blender_test >> runs/blender_e2e.log 2>&1
timeout 1800 python -m learn_nerf_tpu.scripts.train_nerf --batch_size 1024 --lr 2e-3 --seed 0 \
  --occupancy --occ_candidates 64 --occ_samples 24 --occ_grid 64 --steps 1000 \
  --save_path runs/blender_e2e.pkl runs/scene_blender_train >> runs/blender_e2e.log 2>&1
sleep 30
timeout 1200 python -m learn_nerf_tpu.scripts.eval_psnr --batch_size 4096 --occupancy \
  --model_path runs/blender_e2e.pkl runs/scene_blender_test >> runs/blender_e2e.log 2>&1
echo QUEUE7 DONE

# ---- 8. cosine-schedule flagship quality row --------------------------------
# Ours-only improvement: the round-3 --lr_schedule cosine endpoint pinning,
# measured on the benchmark scene at the flagship config (compare with the
# constant-lr 17.02 dB row in BASELINE.md).
timeout 2400 python -m learn_nerf_tpu.scripts.train_nerf --instant_ngp --batch_size 4096 \
  --lr 1e-2 --seed 0 --occupancy --occ_train_budget 12 --occ_train_budget_start 400 \
  --lr_schedule cosine --occ_freeze_grid_after 800 --ema 0.99 --steps 1500 \
  --save_path runs/ours_ngp_cosine.pkl runs/scene_train > runs/ours_ngp_cosine.log 2>&1
sleep 60
timeout 2400 python -m learn_nerf_tpu.scripts.eval_psnr --batch_size 4096 --instant_ngp --occupancy \
  --model_path runs/ours_ngp_cosine.pkl runs/scene_test > runs/eval_ours_ngp_cosine.log 2>&1
echo QUEUE7_PLUS_COSINE DONE
