"""Declarative benchmark queues for run_queue.py.

Each item: name (done-marker key), cmd (bash), timeout (s), log (watched
for stall detection), tpu (False = run under the CPU env, no chip probe),
retries (extra attempts after a wedge-classified failure).

Round-5 ordering policy (VERDICT r4 next #4 — round 4's only chip window
produced one number because the never-measured headline gamble ran
first):

  1. BANK A CHEAP WIN FIRST: ``bank_occupancy`` (BENCH_MODE=occupancy,
     ~3 min on a healthy chip) proves the chip and lands the headline
     train number before anything risky runs.
  2. The verify drive next (small known-good program shapes).
  3. Only then the never-measured items (baked frame matrix, frame
     bench), each with ``retries=1`` — TWO strikes and the queue moves
     on instead of burning a third 30-minute window.  Tier 1 carries no
     redundant rows: the single-lever decomposition comes from ONE
     ``frame_matrix`` process (shared bake cache) instead of four
     separate ``measure_baked`` runs that each re-bake 384^3 and
     re-compile (~15 min apiece); the per-lever trained-checkpoint
     PSNR was already pinned on the CPU backend (BASELINE.md r4 table,
     quality is backend-independent), so the chip owes them TIME only.
  4. The reference Ref-NeRF head-to-head right after tier 1 — it is a
     "What's missing" item carried three rounds (VERDICT r4 missing #3),
     which outranks the enhancement rows (scan dispatch, cosine
     flagship).  Its rate probes run first (cheap denominators), the
     1500-step train gets ONE bounded attempt (periodic saves keep a
     timeout from wasting the window), and the runner's deadline
     reservation defers it automatically if tier 1 runs long.
  5. Flagship-recipe + blender-protocol e2e rows and the bounded 512^3
     crash probe (explicit VERDICT r4 #7/#3 items) before the
     upgrade-only ours-side Ref-NeRF rows; demoted secondary baked
     variants last.
"""

MB = ("python tools/measure_baked.py runs/ours_ngp_long.pkl "
      "runs/scene_train/metadata.json runs/scene_test/0000.json "
      "--size 800 --budget 10 --eps 1e-2")

TRAIN = "python -m learn_nerf_tpu.scripts.train_nerf"
RENDER = "python -m learn_nerf_tpu.scripts.render_nerf"
EVAL = "python -m learn_nerf_tpu.scripts.eval_psnr"
CPUPFX = "env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu"

_VERIFY_TRAIN_FLAGS = "--seed 0 --lr 2e-3 --batch_size 1024"
_OCC_FLAGS = ("--instant_ngp --occupancy --occ_candidates 64 --occ_samples 24 "
              "--occ_grid 64")

SCENES = ["runs/scene_train/metadata.json", "runs/scene_test/metadata.json",
          "runs/scene_shiny_train/metadata.json",
          "runs/scene_shiny_test/metadata.json"]
CKPT = "runs/ours_ngp_long.pkl"
BAKED_REQ = [CKPT, "runs/scene_train/metadata.json",
             "runs/scene_test/metadata.json"]

QUEUE_R5 = [
    # ---- tier -1: regenerate the gitignored inputs (CPU, idempotent) -------
    # runs/ does not survive a container re-provision (it is gitignored);
    # every dataset and checkpoint the queue consumes must be rebuildable
    # from the repo alone.
    dict(name="scenes_make", tpu=False, produces=SCENES,
         cmd="bash tools/make_bench_scenes.sh > runs/scenes_make.log 2>&1",
         timeout=1200),
    dict(name="shuffle_prewarm", tpu=False,
         requires=[SCENES[0], SCENES[2]],
         produces=["runs/scene_train/shuffled/done",
                   "runs/scene_shiny_train/shuffled/done"],
         cmd=(f"{CPUPFX} python -c \""
              "from learn_nerf_tpu.data.dataset import load_dataset\n"
              "for d in ('runs/scene_train', 'runs/scene_shiny_train'):\n"
              "    ds = load_dataset(d)\n"
              "    next(ds.iterate_batches(d + '/shuffled', 0, 4096))\n"
              "    print('prewarmed', d)\""
              " > runs/shuffle_prewarm.log 2>&1"),
         timeout=1800),
    # A SURVIVING checkpoint is never destroyed (ADVICE r4): the retrain
    # runs only when the file is absent, so downstream absolute-PSNR rows
    # keep their meaning vs BASELINE.md whenever the original (round-2
    # 21k-step or round-4 1500-step) checkpoint is still on disk.
    dict(name="ngp_long_train", produces=[CKPT],
         requires=["runs/scene_train/metadata.json",
                   "runs/scene_train/shuffled/done"],
         cmd=(f"test -f {CKPT} || {TRAIN} --instant_ngp --batch_size 4096 "
              "--lr 1e-2 --seed 0 --occupancy --occ_train_budget 12 "
              "--occ_train_budget_start 400 --steps 1500 "
              f"--save_path {CKPT} runs/scene_train "
              "> runs/ours_ngp_long.log 2>&1"),
         timeout=1800, stall_secs=1200, log="runs/ours_ngp_long.log"),

    # ---- tier 0: bank the headline FIRST (minutes, known-good program) -----
    dict(name="bank_occupancy",
         cmd=("env BENCH_MODE=occupancy "
              "python bench.py > runs/bench_r5_occupancy.log 2>&1"),
         timeout=1200, log="runs/bench_r5_occupancy.log"),

    # ---- tier 0b: the /verify end-to-end drive (train+render on chip) ------
    dict(name="verify_scene_write", produces=["/tmp/verify_scene/metadata.json"], tpu=False,
         cmd=(f"{CPUPFX} python -c \"import sys; sys.path.insert(0, '.');"
              "from tests.synthetic_scene import write_dataset;"
              "write_dataset('/tmp/verify_scene', num_views=8, resolution=32)\""
              " > runs/verify_r5.log 2>&1"),
         timeout=600),
    dict(name="verify_train_dense", produces=["/tmp/verify_nerf.pkl"],
         cmd=(f"rm -f /tmp/verify_nerf.pkl && {TRAIN} {_VERIFY_TRAIN_FLAGS} --coarse_samples 16 "
              "--fine_samples 16 --steps 600 --save_path /tmp/verify_nerf.pkl "
              "/tmp/verify_scene >> runs/verify_r5.log 2>&1"),
         timeout=1200, stall_secs=900, log="runs/verify_r5.log"),
    dict(name="verify_render_dense", produces=["/tmp/verify_out.png"], requires=["/tmp/verify_nerf.pkl"],
         cmd=(f"{RENDER} --seed 0 --batch_size 1024 --coarse_samples 16 "
              "--fine_samples 16 --width 32 --height 32 "
              "--model_path /tmp/verify_nerf.pkl /tmp/verify_scene/metadata.json "
              "/tmp/verify_scene/0000.json /tmp/verify_out.png "
              ">> runs/verify_r5.log 2>&1"),
         timeout=900, log="runs/verify_r5.log"),
    dict(name="verify_train_occ", produces=["/tmp/verify_ngp.pkl"],
         cmd=(f"rm -f /tmp/verify_ngp.pkl && {TRAIN} {_VERIFY_TRAIN_FLAGS} {_OCC_FLAGS} "
              "--occ_train_budget auto --occ_train_budget_start 300 --steps 600 "
              "--save_path /tmp/verify_ngp.pkl /tmp/verify_scene "
              ">> runs/verify_r5.log 2>&1"),
         timeout=1200, stall_secs=900, log="runs/verify_r5.log"),
    dict(name="verify_render_occ", produces=["/tmp/verify_occ.png"], requires=["/tmp/verify_ngp.pkl"],
         cmd=(f"{RENDER} --seed 0 --batch_size 1024 {_OCC_FLAGS} "
              "--occ_budget_per_ray auto --width 32 --height 32 "
              "--model_path /tmp/verify_ngp.pkl /tmp/verify_scene/metadata.json "
              "/tmp/verify_scene/0000.json /tmp/verify_occ.png "
              ">> runs/verify_r5.log 2>&1"),
         timeout=900, log="runs/verify_r5.log"),
    dict(name="verify_render_baked", produces=["/tmp/verify_baked.png"], requires=["/tmp/verify_ngp.pkl"],
         cmd=(f"{RENDER} --seed 0 --batch_size 1024 {_OCC_FLAGS} "
              "--occ_budget_per_ray auto --baked 128 --baked_pack 2 "
              "--width 32 --height 32 --model_path /tmp/verify_ngp.pkl "
              "/tmp/verify_scene/metadata.json /tmp/verify_scene/0000.json "
              "/tmp/verify_baked.png >> runs/verify_r5.log 2>&1"),
         timeout=900, log="runs/verify_r5.log"),
    dict(name="verify_psnr", tpu=False,
         requires=["/tmp/verify_out.png", "/tmp/verify_occ.png",
                   "/tmp/verify_baked.png"],
         cmd=(f"{CPUPFX} python -c \""
              "from PIL import Image\n"
              "import numpy as np\n"
              "g = np.asarray(Image.open('/tmp/verify_scene/0000.png')).astype(np.float32)\n"
              "for n in ('/tmp/verify_out.png','/tmp/verify_occ.png','/tmp/verify_baked.png'):\n"
              "    p = np.asarray(Image.open(n)).astype(np.float32)\n"
              "    print('VERIFY', n, 'PSNR', 10*np.log10(255**2/((p-g)**2).mean()))\""
              " >> runs/verify_r5.log 2>&1"),
         timeout=300),

    # ---- tier 1: the never-measured items, two strikes each ---------------
    # The round-4 blocker (frame programs jitting the baked grid as a
    # 7.26 GB captured constant) is fixed and gated by
    # tests/test_constants.py; these get their first-ever chip numbers.
    # retries=1 == at most TWO attempts before the queue moves on.
    dict(name="bench_frame", retries=1,
         cmd=("env BENCH_MODE=frame "
              "python bench.py > runs/bench_r5_frame.log 2>&1"),
         # on-chip 384^3 bake + one cold compile per auto-budget bucket;
         # bench.py's own BENCH_FRAME_TIMEOUT watchdog (1500 s) fires
         # first and still prints a parseable line.
         timeout=1800, log="runs/bench_r5_frame.log"),
    dict(name="baked_384_512", requires=BAKED_REQ, retries=1,
         cmd=f"{MB} --resolutions 384,512 > runs/measure_baked.log 2>&1",
         timeout=1800, log="runs/measure_baked.log"),
    # Full round-4 lever stack (the projected ~1 s headline point), then
    # the single-lever decomposition rows.
    # The per-lever frame matrix in one process (shared bake cache): the
    # decomposition table VERDICT r4 #5 requires before --occ_block_gather
    # may stay default-recommended.  Runs before the single-config combo:
    # one matrix process yields every lever row, the combo only re-checks
    # the full stack on the TRAINED checkpoint.
    dict(name="frame_matrix", retries=1,
         cmd=("python tools/frame_matrix.py --size 800 --reps 3 "
              "> runs/frame_matrix_r5.log 2>&1"),
         timeout=3600, log="runs/frame_matrix_r5.log"),
    dict(name="baked_combo_bg4_span_bg4", requires=BAKED_REQ, retries=1,
         cmd=(f"{MB} --resolutions 384 --span_candidates 96 --candidates 96 "
              f"--pack 4 --block_gather 4 --span_block_gather 4 "
              f"> runs/measure_baked_bg4sb4.log 2>&1"),
         timeout=1200, log="runs/measure_baked_bg4sb4.log"),
    # Roofline/MFU for the train submetrics that are not yet banked
    # (occupancy already landed in tier 0).  bench.py now RE-EMITS its
    # headline JSON after every submetric, so even a timeout keeps every
    # completed mode (the ADVICE r4 all-or-nothing concern is structural
    # now, not a timeout-sizing question); 3600 s still budgets five cold
    # ~2-5 min remote compiles.
    dict(name="bench_roofline",
         cmd=("env BENCH_MODE=pooled,parity,vanilla "
              "python bench.py > runs/bench_r5_roofline.log 2>&1"),
         timeout=3600, log="runs/bench_r5_roofline.log"),

    # ---- tier 2: reference Ref-NeRF head-to-head (VERDICT r4 missing #3,
    # carried three rounds — outranks the enhancement rows below).  Rate
    # probes first: cheap, and they are the measured-speedup denominators
    # even if the 1500-step train does not fit the window.
    dict(name="ref_shuffle_prewarm", tpu=False,
         requires=["runs/scene_shiny_train/metadata.json"],
         produces=["runs/scene_shiny_train/shuffled_ref/done"],
         # The reference package is not importable from the repo root —
         # the runner's PYTHONPATH covers /root/repo only (first r5
         # attempt died on ModuleNotFoundError in 2 s).
         cmd=(f"{CPUPFX} "
              "PYTHONPATH=/root/repo:/root/reference:/root/.axon_site "
              "python -c \""
              "import jax\n"
              "from learn_nerf.dataset import load_dataset\n"
              "ds = load_dataset('runs/scene_shiny_train')\n"
              "next(ds.iterate_batches('runs/scene_shiny_train/shuffled_ref',"
              " jax.random.PRNGKey(7), 4096))\n"
              "print('prewarmed shuffled_ref')\""
              " > runs/ref_shuffle_prewarm.log 2>&1"),
         timeout=1800),
    # ---- tier 3: flagship quality / enhancement rows ------------------------
    # (The reference Ref-NeRF rate/train items moved BELOW these on
    # 2026-08-19 17:42 evidence: the reference's Ref-NeRF train step
    # crashes the TPU toolchain's AOT compiler itself — SIGILL inside
    # xla::jellyfish TpuPriorityFusionQueue::NormalizedComputationCost,
    # runs/measure_ref_refnerf.log — after ~20 min of relay compiles.
    # Our own Ref-NeRF rows below are a different program and compile.)
    dict(name="ngp_cosine_train",
         requires=["runs/scene_train/metadata.json",
                   "runs/scene_train/shuffled/done"],
         cmd=(f"rm -f runs/ours_ngp_cosine.pkl && {TRAIN} --instant_ngp --batch_size 4096 --lr 1e-2 --seed 0 "
              "--occupancy --occ_train_budget 12 --occ_train_budget_start 400 "
              "--lr_schedule cosine --occ_freeze_grid_after 800 --ema 0.99 "
              "--steps 1500 --save_path runs/ours_ngp_cosine.pkl "
              "runs/scene_train > runs/ours_ngp_cosine.log 2>&1"),
         timeout=2400, stall_secs=1500, log="runs/ours_ngp_cosine.log"),
    dict(name="ngp_cosine_eval",
         requires=["runs/ours_ngp_cosine.pkl",
                   "runs/scene_test/metadata.json"],
         cmd=(f"{EVAL} --batch_size 4096 --instant_ngp --occupancy "
              "--model_path runs/ours_ngp_cosine.pkl runs/scene_test "
              "> runs/eval_ours_ngp_cosine.log 2>&1"),
         timeout=2400, log="runs/eval_ours_ngp_cosine.log"),

    # ---- tier 3a: blender-protocol e2e + the 512 probe (explicit VERDICT
    # r4 #7 / #3 items — outrank the upgrade-only ours-side Ref-NeRF rows
    # below, which already have CPU-backend numbers in BASELINE.md) ----------
    dict(name="blender_standin_make", tpu=False,
         produces=["runs/scene_blender_train/metadata.json",
                   "runs/scene_blender_test/metadata.json"],
         cmd=("rm -rf runs/blender_capture runs/scene_blender_train "
              "runs/scene_blender_test && "
              f"{CPUPFX} python tools/make_blender_standin.py "
              "runs/blender_capture 64 40 > runs/blender_e2e.log 2>&1 && "
              f"{CPUPFX} python -m learn_nerf_tpu.convert.blender --split train "
              "runs/blender_capture runs/scene_blender_train "
              ">> runs/blender_e2e.log 2>&1 && "
              f"{CPUPFX} python -m learn_nerf_tpu.convert.blender --split test "
              "runs/blender_capture runs/scene_blender_test "
              ">> runs/blender_e2e.log 2>&1"),
         timeout=1200),
    dict(name="blender_e2e_train",
         requires=["runs/scene_blender_train/metadata.json"],
         cmd=(f"rm -f runs/blender_e2e.pkl && {TRAIN} --batch_size 1024 --lr 2e-3 --seed 0 --occupancy "
              "--occ_candidates 64 --occ_samples 24 --occ_grid 64 --steps 1000 "
              "--save_path runs/blender_e2e.pkl runs/scene_blender_train "
              ">> runs/blender_e2e.log 2>&1"),
         timeout=1800, stall_secs=1500, log="runs/blender_e2e.log"),
    dict(name="blender_e2e_eval", requires=["runs/blender_e2e.pkl"],
         cmd=(f"{EVAL} --batch_size 4096 --occupancy "
              "--model_path runs/blender_e2e.pkl runs/scene_blender_test "
              ">> runs/blender_e2e.log 2>&1"),
         timeout=1200, log="runs/blender_e2e.log"),
    # The 512^3 bake killed the TPU worker twice (kernel fault,
    # runs/measure_baked.log 18:34/18:53): its sweep output is EXACTLY
    # 2^31 bf16 elements.  One bounded, NO-retry probe (a worker crash
    # wedges the chip ~12 min; two strikes of that is never worth it)
    # isolates buffer-allocation vs reshape vs sweep and drops a pass
    # marker that gates the real 512 measurement below.
    dict(name="probe_512", requires=BAKED_REQ, retries=0,
         cmd=("rm -f runs/probe_512_pass && "
              "python tools/probe_512.py runs/ours_ngp_long.pkl "
              "runs/scene_train/metadata.json > runs/probe_512.log 2>&1 "
              "&& touch runs/probe_512_pass"),
         timeout=900, log="runs/probe_512.log"),
    dict(name="baked_512_retry", retries=0,
         requires=BAKED_REQ + ["runs/probe_512_pass"],
         cmd=f"{MB} --resolutions 512 > runs/measure_baked_512.log 2>&1",
         timeout=1500, log="runs/measure_baked_512.log"),
    # probe_512 verdict (runs/probe_512.log, 20:34-20:40): a 2^31-element
    # bf16 buffer allocates, fills, and host-reshapes FINE (A1 299s, A2
    # 1.5s) — the crash is the bake sweep's lax.map accumulation once the
    # output exceeds 2^31 BYTES (gathers from the 7.25 GB pack-4 table
    # work, so reads are unaffected).  400^3 x 16 x bf16 = 2.048e9 bytes
    # is the largest resolution under that ceiling (and divisible by 8).
    # MEASURED 2026-08-19 22:16-22:27: a synthetic-field 400^3 frame sat
    # in relay compile past a 700 s bound (no kernel fault; chip probed
    # healthy right after) — 400 is not 128-lane aligned, so its padded
    # program shapes compile far slower than 384's.  Timeout raised
    # accordingly; 384^3 remains the practical/recommended maximum.
    dict(name="baked_400", requires=BAKED_REQ, retries=0,
         cmd=(f"{MB} --resolutions 400 --span_candidates 96 --candidates 96 "
              "--pack 4 > runs/measure_baked_400.log 2>&1"),
         timeout=3000, log="runs/measure_baked_400.log"),

    # ---- tier 3b: ours-side Ref-NeRF / NGPxRef on-chip rows -----------------
    dict(name="ours_refnerf_train",
         requires=["runs/scene_shiny_train/metadata.json",
                   "runs/scene_shiny_train/shuffled/done"],
         cmd=(f"rm -f runs/ours_refnerf_1500.pkl && {TRAIN} --ref_nerf --batch_size 4096 --lr 1e-4 --seed 0 "
              "--occupancy --steps 1500 --save_path runs/ours_refnerf_1500.pkl "
              "runs/scene_shiny_train > runs/ours_refnerf_1500.log 2>&1"),
         timeout=3600, stall_secs=1800, log="runs/ours_refnerf_1500.log"),
    dict(name="ours_refnerf_eval",
         requires=["runs/ours_refnerf_1500.pkl",
                   "runs/scene_shiny_test/metadata.json"],
         cmd=(f"{EVAL} --batch_size 4096 --ref_nerf --occupancy "
              "--model_path runs/ours_refnerf_1500.pkl runs/scene_shiny_test "
              "> runs/eval_ours_refnerf_1500.log 2>&1"),
         timeout=2400, log="runs/eval_ours_refnerf_1500.log"),
    dict(name="ngp_scan8_throughput",
         requires=["runs/scene_train/metadata.json",
                   "runs/scene_train/shuffled/done"],
         cmd=(f"rm -f runs/ours_ngp_scan8.pkl && {TRAIN} --instant_ngp --batch_size 4096 --lr 1e-2 --seed 0 "
              "--occupancy --occ_train_budget 12 --occ_train_budget_start 400 "
              "--steps_per_dispatch 8 --steps 1600 "
              "--save_path runs/ours_ngp_scan8.pkl runs/scene_train "
              "> runs/ours_ngp_scan8.log 2>&1"),
         timeout=1800, stall_secs=1500, log="runs/ours_ngp_scan8.log"),
    dict(name="ours_ngpref_train",
         requires=["runs/scene_shiny_train/metadata.json",
                   "runs/scene_shiny_train/shuffled/done"],
         cmd=(f"rm -f runs/ours_ngpref.pkl && {TRAIN} --instant_ngp --ref_nerf --batch_size 4096 --lr 1e-2 "
              "--seed 0 --occupancy --steps 1500 "
              "--save_path runs/ours_ngpref.pkl runs/scene_shiny_train "
              "> runs/ours_ngpref.log 2>&1"),
         timeout=5400, stall_secs=1800, log="runs/ours_ngpref.log"),
    dict(name="ours_ngpref_eval",
         requires=["runs/ours_ngpref.pkl",
                   "runs/scene_shiny_test/metadata.json"],
         cmd=(f"{EVAL} --batch_size 4096 --instant_ngp --ref_nerf --occupancy "
              "--model_path runs/ours_ngpref.pkl runs/scene_shiny_test "
              "> runs/eval_ours_ngpref.log 2>&1"),
         timeout=2400, log="runs/eval_ours_ngpref.log"),
    # ---- tier 5: secondary baked variants ----------------------------------
    # Single-lever decomposition rows on the TRAINED checkpoint: demoted
    # from tier 1 (frame_matrix already times every lever in one process;
    # lever quality is CPU-pinned in BASELINE.md's r4 table) — these add
    # trained-scene PSNR-vs-live per lever if the chip stays healthy.
    dict(name="baked_combo_p4_c96", requires=BAKED_REQ, retries=1,
         cmd=(f"{MB} --resolutions 384 --span_candidates 96 --candidates 96 "
              f"--pack 4 > runs/measure_baked_combo.log 2>&1"),
         timeout=1200, log="runs/measure_baked_combo.log"),
    dict(name="baked_combo_p4_c64", requires=BAKED_REQ, retries=1,
         cmd=(f"{MB} --resolutions 384 --span_candidates 96 --candidates 64 "
              f"--pack 4 > runs/measure_baked_combo64.log 2>&1"),
         timeout=1200, log="runs/measure_baked_combo64.log"),
    dict(name="baked_combo_bg2", requires=BAKED_REQ, retries=1,
         cmd=(f"{MB} --resolutions 384 --span_candidates 96 --candidates 96 "
              f"--pack 4 --block_gather 2 > runs/measure_baked_bg2.log 2>&1"),
         timeout=1200, log="runs/measure_baked_bg2.log"),
    dict(name="baked_combo_bg4", requires=BAKED_REQ, retries=1,
         cmd=(f"{MB} --resolutions 384 --span_candidates 96 --candidates 96 "
              f"--pack 4 --block_gather 4 > runs/measure_baked_bg4.log 2>&1"),
         timeout=1200, log="runs/measure_baked_bg4.log"),
    dict(name="eval_block_gather4",
         requires=[CKPT, "runs/scene_test/metadata.json"],
         cmd=(f"{EVAL} --batch_size 4096 --instant_ngp --occupancy "
              "--occ_block_gather 4 --occ_budget_per_ray auto "
              "--model_path runs/ours_ngp_long.pkl runs/scene_test "
              "> runs/eval_block_gather4.log 2>&1"),
         timeout=1200, log="runs/eval_block_gather4.log"),
    # 512-grid rows run ONLY behind the probe_512 pass marker (its bake
    # kernel-faulted the worker twice on 2026-08-19; see probe_512 above)
    # and never retry — a worker crash wedges the chip ~12 min.
    dict(name="baked_span_512", retries=0,
         requires=BAKED_REQ + ["runs/probe_512_pass"],
         cmd=(f"{MB} --resolutions 512 --span_candidates 96 "
              "> runs/measure_baked_span.log 2>&1"),
         timeout=1500, log="runs/measure_baked_span.log"),
    dict(name="baked_pack2", requires=BAKED_REQ, retries=1,
         cmd=(f"{MB} --resolutions 384 --pack 2 "
              "> runs/measure_baked_p2.log 2>&1"),
         timeout=1500, log="runs/measure_baked_p2.log"),
    dict(name="baked_256_p8", requires=BAKED_REQ, retries=1,
         cmd=(f"{MB} --resolutions 256 --span_candidates 96 --candidates 96 "
              "--pack 8 > runs/measure_baked_256p8.log 2>&1"),
         timeout=1200, log="runs/measure_baked_256p8.log"),

    # ---- final: self-assembling results table -------------------------------
    dict(name="summary_tables", tpu=False,
         cmd=(f"{CPUPFX} python tools/summarize_runs.py runs "
              "> runs/summary_r5.md 2>&1"),
         timeout=300),
    # runs/ is gitignored and does not survive a container re-provision:
    # mirror the logs and summary into a TRACKED directory.  No error
    # suppression (ADVICE r4): a failed/empty copy must write a .fail
    # marker, not a done marker, or the evidence silently vanishes.
    dict(name="archive_logs", tpu=False,
         cmd=("mkdir -p docs/measurements/r5 && "
              "cp -f runs/*.log docs/measurements/r5/ && "
              "cp -f runs/summary_r5.md docs/measurements/r5/ && "
              "test -n \"$(ls docs/measurements/r5)\" && "
              "ls docs/measurements/r5 | head -50"),
         timeout=120),
]

QUEUES = {"r5": QUEUE_R5}
