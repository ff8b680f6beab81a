"""Headline benchmark: training throughput (rays/sec) on the flagship
Instant-NGP model with occupancy-grid accelerated sampling, versus the
reference implementation measured on the SAME chip (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: batch 4096 rays/step (reference default,
``learn_nerf/scripts/train_nerf.py:24``).  The reference densely evaluates
its coarse(64) + fine(192-sample) hierarchy; ours occupancy-culls 192
candidates to 32 field samples per ray (matched quality — skipped cells are
empty; see tests/test_occupancy.py and VERIFY notes).  Timing includes the
amortized occupancy-grid updates (every 16 steps) and forces host fetches
(block_until_ready is unreliable on this backend).

Set BENCH_MODE=parity to instead measure the dense hierarchical workload
(identical sample counts to the reference).
"""

import json
import os
import time

import numpy as np

# Reference implementation measured on this chip (TPU v5e), same batch and
# scene-free synthetic workload.  See BASELINE.md "Measured on TPU v5e".
REFERENCE_NGP_RAYS_PER_SEC = 1327.0
REFERENCE_VANILLA_RAYS_PER_SEC = 28182.0

BATCH = 4096


def make_batch(rng):
    origins = rng.randn(BATCH, 3).astype(np.float32)
    dirs = rng.randn(BATCH, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    colors = rng.rand(BATCH, 3).astype(np.float32) * 2 - 1
    return np.stack([origins, dirs, colors], axis=1)


def ngp_model(levels):
    from learn_nerf_tpu.models import InstantNGPModel

    return InstantNGPModel(
        table_sizes=[2**18] * levels,
        grid_sizes=[2 ** (4 + i // 2) for i in range(levels)],
        bbox_min=(-1.0, -1.0, -1.0),
        bbox_max=(1.0, 1.0, 1.0),
    )


def run_steps(loop, batch, steps, warmup):
    import jax

    # The production hot loop: batch sharded onto the mesh once (the train
    # CLI double-buffers transfers, so steady state never waits on input),
    # per-step keys derived inside the jitted step (loop.step_auto).  The
    # reference baseline was measured symmetrically with a device-resident
    # batch (tools/measure_reference.py).
    base_key = jax.random.PRNGKey(1)
    batch = loop.shard_batch(batch)
    values = None
    for _ in range(warmup):
        values = loop.step_auto(base_key, batch)
    float(values["fine"])  # host fetch = real synchronization

    t0 = time.time()
    for _ in range(steps):
        values = loop.step_auto(base_key, batch)
    float(values["fine"])
    return BATCH * steps / (time.time() - t0)


def bench_occupancy():
    import jax

    from learn_nerf_tpu.train import OccupancyTrainLoop

    loop = OccupancyTrainLoop(
        ngp_model(16),
        init_rng=jax.random.PRNGKey(0),
        lr=1e-4,
        bbox_min=(-1.0, -1.0, -1.0),
        bbox_max=(1.0, 1.0, 1.0),
        candidates=192,
        samples=32,
        grid_resolution=128,
        update_interval=16,
        adam_eps=1e-15,
        adam_b2=0.99,
    )
    batch = make_batch(np.random.RandomState(0))
    # 32 steps include two grid updates -> amortized update cost measured.
    return run_steps(loop, batch, steps=32, warmup=4)


def bench_parity():
    import jax

    from learn_nerf_tpu.train import TrainLoop

    loop = TrainLoop(
        ngp_model(6),
        ngp_model(16),
        init_rng=jax.random.PRNGKey(0),
        lr=1e-4,
        coarse_ts=64,
        fine_ts=128,
        bbox_min=(-1.0, -1.0, -1.0),
        bbox_max=(1.0, 1.0, 1.0),
        adam_eps=1e-15,
        adam_b2=0.99,
    )
    batch = make_batch(np.random.RandomState(0))
    return run_steps(loop, batch, steps=10, warmup=3)


def main():
    mode = os.environ.get("BENCH_MODE", "occupancy")
    if mode == "parity":
        rays_per_sec = bench_parity()
        metric = "train_rays_per_sec_instant_ngp_parity"
        unit = "rays/sec/chip (batch 4096, dense 64c+192f samples)"
    else:
        rays_per_sec = bench_occupancy()
        metric = "train_rays_per_sec_instant_ngp"
        unit = "rays/sec/chip (batch 4096, occupancy-culled 192->32 samples)"
    print(
        json.dumps(
            dict(
                metric=metric,
                value=round(rays_per_sec, 1),
                unit=unit,
                vs_baseline=round(rays_per_sec / REFERENCE_NGP_RAYS_PER_SEC, 3),
            )
        )
    )


if __name__ == "__main__":
    main()
