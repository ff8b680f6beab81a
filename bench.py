"""Headline benchmark: training throughput (rays/sec) on the flagship
Instant-NGP hierarchy at the reference's default workload (batch 4096,
64 coarse + 128 fine samples — ``learn_nerf/scripts/train_nerf.py:24-36``).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` compares against the reference implementation measured on
the SAME chip with the same workload (tools/measure_reference.py; numbers
recorded in BASELINE.md).
"""

import json
import time

import numpy as np

# Reference implementation measured on this chip (TPU v5e), same workload.
# See BASELINE.md "Measured on TPU v5e" table.
REFERENCE_NGP_RAYS_PER_SEC = 1327.0
REFERENCE_VANILLA_RAYS_PER_SEC = 28182.0

BATCH = 4096
COARSE_TS = 64
FINE_TS = 128
WARMUP_STEPS = 3
BENCH_STEPS = 10


def main():
    import jax

    from learn_nerf_tpu.models import InstantNGPModel
    from learn_nerf_tpu.train import TrainLoop

    bbox = dict(bbox_min=(-1.0, -1.0, -1.0), bbox_max=(1.0, 1.0, 1.0))
    coarse = InstantNGPModel(
        table_sizes=[2**18] * 6,
        grid_sizes=[2 ** (4 + i // 2) for i in range(6)],
        **bbox,
    )
    fine = InstantNGPModel(
        table_sizes=[2**18] * 16,
        grid_sizes=[2 ** (4 + i // 2) for i in range(16)],
        **bbox,
    )
    loop = TrainLoop(
        coarse,
        fine,
        init_rng=jax.random.PRNGKey(0),
        lr=1e-4,
        coarse_ts=COARSE_TS,
        fine_ts=FINE_TS,
        bbox_min=(-1.0, -1.0, -1.0),
        bbox_max=(1.0, 1.0, 1.0),
        adam_eps=1e-15,
        adam_b2=0.99,
    )

    rng = np.random.RandomState(0)
    origins = rng.randn(BATCH, 3).astype(np.float32)
    dirs = rng.randn(BATCH, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    colors = rng.rand(BATCH, 3).astype(np.float32) * 2 - 1
    batch = np.stack([origins, dirs, colors], axis=1)

    key = jax.random.PRNGKey(1)
    for _ in range(WARMUP_STEPS):
        key, sk = jax.random.split(key)
        values = loop.step(sk, batch)
    # NOTE: force a host fetch rather than block_until_ready — on the axon
    # TPU backend block_until_ready can return before execution finishes,
    # which silently inflates throughput ~1000x.
    float(values["fine"])

    t0 = time.time()
    for _ in range(BENCH_STEPS):
        key, sk = jax.random.split(key)
        values = loop.step(sk, batch)
    float(values["fine"])  # waits on the full step chain
    dt = time.time() - t0

    rays_per_sec = BATCH * BENCH_STEPS / dt
    print(
        json.dumps(
            dict(
                metric="train_rays_per_sec_instant_ngp",
                value=round(rays_per_sec, 1),
                unit="rays/sec/chip (batch 4096, 64c+128f samples)",
                vs_baseline=round(rays_per_sec / REFERENCE_NGP_RAYS_PER_SEC, 3),
            )
        )
    )


if __name__ == "__main__":
    main()
