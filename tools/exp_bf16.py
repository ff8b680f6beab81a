"""Measure bf16 vs f32 training throughput for vanilla NeRF and the
occupancy NGP path, and check output agreement."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from learn_nerf_tpu.models import InstantNGPModel, NeRFModel
from learn_nerf_tpu.train import OccupancyTrainLoop, TrainLoop


def make_batch(n=4096, seed=0):
    rng = np.random.RandomState(seed)
    o = rng.randn(n, 3).astype(np.float32)
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    c = rng.rand(n, 3).astype(np.float32) * 2 - 1
    return np.stack([o, d, c], axis=1)


def time_loop(loop, steps=10, warmup=3):
    key = jax.random.PRNGKey(1)
    batch = make_batch()
    for _ in range(warmup):
        key, sk = jax.random.split(key)
        v = loop.step(sk, batch)
    float(v["fine"])
    t0 = time.time()
    for _ in range(steps):
        key, sk = jax.random.split(key)
        v = loop.step(sk, batch)
    float(v["fine"])
    return 4096 * steps / (time.time() - t0)


def vanilla(dtype):
    m = NeRFModel(compute_dtype=dtype)
    return TrainLoop(
        m, NeRFModel(compute_dtype=dtype),
        init_rng=jax.random.PRNGKey(0), lr=1e-4, coarse_ts=64, fine_ts=128,
        bbox_min=(-1, -1, -1), bbox_max=(1, 1, 1),
    )


def occ_ngp(dtype):
    m = InstantNGPModel(
        table_sizes=[2**18] * 16,
        grid_sizes=[2 ** (4 + i // 2) for i in range(16)],
        bbox_min=(-1.0, -1.0, -1.0),
        bbox_max=(1.0, 1.0, 1.0),
        compute_dtype=dtype,
    )
    return OccupancyTrainLoop(
        m, init_rng=jax.random.PRNGKey(0), lr=1e-4,
        bbox_min=(-1, -1, -1), bbox_max=(1, 1, 1),
        candidates=192, samples=32, grid_resolution=128,
        adam_eps=1e-15, adam_b2=0.99,
    )


def main():
    # Numerical agreement first (CPU-ish check on device is fine).
    m32 = NeRFModel(hidden_dim=64, color_layer_dim=32)
    m16 = NeRFModel(hidden_dim=64, color_layer_dim=32, compute_dtype="bfloat16")
    x = jnp.asarray(np.random.RandomState(0).randn(256, 3).astype(np.float32))
    d = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    p = m32.init(dict(params=jax.random.PRNGKey(0)), x, d)["params"]
    d32 = m32.apply(dict(params=p), x, d)[1]
    d16 = m16.apply(dict(params=p), x, d)[1]
    err = float(jnp.abs(d32 - d16).max())
    print(f"bf16 vs f32 rgb max abs err: {err:.4f} (rgb range 2.0)", flush=True)

    for name, ctor in (("vanilla", vanilla), ("occ_ngp", occ_ngp)):
        for dtype in ("float32", "bfloat16"):
            rate = time_loop(ctor(dtype))
            print(f"{name:10s} {dtype:9s}: {rate:9.0f} rays/s", flush=True)


if __name__ == "__main__":
    main()
