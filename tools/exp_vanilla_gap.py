"""Find the vanilla-path regression vs the reference: time the train step
with alternate fine-sampling formulations."""

import time

import jax
import jax.numpy as jnp
import numpy as np


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
    v = None
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


def build_loop():
    from learn_nerf_tpu.models import NeRFModel
    from learn_nerf_tpu.train import TrainLoop

    return TrainLoop(
        NeRFModel(),
        NeRFModel(),
        init_rng=jax.random.PRNGKey(0),
        lr=1e-4,
        coarse_ts=64,
        fine_ts=128,
        bbox_min=(-1, -1, -1),
        bbox_max=(1, 1, 1),
    )


def main():
    import learn_nerf_tpu.ops.sampling as sampling
    import learn_nerf_tpu.render as render

    print("A: current (rank-scatter merge + batched searchsorted interp)")
    print(f"   {time_loop(build_loop()):.0f} rays/s", flush=True)

    # B: full sort instead of rank-scatter merge.
    orig_merge = sampling.merge_sorted
    render.merge_sorted = lambda a, b: jnp.sort(
        jnp.concatenate([a, b], axis=1), axis=1
    )
    print("B: jnp.sort(concat) merge")
    print(f"   {time_loop(build_loop()):.0f} rays/s", flush=True)
    render.merge_sorted = orig_merge

    # C: vmap(jnp.interp) instead of batched searchsorted interp.
    orig_interp = sampling.batched_interp
    sampling.batched_interp = jax.vmap(jnp.interp)
    print("C: vmap(jnp.interp)")
    print(f"   {time_loop(build_loop()):.0f} rays/s", flush=True)
    sampling.batched_interp = orig_interp

    # D: both reference formulations.
    render.merge_sorted = lambda a, b: jnp.sort(
        jnp.concatenate([a, b], axis=1), axis=1
    )
    sampling.batched_interp = jax.vmap(jnp.interp)
    print("D: sort-merge + vmap interp")
    print(f"   {time_loop(build_loop()):.0f} rays/s", flush=True)


if __name__ == "__main__":
    main()
