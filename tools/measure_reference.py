"""Measure the reference implementation's training throughput on the current
JAX device (the reference publishes no numbers — BASELINE.md requires
measuring it ourselves).

Usage:  python tools/measure_reference.py [--instant_ngp] [--batch 4096]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/reference")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--instant_ngp", action="store_true")
    ap.add_argument("--ref_nerf", action="store_true")
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--coarse", type=int, default=64)
    ap.add_argument("--fine", type=int, default=128)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from learn_nerf.train import TrainLoop
    from learn_nerf.model import NeRFModel
    from learn_nerf.instant_ngp import InstantNGPModel

    print("device:", jax.devices()[0])
    bbox_min = jnp.array([-1.0, -1.0, -1.0])
    bbox_max = jnp.array([1.0, 1.0, 1.0])

    if args.instant_ngp:
        from functools import partial

        if args.ref_nerf:
            from learn_nerf.instant_ngp import InstantNGPRefNERFModel

            model_cls = partial(InstantNGPRefNERFModel, sh_degree=4)
            tag = "instant_ngp_ref_nerf"
        else:
            model_cls = InstantNGPModel
            tag = "instant_ngp"
        coarse = model_cls(
            table_sizes=[2**18] * 6,
            grid_sizes=[2 ** (4 + i // 2) for i in range(6)],
            bbox_min=bbox_min,
            bbox_max=bbox_max,
        )
        fine = model_cls(
            table_sizes=[2**18] * 16,
            grid_sizes=[2 ** (4 + i // 2) for i in range(16)],
            bbox_min=bbox_min,
            bbox_max=bbox_max,
        )
        kwargs = dict(adam_eps=1e-15, adam_b1=0.9, adam_b2=0.99)
    elif args.ref_nerf:
        from learn_nerf.ref_nerf import RefNERFModel

        coarse = RefNERFModel(sh_degree=4)
        fine = RefNERFModel(sh_degree=4)
        kwargs, tag = dict(), "ref_nerf"
    else:
        coarse, fine, kwargs, tag = NeRFModel(), NeRFModel(), dict(), "vanilla"

    loop = TrainLoop(
        coarse,
        fine,
        init_rng=jax.random.PRNGKey(0),
        lr=1e-4,
        coarse_ts=args.coarse,
        fine_ts=args.fine,
        **kwargs,
    )
    step_fn = loop.step_fn(bbox_min, bbox_max)

    rng = np.random.RandomState(0)
    origins = rng.randn(args.batch, 3).astype(np.float32)
    dirs = rng.randn(args.batch, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    colors = rng.rand(args.batch, 3).astype(np.float32) * 2 - 1
    batch = jnp.asarray(np.stack([origins, dirs, colors], axis=1))

    key = jax.random.PRNGKey(1)
    t0 = time.time()
    for i in range(args.warmup):
        key, sk = jax.random.split(key)
        vals = step_fn(sk, batch)
    jax.block_until_ready(loop.state.params)
    print(f"warmup ({args.warmup} steps incl. compile): {time.time()-t0:.1f}s")

    t0 = time.time()
    for i in range(args.steps):
        key, sk = jax.random.split(key)
        vals = step_fn(sk, batch)
    jax.block_until_ready(loop.state.params)
    dt = time.time() - t0
    rays_per_sec = args.batch * args.steps / dt
    print(
        f"reference {tag}: batch={args.batch} coarse={args.coarse} fine={args.fine} "
        f"steps={args.steps} time={dt:.2f}s rays/sec={rays_per_sec:.0f}"
    )


if __name__ == "__main__":
    main()
