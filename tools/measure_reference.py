"""Measure the reference implementation's training throughput on the current
JAX device (the reference publishes no numbers — BASELINE.md requires
measuring it ourselves).

Device-bound methodology (symmetric with bench.py's treatment of our
loops): the batch is device-resident, all PRNG keys are split BEFORE the
timed window (a host-side split per step costs a relay round trip on this
runtime — CLAUDE.md), and the window is fenced by a host float() fetch of
a trained param leaf (``jax.block_until_ready`` can return early on this
backend, inflating rates ~1000x — CLAUDE.md).

Usage:  python tools/measure_reference.py [--instant_ngp] [--ref_nerf]
"""

import argparse
import sys
import time
from types import SimpleNamespace

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

    # The reference's own model factory (no duplicated model zoo: the
    # measured baseline is exactly what tools/train_reference.py trains).
    from learn_nerf.scripts.train_nerf import create_model
    from learn_nerf.train import TrainLoop

    print("device:", jax.devices()[0])
    bbox_min = jnp.array([-1.0, -1.0, -1.0])
    bbox_max = jnp.array([1.0, 1.0, 1.0])
    metadata = SimpleNamespace(
        bbox_min=[-1.0, -1.0, -1.0], bbox_max=[1.0, 1.0, 1.0]
    )
    if args.instant_ngp:
        tag = "instant_ngp_ref_nerf" if args.ref_nerf else "instant_ngp"
    else:
        tag = "ref_nerf" if args.ref_nerf else "vanilla"
    coarse, fine, kwargs = create_model(args, metadata)

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

    def fence():
        # Host fetch of a value that depends on the completed step chain.
        leaf = jax.tree_util.tree_leaves(loop.state.params)[0]
        return float(jnp.asarray(leaf).ravel()[0])

    all_keys = jax.random.split(
        jax.random.PRNGKey(1), args.warmup + args.steps
    )
    t0 = time.time()
    for i in range(args.warmup):
        step_fn(all_keys[i], batch)
    fence()
    print(f"warmup ({args.warmup} steps incl. compile): {time.time()-t0:.1f}s")

    t0 = time.time()
    for i in range(args.steps):
        step_fn(all_keys[args.warmup + i], batch)
    fence()
    dt = time.time() - t0
    rays_per_sec = args.batch * args.steps / dt
    print(
        f"reference {tag}: batch={args.batch} coarse={args.coarse} fine={args.fine} "
        f"steps={args.steps} time={dt:.2f}s rays/sec={rays_per_sec:.0f}"
    )


if __name__ == "__main__":
    main()
