"""Train the REFERENCE implementation on a dataset, for matched-PSNR runs.

Drives /root/reference's own TrainLoop/create_model/dataset code unmodified
(imported, not copied), but logs every N steps instead of every step so the
measured rays/sec reflects device throughput, not the remote runtime's
device->host round trip per printed metric (the reference CLI formats
floats every step; on this relay that costs more than the step itself and
would unfairly deflate the reference's numbers).

Usage (TPU):
    python tools/train_reference.py --instant_ngp --batch_size 4096 \
        --steps 1500 --lr 1e-2 --save_path runs/ref_ngp.pkl runs/scene_train
"""

import argparse
import os
import sys
import time

sys.path.insert(0, "/root/reference")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--batch_size", type=int, default=4096)
    parser.add_argument("--coarse_samples", type=int, default=64)
    parser.add_argument("--fine_samples", type=int, default=128)
    parser.add_argument("--steps", type=int, default=1500)
    parser.add_argument("--log_interval", type=int, default=25)
    parser.add_argument("--save_path", type=str, required=True)
    parser.add_argument("--instant_ngp", action="store_true")
    parser.add_argument("--ref_nerf", action="store_true")
    parser.add_argument("data_dir", type=str)
    args = parser.parse_args()

    import jax
    from learn_nerf.dataset import load_dataset
    from learn_nerf.scripts.train_nerf import create_model
    from learn_nerf.train import TrainLoop

    print("loading dataset...", flush=True)
    data = load_dataset(args.data_dir)

    # create_model reads only args.instant_ngp / args.ref_nerf; the
    # reference CLI's density penalty (off by default) stays off here too
    # (TrainLoop's own defaults).
    coarse, fine, train_kwargs = create_model(args, data.metadata)
    loop = TrainLoop(
        coarse,
        fine,
        init_rng=jax.random.PRNGKey(1234),
        lr=args.lr,
        coarse_ts=args.coarse_samples,
        fine_ts=args.fine_samples,
        **train_kwargs,
    )
    step_fn = loop.step_fn(
        jax.numpy.array(data.metadata.bbox_min),
        jax.numpy.array(data.metadata.bbox_max),
    )

    print("training...", flush=True)
    key = jax.random.PRNGKey(42)
    shuffle_dir = os.path.join(args.data_dir, "shuffled_ref")
    last_t, last_i = None, 0
    for i, batch in enumerate(
        data.iterate_batches(shuffle_dir, jax.random.PRNGKey(7), args.batch_size)
    ):
        key, step_key = jax.random.split(key)
        losses = step_fn(step_key, batch)
        if i % args.log_interval == 0:
            # Fence with ONE loss fetch, take the timestamp, and only then
            # format the remaining metrics (each float() is a relay round
            # trip; ~6 of them before the timestamp would land inside the
            # measured interval and deflate the reported rate).
            float(losses.get("fine", next(iter(losses.values()))))
            now = time.monotonic()
            msg = " ".join(f"{k}={float(v):.05}" for k, v in losses.items())
            if last_t is not None:
                rate = (i - last_i) * args.batch_size / (now - last_t)
                msg += f" rays_per_sec={rate:.05}"
            print(f"step {i}: {msg}", flush=True)
            # Start the next interval AFTER the metric formatting so its
            # fetch cost stays out of both windows.
            last_t, last_i = time.monotonic(), i
        if i and i % 500 == 0:
            # Periodic save: the multi-hour reference runs sit under queue
            # timeouts and a wedge-prone relay — losing the whole run (and
            # the downstream eval) to a kill at step N-1 wastes the chip
            # budget.  The reference CLI itself saves every save_interval.
            loop.save(args.save_path)
        if i + 1 >= args.steps:
            break
    loop.save(args.save_path)
    print("saved", args.save_path, flush=True)


if __name__ == "__main__":
    main()
