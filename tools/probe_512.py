"""Isolate the 512^3 bake TPU-worker crash (2026-08-19, measure_baked).

``bake_instant_ngp(512)`` killed the TPU worker twice ("TPU worker
process crashed or restarted ... kernel fault", runs/measure_baked.log)
at the post-sweep host fetch.  The sweep output at 512^3 x 16 features
is EXACTLY 2^31 bf16 elements ([512, 32768, 128]) — a signed-int32
linear-index boundary — while the 384^3 pack-4 segment table (3.62e9
elements, [7077888, 512]) renders fine, so the boundary, if real, is
per-kernel, not per-buffer-size.  This probe separates the hypotheses in
one bounded chip session, cheapest first, with a flushed marker line
before each stage so a worker crash identifies the stage that killed it:

  A1  allocate+use a 2^31-element bf16 buffer ([512, 32768, 128])
  A2  host-dispatched reshape of it to [16777216, 128] (the exact op
      the pre-fix bake dispatched; baked.py now folds this into the
      sweep program)
  B   the real ``bake_instant_ngp(512)`` on the trained checkpoint
      (post-fix code: in-program collapse, no separate reshape)

Usage: python tools/probe_512.py CKPT METADATA [--resolution 512]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("ckpt")
    p.add_argument("metadata_json")
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--skip_buffer_probe", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    print(f"devices: {jax.devices()}", flush=True)

    if not args.skip_buffer_probe:
        t0 = time.time()
        print("A1: allocating [512, 32768, 128] bf16 (2^31 elements)...",
              flush=True)
        x = jax.jit(lambda: jnp.full((512, 32768, 128), 2.0, jnp.bfloat16))()
        print(f"A1 ok: corner={float(x[-1, -1, -1])} "
              f"({time.time() - t0:.1f}s)", flush=True)

        t0 = time.time()
        print("A2: host-dispatched reshape to [16777216, 128]...", flush=True)
        y = x.reshape(-1, 128)
        print(f"A2 ok: corner={float(y[-1, -1])} "
              f"({time.time() - t0:.1f}s)", flush=True)
        del x, y

    from learn_nerf_tpu.baked import bake_instant_ngp
    from learn_nerf_tpu.checkpoint import load_params_pickle
    from learn_nerf_tpu.data.dataset import ModelMetadata
    from learn_nerf_tpu.scripts.common import create_model

    metadata = ModelMetadata.from_json(args.metadata_json)
    params = load_params_pickle(args.ckpt)
    _, model, _ = create_model(
        argparse.Namespace(instant_ngp=True, ref_nerf=False, bf16=False),
        metadata,
    )
    r = args.resolution
    print(f"B: bake_instant_ngp({r})...", flush=True)
    baked, baked_params = bake_instant_ngp(model, params["fine"], r)
    g = baked_params["grid"]
    print(f"B ok: grid {g.shape} {g.dtype} "
          f"({g.size * g.dtype.itemsize / 1e9:.2f} GB)", flush=True)
    print("PROBE_512 PASS", flush=True)


if __name__ == "__main__":
    main()
