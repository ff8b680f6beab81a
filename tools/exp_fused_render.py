"""Vanilla 800x800 frame: XLA occupancy path vs the fused Pallas chain.

Usage (TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_fused_render.py \
        runs/ours_vanilla_occ.pkl runs/scene_test/0000.json runs/scene_train/metadata.json
"""

import sys
import time


def main():
    ckpt, view_json, metadata_json = sys.argv[1:4]
    size = int(sys.argv[4]) if len(sys.argv) > 4 else 800
    samples = int(sys.argv[5]) if len(sys.argv) > 5 else 24

    import jax
    import jax.numpy as jnp

    from learn_nerf_tpu.acceleration import OccupancyGrid
    from learn_nerf_tpu.checkpoint import load_params_pickle
    from learn_nerf_tpu.data.camera import CameraView
    from learn_nerf_tpu.data.dataset import ModelMetadata
    from learn_nerf_tpu.models import NeRFModel
    from learn_nerf_tpu.occ_render import OccupancyRenderer, render_frame_occupancy
    from tools.pallas_recipe.fused_render import (
        fused_render_frame,
        pack_vanilla_params,
    )

    params = load_params_pickle(ckpt)
    meta = ModelMetadata.from_json(metadata_json)
    grid = OccupancyGrid(
        bbox_min=tuple(meta.bbox_min),
        bbox_max=tuple(meta.bbox_max),
        resolution=int(params.get("occupancy_resolution", 128)),
    )
    grid_state = grid.state_from_checkpoint(params)
    renderer = OccupancyRenderer(
        model=NeRFModel(),
        grid=grid,
        bbox_min=tuple(meta.bbox_min),
        bbox_max=tuple(meta.bbox_max),
        candidates=64,
        samples=samples,
    )
    view = CameraView.from_json(view_json)
    rays = jnp.asarray(view.bare_rays(size, size))
    bg = jnp.asarray(params["background"], jnp.float32)
    fine = params["fine"]
    packed = pack_vanilla_params(fine)

    @jax.jit
    def xla_frame(key, rays):
        return render_frame_occupancy(
            renderer, key, rays, fine, bg, grid_state, tile_size=8192
        )["outputs"]

    @jax.jit
    def fused_frame(key, rays):
        return fused_render_frame(
            renderer, packed, key, rays, bg, grid_state, tile_size=8192
        )

    key = jax.random.PRNGKey(0)
    for name, fn in (("xla", xla_frame), ("fused", fused_frame)):
        out = fn(key, rays)
        float(out.mean())  # compile + real sync
        t0 = time.time()
        out = fn(key, rays)
        m = float(out.mean())
        dt = time.time() - t0
        print(
            f"{name}: {dt:.3f} s/frame ({size}x{size}, K={samples}, "
            f"{rays.shape[0] / dt / 1e6:.2f}M rays/s, mean={m:.4f})",
            flush=True,
        )


if __name__ == "__main__":
    main()
