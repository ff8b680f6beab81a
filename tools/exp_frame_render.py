"""Measure 800x800 NGP+occupancy frame render time across sampling configs.

Usage (TPU):
    python tools/exp_frame_render.py runs/ours_ngp_occ.pkl runs/scene_test/0000.json \
        runs/scene_train/metadata.json

Times the fixed-K path and the pooled/early-termination path at several
budgets; informs the BASELINE.md frame-rendering table and the default
flags of render_nerf.  Timing forces a host fetch (block_until_ready is
unreliable on this backend — CLAUDE.md).
"""

import sys
import time

import numpy as np


def main():
    ckpt, view_json, metadata_json = sys.argv[1:4]
    size = int(sys.argv[4]) if len(sys.argv) > 4 else 800

    import jax
    import jax.numpy as jnp

    from learn_nerf_tpu.acceleration import OccupancyGrid
    from learn_nerf_tpu.checkpoint import load_params_pickle
    from learn_nerf_tpu.data.camera import CameraView
    from learn_nerf_tpu.data.dataset import ModelMetadata
    from learn_nerf_tpu.models import InstantNGPModel
    from learn_nerf_tpu.occ_render import OccupancyRenderer, render_frame_occupancy

    params = load_params_pickle(ckpt)
    meta = ModelMetadata.from_json(metadata_json)
    grid = OccupancyGrid(
        bbox_min=tuple(meta.bbox_min),
        bbox_max=tuple(meta.bbox_max),
        resolution=int(params["occupancy_resolution"]),
    )
    grid_state = grid.state_from_checkpoint(params)
    occ_frac = float((np.asarray(grid_state.densities) > grid.threshold).mean())
    print(f"grid occupancy: {occ_frac:.3f}")

    model = InstantNGPModel(
        table_sizes=[2**18] * 16,
        grid_sizes=[2 ** (4 + i // 2) for i in range(16)],
        bbox_min=tuple(meta.bbox_min),
        bbox_max=tuple(meta.bbox_max),
    )
    view = CameraView.from_json(view_json)
    rays = jnp.asarray(view.bare_rays(size, size))
    bg = jnp.asarray(params["background"], jnp.float32)

    configs = [
        ("pooled K=32 b=10 eps=1e-2", dict(samples=32, budget_per_ray=10.0, eps=1e-2)),
        ("pooled K=16 b=5 eps=1e-2", dict(samples=16, budget_per_ray=5.0, eps=1e-2)),
    ]
    for name, cfg in configs:
        renderer = OccupancyRenderer(
            model=model,
            grid=grid,
            bbox_min=tuple(meta.bbox_min),
            bbox_max=tuple(meta.bbox_max),
            candidates=192,
            samples=cfg["samples"],
        )

        @jax.jit
        def frame(key, rays):
            return render_frame_occupancy(
                renderer,  # noqa: B023 (rebuilt per config, jit per config)
                key,
                rays,
                params["fine"],
                bg,
                grid_state,
                tile_size=8192,
                budget_per_ray=cfg["budget_per_ray"],  # noqa: B023
                transmittance_eps=cfg["eps"],  # noqa: B023
            )["outputs"]

        key = jax.random.PRNGKey(0)
        out = frame(key, rays)
        float(out.mean())  # compile + sync
        t0 = time.time()
        out = frame(key, rays)
        float(out.mean())
        dt = time.time() - t0
        print(
            f"{name}: {dt:.3f} s/frame ({size}x{size}, "
            f"{rays.shape[0] / dt / 1e3:.1f}k rays/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
