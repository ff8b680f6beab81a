"""Fused render-chain kernel vs the XLA occupancy renderer (interpret mode)."""

import numpy as np


def _setup(n=96, candidates=24, samples=8, seed=3):
    import jax
    import jax.numpy as jnp

    from learn_nerf_tpu.acceleration import OccupancyGrid
    from learn_nerf_tpu.models import NeRFModel
    from learn_nerf_tpu.occ_render import OccupancyRenderer

    model = NeRFModel()
    params = model.init(
        dict(params=jax.random.PRNGKey(0)), jnp.zeros((1, 3)), jnp.zeros((1, 3))
    )["params"]
    grid = OccupancyGrid(bbox_min=(-1, -1, -1), bbox_max=(1, 1, 1), resolution=8)
    rng = np.random.RandomState(seed)
    densities = jnp.asarray((rng.rand(8**3) < 0.5).astype(np.float32))
    grid_state = grid.init().replace(
        densities=densities,
        step=jnp.asarray(grid.warmup_updates, jnp.int32),  # past warmup
    )
    renderer = OccupancyRenderer(
        model=model,
        grid=grid,
        bbox_min=(-1, -1, -1),
        bbox_max=(1, 1, 1),
        candidates=candidates,
        samples=samples,
    )
    origins = rng.randn(n, 3).astype(np.float32) * 2.5
    dirs = rng.randn(n, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    rays = jnp.asarray(np.stack([origins, dirs], axis=1))
    return model, params, renderer, grid_state, rays


def test_fused_render_matches_xla_occupancy_path():
    import jax
    import jax.numpy as jnp

    from tools.pallas_recipe.fused_render import (
        fused_render_occupancy,
        pack_vanilla_params,
    )

    model, params, renderer, grid_state, rays = _setup()
    background = jnp.asarray([0.4, -0.1, 0.7])
    key = jax.random.PRNGKey(11)

    ref_out, _ = renderer.render_rays(key, rays, params, background, grid_state)
    packed = pack_vanilla_params(params)
    fused = fused_render_occupancy(
        renderer, packed, key, rays, background, grid_state, interpret=True
    )

    assert fused["outputs"].shape == ref_out["outputs"].shape
    # bf16 MLP matmuls inside the kernel; the XLA reference path runs f32.
    np.testing.assert_allclose(
        np.asarray(fused["outputs"]), np.asarray(ref_out["outputs"]), atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(fused["alphas"]), np.asarray(ref_out["alphas"]), atol=2e-2
    )
    # Rays that miss the bbox give exactly the background.
    from learn_nerf_tpu.ops.geometry import ray_bbox_range

    _, _, mask = ray_bbox_range(
        rays[:, 0], rays[:, 1], jnp.full(3, -1.0), jnp.ones(3)
    )
    missed = ~np.asarray(mask)
    if missed.any():
        np.testing.assert_allclose(
            np.asarray(fused["outputs"])[missed],
            np.broadcast_to(np.asarray(background), (missed.sum(), 3)),
            atol=1e-6,
        )


def test_fused_render_frame_tiles_and_pads():
    """The tiled whole-frame driver matches per-batch fused output across
    tile boundaries and handles a ray count that is not a tile multiple."""
    import jax
    import jax.numpy as jnp

    from tools.pallas_recipe.fused_render import (
        fused_render_frame,
        fused_render_occupancy,
        pack_vanilla_params,
    )

    model, params, renderer, grid_state, rays = _setup(n=70)
    background = jnp.asarray([0.2, 0.1, -0.3])
    key = jax.random.PRNGKey(5)
    packed = pack_vanilla_params(params)

    frame = fused_render_frame(
        renderer, packed, key, rays, background, grid_state,
        tile_size=32, interpret=True,
    )
    assert frame.shape == (70, 3)

    # Same keys per tile as the driver uses -> per-tile outputs must match.
    keys = jax.random.split(key, 3)
    rays_p = jnp.pad(rays, ((0, 96 - 70), (0, 0), (0, 0)))
    expect = []
    for i in range(3):
        out = fused_render_occupancy(
            renderer, packed, keys[i], rays_p[32 * i : 32 * (i + 1)],
            background, grid_state, interpret=True,
        )["outputs"]
        expect.append(np.asarray(out))
    np.testing.assert_allclose(
        np.asarray(frame), np.concatenate(expect)[:70], rtol=1e-5, atol=1e-5
    )
