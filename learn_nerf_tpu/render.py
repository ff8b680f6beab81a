"""Hierarchical volumetric renderer.

Output contract parity with the reference ``NeRFRenderer.render_rays``
(``learn_nerf/render.py:39-91``) and the free ``render_rays``
(``render.py:293-343``): a dict with ``coarse`` / ``fine`` render results
(``outputs``, ``rgbs``, ``densities``, ``alphas``, ``coords``) plus
``coarse_aux`` / ``fine_aux`` scalar aux-loss means.

TPU-first design differences:

* one straight-line jitted program over ``[N, T]`` tensors — no per-ray
  ``vmap``, no ``[N*T, 3]`` flatten/reshape round-trips (the models accept
  leading batch dims directly),
* the fine pass merges coarse and new samples via ``ops/sampling.
  merge_sorted`` (sort-based — measured fastest on TPU, see its docstring),
* whole frames render as one device program: rays are tiled and scanned
  with ``lax.map`` inside a single jit instead of a chunked host loop with
  per-chunk device syncs (reference ``scripts/render_nerf.py:88-92``).
"""

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from .models.base import FieldModel
from .ops.geometry import ray_bbox_range
from .ops.sampling import inverse_cdf_ts, merge_sorted, stratified_ts
from .ops.volume import (
    average_aux,
    bin_deltas,
    composite,
    composite_alpha,
    termination_weights,
)

Array = jnp.ndarray


def render_ray_samples(
    model: FieldModel,
    params: Any,
    background: Array,
    rays: Array,
    ts: Array,
    t_min: Array,
    t_max: Array,
    mask: Array,
) -> Tuple[Dict[str, Array], Dict[str, Array]]:
    """Evaluate one model over given per-ray samples and composite.

    :param model: the field model.
    :param params: model params.
    :param background: ``[3]`` background color.
    :param rays: ``[N, 2, 3]`` (origin, direction) rays.
    :param ts: ``[N, T]`` sorted sample positions.
    :param t_min: ``[N]``.
    :param t_max: ``[N]``.
    :param mask: ``[N]`` bool bbox-hit mask.
    :return: ``(out, aux_means)`` — out has keys ``outputs`` ``[N,3]``,
             ``rgbs`` ``[N,T,3]``, ``densities`` ``[N,T]``, ``alphas``
             ``[N,1]``, ``coords`` ``[N,3]``, ``weights`` ``[N,T+1]``.
    """
    origins = rays[:, 0:1, :]  # [N, 1, 3]
    dirs = rays[:, 1:2, :]  # [N, 1, 3]
    points = origins + dirs * ts[:, :, None]  # [N, T, 3]
    dirs_b = jnp.broadcast_to(dirs, points.shape)

    density, rgbs, aux = model.apply(dict(params=params), points, dirs_b)
    densities = density[..., 0]  # [N, T]

    _, _, deltas = bin_deltas(ts, t_min, t_max)
    weights = termination_weights(densities, deltas)

    outputs = composite(weights, rgbs, background, mask)
    alphas = composite_alpha(weights, mask)
    coords = composite(weights, points, jnp.zeros(3, dtype=rgbs.dtype), mask)
    aux_means = average_aux(weights, aux, mask)

    return (
        dict(
            outputs=outputs,
            rgbs=rgbs,
            densities=densities,
            alphas=alphas,
            coords=coords,
            weights=weights,
        ),
        aux_means,
    )


@dataclass(frozen=True)
class Renderer:
    """Coarse/fine hierarchy with rendering settings.

    Mirrors the reference ``NeRFRenderer`` fields (``render.py:11-37``) but
    is a frozen config: params/background flow through call arguments so the
    same instance serves training (params traced) and inference.
    """

    coarse: FieldModel
    fine: FieldModel
    bbox_min: Tuple[float, float, float]
    bbox_max: Tuple[float, float, float]
    coarse_ts: int
    fine_ts: int
    min_t_range: float = 1e-3

    def render_rays(
        self,
        key: jax.Array,
        rays: Array,
        coarse_params: Any,
        fine_params: Any,
        background: Array,
    ) -> Dict[str, Any]:
        """Render a ray batch through the full hierarchy.

        :param key: PRNG key for sample jitter.
        :param rays: ``[N, 2, 3]`` (origin, direction).
        :return: dict with ``coarse``, ``fine``, ``coarse_aux``, ``fine_aux``.
        """
        bbox_min = jnp.asarray(self.bbox_min, dtype=jnp.float32)
        bbox_max = jnp.asarray(self.bbox_max, dtype=jnp.float32)
        t_min, t_max, mask = ray_bbox_range(
            rays[:, 0], rays[:, 1], bbox_min, bbox_max, self.min_t_range
        )

        coarse_key, fine_key = jax.random.split(key)
        ts_c = stratified_ts(coarse_key, t_min, t_max, self.coarse_ts)
        coarse_out, coarse_aux = render_ray_samples(
            self.coarse, coarse_params, background, rays, ts_c, t_min, t_max, mask
        )

        # Importance-sample the fine pass from the coarse opacity profile;
        # gradients must not flow into the sampler (reference render.py:73-77).
        w_sg = jax.lax.stop_gradient(coarse_out["weights"][:, :-1])
        _, ends_c, _ = bin_deltas(ts_c, t_min, t_max)
        ts_new = inverse_cdf_ts(fine_key, w_sg, t_min, ends_c, self.fine_ts)
        ts_f = merge_sorted(ts_c, ts_new)

        fine_out, fine_aux = render_ray_samples(
            self.fine, fine_params, background, rays, ts_f, t_min, t_max, mask
        )

        return dict(
            coarse=coarse_out,
            fine=fine_out,
            coarse_aux=coarse_aux,
            fine_aux=fine_aux,
        )


def pad_rays_to_tiles(rays, tile_size: int, mesh, bbox_max):
    """Pad ``[M, 2, 3]`` rays up to a whole number of tiles (a multiple
    of the mesh's data-axis size when sharded).

    THE tile/pad layout for every whole-frame renderer (this module and
    ``occ_render`` share it — duplicated copies drifted once).  Pad rays
    provably MISS the bbox (origin beyond the max corner, direction
    pointing further away): zero rays pass the slab test at the scene
    center, which is harmless where outputs get sliced off but poisons
    pooled-slot accounting and drop counters.

    :return: ``(rays_padded [num_tiles * tile_size, 2, 3], num_tiles)``.
    """
    n_dev = 1
    if mesh is not None:
        from .parallel.mesh import DATA_AXIS

        n_dev = mesh.shape[DATA_AXIS]
    m = rays.shape[0]
    per_chunk = n_dev * tile_size
    num_tiles = -(-m // per_chunk) * n_dev
    padded = num_tiles * tile_size
    if padded > m:
        far_corner = jnp.asarray(bbox_max, jnp.float32) + 1.0
        pad_ray = jnp.stack([far_corner, jnp.ones(3, jnp.float32)])
        rays = jnp.concatenate(
            [rays, jnp.broadcast_to(pad_ray, (padded - m, 2, 3))], axis=0
        )
    return rays, num_tiles


def render_frame(
    renderer: Renderer,
    key: jax.Array,
    rays: Array,
    coarse_params: Any,
    fine_params: Any,
    background: Array,
    tile_size: int = 4096,
    include_depth_outputs: bool = False,
    mesh=None,
) -> Dict[str, Array]:
    """Render all rays of a frame as a single device program.

    Rays are padded to a multiple of ``tile_size`` and scanned tile by tile
    with ``lax.map`` so only one compiled program launches per frame.  With
    ``mesh``, the tiles distribute over the ``data`` axis with
    ``shard_map`` — each device scans its own tile subset with fully
    replicated params, so a v5e-8 renders ~8x faster with zero collectives
    in the hot path (outputs gather once at the end).

    :param rays: ``[M, 2, 3]`` rays in raster order.
    :param include_depth_outputs: also return ``alphas`` and ``coords``
        (used by dataset distillation, reference
        ``scripts/render_new_dataset.py:99-123``).
    :return: dict with ``outputs`` ``[M, 3]`` (and optionally ``alphas``
             ``[M, 1]``, ``coords`` ``[M, 3]``).
    """
    m = rays.shape[0]
    rays_p, num_tiles = pad_rays_to_tiles(
        rays, tile_size, mesh, renderer.bbox_max
    )
    rays_t = rays_p.reshape(num_tiles, tile_size, 2, 3)
    keys = jax.random.split(key, num_tiles)

    def scan_tiles(keys, rays_t, cp, fp, bg):
        def tile_fn(args):
            k, r = args
            out = renderer.render_rays(k, r, cp, fp, bg)
            fine = out["fine"]
            res = dict(outputs=fine["outputs"])
            if include_depth_outputs:
                res.update(alphas=fine["alphas"], coords=fine["coords"])
            return res

        return jax.lax.map(tile_fn, (keys, rays_t))

    if mesh is None:
        tiled = scan_tiles(keys, rays_t, coarse_params, fine_params, background)
    else:
        from jax.sharding import PartitionSpec as P

        from .parallel.mesh import DATA_AXIS

        fn = jax.shard_map(
            scan_tiles,
            mesh=mesh,
            in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(), P(), P()),
            out_specs=P(DATA_AXIS),
        )
        tiled = fn(keys, rays_t, coarse_params, fine_params, background)
    return {
        k: v.reshape((rays_p.shape[0],) + v.shape[2:])[:m]
        for k, v in tiled.items()
    }


def render_frame_sharded(
    renderer: Renderer,
    key: jax.Array,
    rays: Array,
    coarse_params: Any,
    fine_params: Any,
    background: Array,
    mesh,
    tile_size: int = 4096,
) -> Array:
    """Colors-only wrapper over :func:`render_frame` with a mesh.

    :param rays: ``[M, 2, 3]`` rays in raster order.
    :return: ``[M, 3]`` colors.
    """
    return render_frame(
        renderer,
        key,
        rays,
        coarse_params,
        fine_params,
        background,
        tile_size=tile_size,
        mesh=mesh,
    )["outputs"]
