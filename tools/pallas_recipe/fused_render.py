"""Fused vanilla-NeRF render chain as a single Pallas TPU kernel.

Extends :mod:`fused_mlp` (MLP only) through the rest of the per-ray
pipeline (SURVEY.md section 7 step 4): for each tile of R rays x K samples

    points -> sinusoidal encoding -> 9-layer MLP -> density/rgb heads
    -> termination-weight scan over K -> composite

entirely in VMEM, writing only ``[R, 4]`` per tile (foreground RGB +
background weight) to HBM.  The XLA path materializes the ``[N*K, 256]``
activations of every layer plus ``[N, K]`` densities / ``[N, K, 3]`` rgbs
in HBM; here nothing per-sample ever leaves the chip.

RETIRED from the production tree (kept as the in-repo Pallas recipe):
measured on the 800x800 compound-scene frame (TPU v5e, K=24), the fused
chain renders in 2.07 s vs the plain-XLA occupancy path's 1.53 s at
identical outputs — XLA's own pipelining of sampling + MLP + composite
beats the hand-fused kernel once the whole frame is tiled.  Weights ride
in VMEM across the whole grid (~1.2 MB bf16); matmuls run on the MXU in
bf16 with f32 accumulation.

Numerics match ``models.vanilla.NeRFModel(compute_dtype="bfloat16")`` +
``ops.volume.termination_weights`` + ``composite`` (tests/test_fused_render.py).
"""

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tools.pallas_recipe.fused_mlp import pack_vanilla_params  # noqa: F401  (re-exported)

Array = jnp.ndarray

RAY_TILE = 256  # rays per kernel invocation; M = RAY_TILE * K sample rows


def _kernel(
    input_layers,
    mid_layers,
    rays_per_tile,
    samples,
    points_ref,
    dirs_ref,
    deltas_ref,
    *ops_and_out,
):
    ops = ops_and_out[:-1]
    out_ref = ops_and_out[-1]
    it = iter(ops)
    proj_x, phase_x, proj_d, phase_d = next(it), next(it), next(it), next(it)

    def matmul(z, w_ref, b_ref):
        return (
            jnp.dot(
                z.astype(jnp.bfloat16),
                w_ref[:],
                preferred_element_type=jnp.float32,
            )
            + b_ref[:]
        )

    def sincos(x, proj, phase):
        # HIGHEST precision: the f32 coordinates must reach the 2^freq
        # scaling un-rounded or high-frequency phases are O(1) rad off
        # (see ops.fused_mlp._sincos).
        return jnp.sin(
            jnp.dot(
                x,
                proj[:],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            + phase[:]
        )

    emb_x = sincos(points_ref[:], proj_x, phase_x)
    z = emb_x
    for _ in range(input_layers):
        z = jax.nn.relu(matmul(z, next(it), next(it)))
    w_z, w_e, b_s = next(it), next(it), next(it)
    z = matmul(z, w_z, b_s) + jnp.dot(
        emb_x.astype(jnp.bfloat16), w_e[:], preferred_element_type=jnp.float32
    )
    for _ in range(mid_layers - 1):
        z = matmul(jax.nn.relu(z), next(it), next(it))
    density = jax.nn.softplus(matmul(z, next(it), next(it)))  # [M, 1]
    emb_d = sincos(dirs_ref[:], proj_d, phase_d)
    w_cz, w_cd, b_c = next(it), next(it), next(it)
    c = jax.nn.relu(
        matmul(z, w_cz, b_c)
        + jnp.dot(
            emb_d.astype(jnp.bfloat16), w_cd[:], preferred_element_type=jnp.float32
        )
    )
    rgb = jnp.tanh(matmul(c, next(it), next(it)))  # [M, 3]

    # Per-ray transmittance scan and composite: rows are ray-major, so the
    # [M, 1] density column folds to [R, K] with samples on lanes.
    sig_dt = density.reshape(rays_per_tile, samples) * deltas_ref[:]
    # Inclusive cumsum over lanes as a [K, K] lower-triangular matmul:
    # Mosaic has no cumsum lowering, and at K<=32 the matmul is free on
    # the MXU.  HIGHEST precision — transmittances must not round to bf16.
    tri = jnp.tril(jnp.ones((samples, samples), jnp.float32))
    acc = jnp.dot(
        sig_dt,
        tri.T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    survive = jnp.exp(-(acc - sig_dt))
    weights = survive * (1.0 - jnp.exp(-sig_dt))  # [R, K]
    bg_weight = jnp.exp(-acc[:, -1:])  # [R, 1]

    channels = [
        jnp.sum(weights * rgb[:, ch].reshape(rays_per_tile, samples), axis=1)[
            :, None
        ]
        for ch in range(3)
    ]
    out_ref[:] = jnp.concatenate(channels + [bg_weight], axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("input_layers", "mid_layers", "interpret"),
)
def fused_render_tiles(
    packed: Tuple[Array, ...],
    points: Array,
    dirs: Array,
    deltas: Array,
    input_layers: int = 5,
    mid_layers: int = 4,
    interpret: bool = False,
) -> Array:
    """Fused render of per-ray sample batches.

    :param packed: :func:`pack_vanilla_params` output.
    :param points: ``[N, K, 3]`` sample positions (ray-major).
    :param dirs: ``[N, 3]`` ray directions.
    :param deltas: ``[N, K]`` per-sample bin widths; ZERO for padding
        slots (mask folded in by the caller).
    :return: ``[N, 4]``: composited foreground RGB and background weight.
    """
    n, k, _ = points.shape
    padded_n = -(-n // RAY_TILE) * RAY_TILE
    if padded_n != n:
        pad = ((0, padded_n - n), (0, 0), (0, 0))
        points = jnp.pad(points, pad)
        dirs = jnp.pad(dirs, ((0, padded_n - n), (0, 0)))
        deltas = jnp.pad(deltas, ((0, padded_n - n), (0, 0)))
    m_tile = RAY_TILE * k
    points_f = points.reshape(padded_n * k, 3)
    dirs_f = jnp.broadcast_to(dirs[:, None, :], (padded_n, k, 3)).reshape(
        padded_n * k, 3
    )

    grid = padded_n // RAY_TILE
    sample_spec = pl.BlockSpec(
        (m_tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    delta_spec = pl.BlockSpec(
        (RAY_TILE, k), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    weight_specs = [
        pl.BlockSpec(
            op.shape,
            functools.partial(lambda ndim, i: (0,) * ndim, len(op.shape)),
            memory_space=pltpu.VMEM,
        )
        for op in packed
    ]
    out = pl.pallas_call(
        functools.partial(_kernel, input_layers, mid_layers, RAY_TILE, k),
        out_shape=jax.ShapeDtypeStruct((padded_n, 4), jnp.float32),
        grid=(grid,),
        in_specs=[sample_spec, sample_spec, delta_spec] + weight_specs,
        out_specs=pl.BlockSpec(
            (RAY_TILE, 4), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(points_f, dirs_f, deltas, *packed)
    return out[:n]


def fused_render_frame(
    renderer,
    packed: Tuple[Array, ...],
    key: jax.Array,
    rays: Array,
    background: Array,
    grid_state,
    tile_size: int = 8192,
    interpret: bool = False,
) -> Array:
    """Whole-frame fused rendering, tiled with ``lax.map``.

    Bounding the per-kernel ray count matters beyond VMEM: the XLA-side
    glue around the kernel builds ``[N, K, 3]`` sample arrays whose minor
    dim pads 3 -> 128 lanes (42x HBM expansion) — at whole-frame N that
    OOMs the chip, per-tile it is an ephemeral ~100 MB.

    :param rays: ``[M, 2, 3]`` rays in raster order.
    :return: ``[M, 3]`` colors.
    """
    m = rays.shape[0]
    num_tiles = -(-m // tile_size)
    padded = num_tiles * tile_size
    rays_p = jnp.pad(rays, ((0, padded - m), (0, 0), (0, 0)))
    rays_t = rays_p.reshape(num_tiles, tile_size, 2, 3)
    keys = jax.random.split(key, num_tiles)

    def tile_fn(args):
        k, r = args
        return fused_render_occupancy(
            renderer, packed, k, r, background, grid_state,
            interpret=interpret,
        )["outputs"]

    tiled = jax.lax.map(tile_fn, (keys, rays_t))
    return tiled.reshape(padded, 3)[:m]


def fused_render_occupancy(
    renderer,
    packed: Tuple[Array, ...],
    key: jax.Array,
    rays: Array,
    background: Array,
    grid_state,
    interpret: bool = False,
) -> Dict[str, Array]:
    """Occupancy-culled vanilla rendering through the fused kernel.

    Drop-in for :meth:`OccupancyRenderer.render_rays`'s ``outputs`` path
    (vanilla model only): sampling/culling stay in XLA, the per-sample
    pipeline runs fused.
    """
    from learn_nerf_tpu.acceleration import compact_occupied_strided
    from learn_nerf_tpu.ops.geometry import ray_bbox_range
    from learn_nerf_tpu.ops.sampling import stratified_ts

    bbox_min = jnp.asarray(renderer.bbox_min, dtype=jnp.float32)
    bbox_max = jnp.asarray(renderer.bbox_max, dtype=jnp.float32)
    origins, dirs = rays[:, 0], rays[:, 1]
    t_min, t_max, mask = ray_bbox_range(
        origins, dirs, bbox_min, bbox_max, renderer.min_t_range
    )
    cand_ts = stratified_ts(key, t_min, t_max, renderer.candidates)
    cand_pts = origins[:, None, :] + dirs[:, None, :] * cand_ts[..., None]
    occ = renderer.grid.occupied(grid_state, cand_pts)
    occ = occ & mask[:, None]
    sel_ts, sel_mask, delta_scale = compact_occupied_strided(
        cand_ts, occ, renderer.samples
    )
    points = origins[:, None, :] + dirs[:, None, :] * sel_ts[..., None]
    dt = ((t_max - t_min) / renderer.candidates)[:, None] * delta_scale
    deltas = jnp.where(sel_mask, dt, 0.0)

    out = fused_render_tiles(packed, points, dirs, deltas, interpret=interpret)
    fg, bg_weight = out[:, :3], out[:, 3:]
    outputs = fg + bg_weight * background[None, :]
    outputs = jnp.where(mask[:, None], outputs, background[None, :])
    alphas = jnp.where(mask[:, None], 1.0 - bg_weight, 0.0)
    return dict(outputs=outputs, alphas=alphas)
