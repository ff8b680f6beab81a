"""Ray/box geometry, batched over rays.

Behavioural contract follows the reference slab test
(``learn_nerf/render.py:346-389``): rays that miss the scene bbox get the
null range ``[0, min_t_range]`` and ``mask=False``; hits are clamped to
``t_min >= 0`` and ``t_max >= t_min + min_t_range``.

Unlike the reference (a scalar function lifted with ``jax.vmap`` per ray,
``render.py:106-110``), this is written directly over the batch axis so it
fuses into the surrounding jitted render program with no vmap batching rules
in the way.
"""

from typing import Tuple

import jax.numpy as jnp

Array = jnp.ndarray


def ray_bbox_range(
    origins: Array,
    directions: Array,
    bbox_min: Array,
    bbox_max: Array,
    min_t_range: float = 1e-3,
    epsilon: float = 1e-8,
) -> Tuple[Array, Array, Array]:
    """Intersect rays with an axis-aligned box.

    :param origins: ``[N, 3]`` ray origins.
    :param directions: ``[N, 3]`` ray directions (need not be normalized).
    :param bbox_min: ``[3]`` box minimum corner.
    :param bbox_max: ``[3]`` box maximum corner.
    :param min_t_range: minimum span between t_min and t_max.
    :param epsilon: offset added to directions to avoid division by zero.
    :return: ``(t_min [N], t_max [N], mask [N] bool)``.  Missed rays report
             the null range ``(0, min_t_range)`` with ``mask=False``.
    """
    # Solve o + t*d = b for both box planes per axis: [N, 2, 3].
    # Sign-preserving epsilon: ADDING it can cancel a tiny negative
    # component to exactly 0 (0/0 NaN -> NaN mask -> silent false miss
    # for a ray that geometrically hits; the reference's ray_t_range
    # shares the additive flaw, render.py:346-389).
    bbox = jnp.stack([bbox_min, bbox_max])  # [2, 3]
    safe_dirs = jnp.where(
        jnp.abs(directions) < epsilon,
        jnp.where(directions < 0, -epsilon, epsilon),
        directions,
    )
    ts = (bbox[None, :, :] - origins[:, None, :]) / safe_dirs[:, None, :]
    near = jnp.min(ts, axis=1)  # [N, 3] entering t per axis
    far = jnp.max(ts, axis=1)  # [N, 3] exiting t per axis

    t_enter = jnp.maximum(0.0, jnp.max(near, axis=-1))
    t_exit = jnp.min(far, axis=-1)
    mask = t_enter < t_exit

    t_exit_clipped = jnp.maximum(t_exit, t_enter + min_t_range)
    t_min = jnp.where(mask, t_enter, 0.0)
    t_max = jnp.where(mask, t_exit_clipped, min_t_range)
    return t_min, t_max, mask
