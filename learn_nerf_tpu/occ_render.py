"""Occupancy-grid accelerated renderer — the TPU-native fast path.

Replaces the coarse/fine hierarchy (two full model evaluations over
64 + 192 samples per ray, ``learn_nerf/render.py:39-91``) with a single
field model evaluated only where the occupancy grid says matter exists:

1. stratify C cheap candidate ts per ray over the bbox range,
2. occupancy-test every candidate (one tiny gather per candidate — no
   field-model cost, no gradient),
3. compact the first K occupied candidates per ray (static shapes),
4. evaluate the field model on ``[N, K]`` points and composite with the
   candidate bin width as each survivor's delta.

At K=32 and C=192 this evaluates ~6x fewer field points per ray than the
reference's fine pass alone; for hash-grid models (gather-count-bound on
TPU) the speedup is nearly proportional.  Quality matches dense sampling
once the grid converges because skipped cells genuinely have ~zero density
(Instant NGP section 3; NerfAcc arXiv:2305.04966).
"""

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from .acceleration import OccupancyGrid, OccupancyGridState, compact_occupied_samples
from .models.base import FieldModel
from .ops.geometry import ray_bbox_range
from .ops.sampling import stratified_ts
from .ops.volume import average_aux, composite, composite_alpha, termination_weights

Array = jnp.ndarray


@dataclass(frozen=True)
class OccupancyRenderer:
    model: FieldModel
    grid: OccupancyGrid
    bbox_min: Tuple[float, float, float]
    bbox_max: Tuple[float, float, float]
    candidates: int = 192
    samples: int = 32
    min_t_range: float = 1e-3

    def render_rays(
        self,
        key: jax.Array,
        rays: Array,
        params: Any,
        background: Array,
        grid_state: OccupancyGridState,
    ) -> Tuple[Dict[str, Array], Dict[str, Array]]:
        """Render rays with occupancy-culled sampling.

        :param rays: ``[N, 2, 3]`` (origin, direction).
        :return: ``(out, aux_means)`` — out keys: ``outputs [N,3]``,
                 ``densities [N,K]``, ``alphas [N,1]``, ``coords [N,3]``,
                 ``weights [N,K+1]``, ``ts [N,K]``, ``sample_mask [N,K]``.
        """
        bbox_min = jnp.asarray(self.bbox_min, dtype=jnp.float32)
        bbox_max = jnp.asarray(self.bbox_max, dtype=jnp.float32)
        origins, dirs = rays[:, 0], rays[:, 1]
        t_min, t_max, mask = ray_bbox_range(
            origins, dirs, bbox_min, bbox_max, self.min_t_range
        )

        # Cheap candidates + occupancy test (no model, no gradients).
        cand_ts = stratified_ts(key, t_min, t_max, self.candidates)
        cand_pts = origins[:, None, :] + dirs[:, None, :] * cand_ts[..., None]
        occ = self.grid.occupied(grid_state, cand_pts)

        sel_ts, sel_mask = compact_occupied_samples(cand_ts, occ, self.samples)

        points = origins[:, None, :] + dirs[:, None, :] * sel_ts[..., None]
        dirs_b = jnp.broadcast_to(dirs[:, None, :], points.shape)
        density, rgbs, aux = self.model.apply(dict(params=params), points, dirs_b)
        densities = density[..., 0] * sel_mask  # padding slots contribute 0

        # Every survivor represents one candidate bin of uniform width.
        dt = ((t_max - t_min) / self.candidates)[:, None]
        deltas = jnp.broadcast_to(dt, densities.shape)
        weights = termination_weights(densities, deltas)

        outputs = composite(weights, rgbs, background, mask)
        alphas = composite_alpha(weights, mask)
        coords = composite(weights, points, jnp.zeros(3, dtype=rgbs.dtype), mask)
        aux_means = average_aux(weights, aux, mask)

        return (
            dict(
                outputs=outputs,
                densities=densities,
                alphas=alphas,
                coords=coords,
                weights=weights,
                ts=sel_ts,
                sample_mask=sel_mask,
                rgbs=rgbs,
            ),
            aux_means,
        )
