"""Decompose the occupancy-path step cost on TPU."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from learn_nerf_tpu.acceleration import OccupancyGrid, compact_occupied_samples
from learn_nerf_tpu.models import InstantNGPModel
from learn_nerf_tpu.ops.geometry import ray_bbox_range
from learn_nerf_tpu.ops.sampling import stratified_ts


def timed(fn, *args, reps=5, warmup=2, tag=""):
    for _ in range(warmup):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)).ravel()[:1], out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)).ravel()[:1], out)
    dt = (time.time() - t0) / reps
    print(f"{tag:40s} {dt*1000:8.1f} ms", flush=True)
    return dt


def main():
    rng = np.random.RandomState(0)
    model = InstantNGPModel(
        table_sizes=[2**18] * 16,
        grid_sizes=[2 ** (4 + i // 2) for i in range(16)],
        bbox_min=(-1.0, -1.0, -1.0),
        bbox_max=(1.0, 1.0, 1.0),
    )
    n, k, c = 4096, 32, 192
    pts = jnp.asarray(rng.rand(n, k, 3).astype(np.float32) * 2 - 1)
    dirs = jnp.asarray(rng.randn(n, k, 3).astype(np.float32))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    params = model.init(dict(params=jax.random.PRNGKey(0)), pts[:1, :1], dirs[:1, :1])[
        "params"
    ]

    fwd = jax.jit(lambda p, x, d: model.apply(dict(params=p), x, d)[0].sum())
    timed(fwd, params, pts, dirs, tag=f"model fwd [{n}x{k}]")

    bwd = jax.jit(jax.grad(lambda p, x, d: model.apply(dict(params=p), x, d)[0].sum()))
    timed(bwd, params, pts, dirs, tag=f"model fwd+bwd [{n}x{k}]")

    # candidate generation + occupancy query + compaction
    grid = OccupancyGrid(bbox_min=(-1, -1, -1), bbox_max=(1, 1, 1), resolution=128)
    gs = grid.init()
    origins = jnp.asarray(rng.randn(n, 3).astype(np.float32))
    raydirs = jnp.asarray(rng.randn(n, 3).astype(np.float32))
    raydirs = raydirs / jnp.linalg.norm(raydirs, axis=-1, keepdims=True)

    def sample_path(gs, o, d, key):
        t_min, t_max, mask = ray_bbox_range(o, d, jnp.full(3, -1.0), jnp.ones(3))
        cand = stratified_ts(key, t_min, t_max, c)
        p = o[:, None, :] + d[:, None, :] * cand[..., None]
        occ = grid.occupied(gs, p)
        return compact_occupied_samples(cand, occ, k)

    sp = jax.jit(sample_path)
    timed(sp, gs, origins, raydirs, jax.random.PRNGKey(0), tag="candidates+occ+topk")

    # top_k alone
    keys = jnp.asarray(rng.rand(n, c).astype(np.float32))
    tk = jax.jit(lambda x: jax.lax.top_k(x, k))
    timed(tk, keys, tag="top_k [4096x192 -> 32]")

    # grid update (131k cells)
    upd = jax.jit(
        lambda gs, p, key: grid.update(gs, model, p, key, num_cells=2**17),
        static_argnums=(),
    )
    timed(upd, gs, params, jax.random.PRNGKey(1), tag="grid update (131k cells)")

    # encoding-only fwd+bwd on the same points (isolate MLP share)
    from learn_nerf_tpu.ops.hashgrid import hash_grid_encode

    tables = [params["HashGridEncoding_0"][f"table_{i}"] for i in range(16)]
    gsz = [2 ** (4 + i // 2) for i in range(16)]
    tsz = [2**18] * 16
    enc_b = jax.jit(
        jax.grad(
            lambda ts, x: jnp.sum(
                hash_grid_encode(ts, x, gsz, tsz, jnp.full(3, -1.0), jnp.ones(3))
            )
        )
    )
    timed(enc_b, tables, pts, tag="encoding fwd+bwd only")


if __name__ == "__main__":
    main()
