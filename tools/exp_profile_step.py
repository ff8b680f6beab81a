"""Decompose the Instant-NGP train step cost: encoding fwd, model fwd,
model fwd+bwd, render fwd, full step — to find where the 2.87s goes."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from learn_nerf_tpu.models import InstantNGPModel
from learn_nerf_tpu.render import Renderer
from learn_nerf_tpu.ops.hashgrid import hash_grid_encode, dense_level_rows


def timed(fn, *args, reps=3, warmup=1, tag=""):
    for _ in range(warmup):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)).ravel()[:1], out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)).ravel()[:1], out)
    dt = (time.time() - t0) / reps
    print(f"{tag:34s} {dt:.4f}s", flush=True)
    return dt


def main():
    rng = np.random.RandomState(0)
    bbox = dict(bbox_min=(-1.0, -1.0, -1.0), bbox_max=(1.0, 1.0, 1.0))
    fine = InstantNGPModel(
        table_sizes=[2**18] * 16,
        grid_sizes=[2 ** (4 + i // 2) for i in range(16)],
        **bbox,
    )
    n_fine = 4096 * 192  # points in the fine pass

    x = jnp.asarray(rng.rand(n_fine, 3).astype(np.float32) * 2 - 1)
    d = jnp.asarray(rng.randn(n_fine, 3).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    params = fine.init(dict(params=jax.random.PRNGKey(0)), x[:1], d[:1])["params"]
    tables = [
        params["HashGridEncoding_0"][f"table_{i}"] for i in range(16)
    ]
    grid_sizes = [2 ** (4 + i // 2) for i in range(16)]
    table_sizes = [2**18] * 16

    # 1. encoding forward only.
    enc = jax.jit(
        lambda ts, xx: hash_grid_encode(
            ts, xx, grid_sizes, table_sizes, jnp.full(3, -1.0), jnp.ones(3)
        )
    )
    timed(enc, tables, x, tag="encoding fwd (786k pts, 16 lvl)")

    # 2. encoding fwd+bwd (grad wrt tables).
    enc_grad = jax.jit(
        jax.grad(
            lambda ts, xx: jnp.sum(
                hash_grid_encode(
                    ts, xx, grid_sizes, table_sizes, jnp.full(3, -1.0), jnp.ones(3)
                )
            )
        )
    )
    timed(enc_grad, tables, x, tag="encoding fwd+bwd")

    # 3. full model forward.
    fwd = jax.jit(lambda p, xx, dd: fine.apply(dict(params=p), xx, dd)[0].sum())
    timed(fwd, params, x, d, tag="model fwd")

    # 4. model fwd+bwd.
    bwd = jax.jit(
        jax.grad(lambda p, xx, dd: fine.apply(dict(params=p), xx, dd)[0].sum())
    )
    timed(bwd, params, x, d, tag="model fwd+bwd")

    # 5. renderer forward (hierarchy, incl. coarse 6-level model).
    coarse = InstantNGPModel(
        table_sizes=[2**18] * 6,
        grid_sizes=[2 ** (4 + i // 2) for i in range(6)],
        **bbox,
    )
    cparams = coarse.init(dict(params=jax.random.PRNGKey(1)), x[:1], d[:1])["params"]
    renderer = Renderer(
        coarse=coarse, fine=fine,
        bbox_min=(-1.0, -1.0, -1.0), bbox_max=(1.0, 1.0, 1.0),
        coarse_ts=64, fine_ts=128,
    )
    rays = jnp.stack([x[:4096], d[:4096]], axis=1)
    rf = jax.jit(
        lambda cp, fp, k, r: renderer.render_rays(k, r, cp, fp, jnp.zeros(3))[
            "fine"
        ]["outputs"].sum()
    )
    timed(rf, cparams, params, jax.random.PRNGKey(2), rays, tag="render fwd (4096 rays)")

    rb = jax.jit(
        jax.grad(
            lambda fp, cp, k, r: renderer.render_rays(k, r, cp, fp, jnp.zeros(3))[
                "fine"
            ]["outputs"].sum()
        )
    )
    timed(rb, params, cparams, jax.random.PRNGKey(2), rays, tag="render fwd+bwd")


if __name__ == "__main__":
    main()
