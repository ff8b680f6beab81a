"""Experiments: where does the NGP step time go, and which gather
formulation is fastest on this TPU?  Run standalone; prints timings."""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: np.asarray(jax.device_get(x)).ravel()[:1], out
    )
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    # Force host fetch (block_until_ready unreliable on this backend).
    jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)).ravel()[:1], out)
    return (time.time() - t0) / reps


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.RandomState(0)

    m = 1_000_000  # gather count
    t_rows = 2**18
    table = jnp.asarray(rng.randn(t_rows, 2).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, t_rows, size=m).astype(np.int32))

    # 1. plain take (current implementation shape).
    f1 = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    print("take[rows]:            %.4fs" % timed(f1, table, idx), flush=True)

    # 2. take with promise_in_bounds.
    f2 = jax.jit(lambda t, i: t.at[i].get(mode="promise_in_bounds"))
    print("take promise_in_bounds:%.4fs" % timed(f2, table, idx), flush=True)

    # 3. transposed: gather along the minor (lane) axis.
    table_t = table.T  # [2, T]
    f3 = jax.jit(lambda t, i: t.at[:, i].get(mode="promise_in_bounds").T)
    print("take lane axis:        %.4fs" % timed(f3, table_t, idx), flush=True)

    # 4. gather of 8 corners fused: [M/8, 8] indices.
    idx8 = idx.reshape(-1, 8)
    f4 = jax.jit(lambda t, i: t.at[i].get(mode="promise_in_bounds"))
    print("take [M/8,8] shape:    %.4fs" % timed(f4, table, idx8), flush=True)

    # 5. Pallas kernel: table resident in VMEM, vector gather.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def gather_kernel(idx_ref, table_ref, out_ref):
        out_ref[:] = jnp.take(table_ref[:], idx_ref[:], axis=0)

    tile = 8192

    def pallas_gather(table, idx):
        mm = idx.shape[0]
        grid = mm // tile
        return pl.pallas_call(
            gather_kernel,
            out_shape=jax.ShapeDtypeStruct((mm, 2), jnp.float32),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((t_rows, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )(idx, table)

    try:
        f5 = jax.jit(pallas_gather)
        idx_p = idx[: (m // tile) * tile]
        print("pallas vmem gather:    %.4fs" % timed(f5, table, idx_p), flush=True)
    except Exception as e:
        print("pallas vmem gather FAILED:", type(e).__name__, str(e)[:300], flush=True)

    # 6. one-hot matmul gather for a small dense table (4096 rows).
    small = jnp.asarray(rng.randn(4096, 2).astype(np.float32))

    def onehot_gather(t, i):
        oh = jax.nn.one_hot(i, 4096, dtype=jnp.bfloat16)
        return oh @ t.astype(jnp.bfloat16)

    f6 = jax.jit(onehot_gather)
    print("one-hot matmul (4096): %.4fs" % timed(f6, small, idx % 4096), flush=True)

    f7 = jax.jit(lambda t, i: t.at[i].get(mode="promise_in_bounds"))
    print("take (4096 rows):      %.4fs" % timed(f7, small, idx % 4096), flush=True)


if __name__ == "__main__":
    main()
