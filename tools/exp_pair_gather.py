"""Is a slice_sizes=(2,F) gather ~the cost of a (1,F) gather on this TPU?
If yes, pair-adjacent corner storage halves NGP encoding gather cost."""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.device_get(out)).ravel()[:1]
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.device_get(out)).ravel()[:1]
    return (time.time() - t0) / reps


def pair_gather(table, idx):
    """out[m] = table[idx[m]:idx[m]+2, :] via lax.gather."""
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2),
        collapsed_slice_dims=(),
        start_index_map=(0,),
    )
    return jax.lax.gather(
        table,
        idx[:, None],
        dnums,
        slice_sizes=(2, table.shape[1]),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


def main():
    rng = np.random.RandomState(0)
    t_rows = 2**18
    f = 2
    table = jnp.asarray(rng.randn(t_rows, f).astype(np.float32))

    m = 2_000_000  # single-row gathers in the baseline
    idx1 = jnp.asarray(rng.randint(0, t_rows, size=m).astype(np.int32))
    idx2 = jnp.asarray(rng.randint(0, t_rows - 1, size=m // 2).astype(np.int32))

    f_single = jax.jit(lambda t, i: t.at[i].get(mode="promise_in_bounds"))
    f_pair = jax.jit(pair_gather)

    t_single = timed(f_single, table, idx1)
    t_pair = timed(f_pair, table, idx2)
    print(f"single-row x{m}:      {t_single:.4f}s")
    print(f"pair-row   x{m//2}:   {t_pair:.4f}s   speedup {t_single/t_pair:.2f}x")

    # Gradient (scatter) side.
    def loss_single(t, i):
        return jnp.sum(t.at[i].get(mode="promise_in_bounds") ** 2)

    def loss_pair(t, i):
        return jnp.sum(pair_gather(t, i) ** 2)

    g_single = jax.jit(jax.grad(loss_single))
    g_pair = jax.jit(jax.grad(loss_pair))
    ts = timed(g_single, table, idx1)
    tp = timed(g_pair, table, idx2)
    print(f"grad single:          {ts:.4f}s")
    print(f"grad pair:            {tp:.4f}s   speedup {ts/tp:.2f}x")

    # Quad rows (slice 4): even fewer indices if we also pack feature pairs.
    idx4 = jnp.asarray(rng.randint(0, t_rows - 3, size=m // 4).astype(np.int32))

    def quad_gather(table, idx):
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,)
        )
        return jax.lax.gather(
            table, idx[:, None], dnums, slice_sizes=(4, table.shape[1]),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )

    f_quad = jax.jit(quad_gather)
    tq = timed(f_quad, table, idx4)
    print(f"quad-row   x{m//4}:   {tq:.4f}s   speedup {t_single/tq:.2f}x")


if __name__ == "__main__":
    main()
