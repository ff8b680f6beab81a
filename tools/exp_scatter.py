"""Scatter-add strategies for hash-table gradients: plain scatter vs
sort + sorted-scatter vs sort + segment_sum."""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=5, warmup=2, tag=""):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.device_get(out)).ravel()[:1]
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.device_get(out)).ravel()[:1]
    dt = (time.time() - t0) / reps
    print(f"{tag:42s} {dt*1000:8.1f} ms", flush=True)
    return dt


def main():
    rng = np.random.RandomState(0)
    rows, f = 2**18, 2
    m = 16_800_000  # matches 131k pts x 16 levels x 8 corners
    idx = jnp.asarray(rng.randint(0, rows, size=m).astype(np.int32))
    g = jnp.asarray(rng.randn(m, f).astype(np.float32))

    plain = jax.jit(
        lambda i, gg: jnp.zeros((rows, f)).at[i].add(
            gg, mode="promise_in_bounds"
        )
    )
    timed(plain, idx, g, tag=f"plain scatter-add x{m}")

    def sorted_scatter(i, gg):
        order = jnp.argsort(i)
        si = i[order]
        sg = gg[order]
        return jnp.zeros((rows, f)).at[si].add(
            sg, mode="promise_in_bounds", indices_are_sorted=True
        )

    timed(jax.jit(sorted_scatter), idx, g, tag="argsort + sorted scatter-add")

    def seg(i, gg):
        order = jnp.argsort(i)
        return jax.ops.segment_sum(
            gg[order], i[order], num_segments=rows, indices_are_sorted=True
        )

    timed(jax.jit(seg), idx, g, tag="argsort + segment_sum")

    timed(jax.jit(lambda i: jnp.argsort(i)), idx, tag="argsort alone")

    # Scaling check: is scatter throughput better at smaller m?
    for mm in (2_000_000, 8_000_000):
        idx2 = idx[:mm]
        g2 = g[:mm]
        timed(plain, idx2, g2, tag=f"plain scatter-add x{mm}")


if __name__ == "__main__":
    main()
