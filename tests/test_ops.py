"""Property-based unit tests for the core ops."""

import numpy as np


def test_merge_sorted_matches_full_sort():
    import jax.numpy as jnp

    from learn_nerf_tpu.ops.sampling import merge_sorted

    rng = np.random.RandomState(0)
    a = np.sort(rng.rand(37, 9).astype(np.float32), axis=1)
    b = np.sort(rng.rand(37, 14).astype(np.float32), axis=1)
    merged = np.asarray(merge_sorted(jnp.asarray(a), jnp.asarray(b)))
    expected = np.sort(np.concatenate([a, b], axis=1), axis=1)
    np.testing.assert_allclose(merged, expected)


def test_merge_sorted_with_ties():
    import jax.numpy as jnp

    from learn_nerf_tpu.ops.sampling import merge_sorted

    a = np.array([[0.0, 1.0, 1.0, 2.0]], np.float32)
    b = np.array([[1.0, 1.0, 3.0]], np.float32)
    merged = np.asarray(merge_sorted(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(merged, [[0.0, 1.0, 1.0, 1.0, 1.0, 2.0, 3.0]])


def test_batched_interp_matches_numpy():
    import jax.numpy as jnp

    from learn_nerf_tpu.ops.sampling import batched_interp

    rng = np.random.RandomState(1)
    xp = np.sort(rng.rand(11, 8).astype(np.float32), axis=1)
    fp = rng.randn(11, 8).astype(np.float32)
    x = rng.rand(11, 23).astype(np.float32) * 1.4 - 0.2  # includes out-of-range
    out = np.asarray(batched_interp(jnp.asarray(x), jnp.asarray(xp), jnp.asarray(fp)))
    expected = np.stack([np.interp(x[i], xp[i], fp[i]) for i in range(11)])
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)


def test_ray_bbox_range_brute_force():
    """Cross-check the slab test against dense sampling along each ray."""
    import jax.numpy as jnp

    from learn_nerf_tpu.ops.geometry import ray_bbox_range

    rng = np.random.RandomState(2)
    n = 128
    origins = rng.randn(n, 3).astype(np.float32) * 2
    dirs = rng.randn(n, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    bmin = np.array([-1, -1, -1], np.float32)
    bmax = np.array([1, 1, 1], np.float32)

    t_min, t_max, mask = ray_bbox_range(
        jnp.asarray(origins), jnp.asarray(dirs), jnp.asarray(bmin), jnp.asarray(bmax)
    )
    t_min, t_max, mask = map(np.asarray, (t_min, t_max, mask))

    ts = np.linspace(0, 20, 4000, dtype=np.float32)
    pts = origins[:, None] + dirs[:, None] * ts[None, :, None]
    inside = np.all((pts >= bmin) & (pts <= bmax), axis=-1)
    hits = inside.any(axis=1)
    # Graze-only cases can disagree with a discrete sampling; require
    # agreement where the dense sampling found a comfortable overlap.
    strong = inside.sum(axis=1) > 3
    assert np.all(mask[strong & hits])
    for i in np.nonzero(strong & hits)[0]:
        lo = ts[inside[i]].min()
        hi = ts[inside[i]].max()
        assert t_min[i] <= lo + 0.01
        assert t_max[i] >= hi - 0.01


def test_stratified_ts_within_bins():
    import jax

    from learn_nerf_tpu.ops.sampling import stratified_ts

    t_min = np.array([0.0, 1.0], np.float32)
    t_max = np.array([1.0, 3.0], np.float32)
    ts = np.asarray(
        stratified_ts(jax.random.PRNGKey(0), t_min, t_max, 10)  # type: ignore
    )
    for r in range(2):
        size = (t_max[r] - t_min[r]) / 10
        for i in range(10):
            assert t_min[r] + i * size <= ts[r, i] <= t_min[r] + (i + 1) * size
    assert np.all(np.diff(ts, axis=1) > 0)


def test_termination_weights_are_a_distribution():
    import jax.numpy as jnp

    from learn_nerf_tpu.ops.volume import termination_weights

    rng = np.random.RandomState(3)
    d = np.abs(rng.randn(17, 9)).astype(np.float32) * 3
    deltas = np.abs(rng.randn(17, 9)).astype(np.float32) * 0.2
    w = np.asarray(termination_weights(jnp.asarray(d), jnp.asarray(deltas)))
    assert w.shape == (17, 10)
    assert np.all(w >= 0)
    np.testing.assert_allclose(w.sum(axis=1), 1.0, rtol=1e-5)
    # Zero density => all weight on the background column.
    w0 = np.asarray(
        termination_weights(jnp.zeros((3, 9)), jnp.asarray(deltas[:3]))
    )
    np.testing.assert_allclose(w0[:, -1], 1.0)


def test_inverse_cdf_concentrates_samples():
    """Fine samples should land where the termination weights are."""
    import jax
    import jax.numpy as jnp

    from learn_nerf_tpu.ops.sampling import inverse_cdf_ts

    n, t = 4, 32
    weights = np.zeros((n, t), np.float32)
    weights[:, 10:14] = 1.0  # all mass in bins 10..13
    t_min = np.zeros(n, np.float32)
    ends = np.broadcast_to(
        np.linspace(1 / t, 1.0, t, dtype=np.float32), (n, t)
    ).copy()
    new_ts = np.asarray(
        inverse_cdf_ts(
            jax.random.PRNGKey(0), jnp.asarray(weights), t_min, jnp.asarray(ends), 64
        )
    )
    frac_in_peak = np.mean((new_ts > 9 / t) & (new_ts < 15 / t))
    assert frac_in_peak > 0.95


def test_hash_grid_gradients_flow_to_tables():
    import jax
    import jax.numpy as jnp

    from learn_nerf_tpu.ops.hashgrid import hash_grid_encode

    table = jnp.zeros((4096, 2))
    x = jnp.asarray(np.random.RandomState(0).rand(5, 3).astype(np.float32))

    def loss(t):
        out = hash_grid_encode(
            [t], x, [64], [4096], jnp.zeros(3), jnp.ones(3), smooth=False
        )
        return jnp.sum(out**2) + jnp.sum(out)

    g = jax.grad(loss)(table)
    assert float(jnp.abs(g).sum()) > 0
    # Each point touches at most 8 rows.
    assert int((jnp.abs(g).sum(axis=1) > 0).sum()) <= 40


def test_smooth_hashgrid_has_continuous_gradient():
    """Smooth mode must be differentiable in x (needed for Ref-NeRF normals)."""
    import jax
    import jax.numpy as jnp

    from learn_nerf_tpu.ops.hashgrid import hash_grid_encode

    rng = np.random.RandomState(4)
    table = jnp.asarray(rng.randn(4096, 2).astype(np.float32))
    x = jnp.asarray(rng.rand(7, 3).astype(np.float32))

    def f(pts):
        return jnp.sum(
            hash_grid_encode(
                [table], pts, [64], [4096], jnp.zeros(3), jnp.ones(3), smooth=True
            )
        )

    g = jax.grad(f)(x)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).sum()) > 0


def test_hash_grid_level_grouping_exact():
    """Grouped-gather encoding (pairs of equal-resolution levels share one
    gather over a feature-concatenated table) is bit-identical to per-level
    gathers, for outputs AND table gradients, in both interpolation modes."""
    import jax
    import jax.numpy as jnp

    from learn_nerf_tpu.ops.hashgrid import (
        _level_groups,
        dense_level_rows,
        hash_grid_encode,
    )

    # Standard NGP schedule: levels come in pairs -> 8 groups of 2.
    grid_sizes = [2 ** (4 + i // 2) for i in range(16)]
    table_sizes = [2**14] * 16
    assert _level_groups(grid_sizes, table_sizes) == [
        (2 * i, 2 * i + 2) for i in range(8)
    ]

    rng = np.random.RandomState(11)
    tables = [
        jnp.asarray(
            rng.randn(dense_level_rows(g, t), 2).astype(np.float32) * 1e-2
        )
        for g, t in zip(grid_sizes, table_sizes)
    ]
    x = jnp.asarray(rng.rand(33, 3).astype(np.float32) * 2 - 0.5)

    for smooth in (False, True):

        def enc(ts, grouped, smooth=smooth):
            return hash_grid_encode(
                ts,
                x,
                grid_sizes,
                table_sizes,
                -jnp.ones(3),
                2 * jnp.ones(3),
                smooth=smooth,
                group_levels=grouped,
            )

        out_grouped = enc(tables, True)
        out_plain = enc(tables, False)
        assert out_grouped.shape == (33, 32)
        np.testing.assert_array_equal(
            np.asarray(out_grouped), np.asarray(out_plain)
        )

        g_grouped = jax.grad(lambda ts: jnp.sum(jnp.sin(enc(ts, True))))(tables)
        g_plain = jax.grad(lambda ts: jnp.sum(jnp.sin(enc(ts, False))))(tables)
        for a, b in zip(g_grouped, g_plain):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_hash_grid_grouping_respects_boundaries():
    """Levels with different grid or table sizes never share a gather."""
    from learn_nerf_tpu.ops.hashgrid import _level_groups

    assert _level_groups([16, 16, 32], [64, 64, 64]) == [(0, 2), (2, 3)]
    assert _level_groups([16, 16], [64, 128]) == [(0, 1), (1, 2)]
    assert _level_groups([16], [64]) == [(0, 1)]
    assert _level_groups([], []) == []


def test_ray_bbox_range_degenerate_direction_component():
    """A tiny NEGATIVE direction component must not NaN the slab test: the
    additive epsilon could cancel it to exactly 0 and 0/0 through min/max
    made a geometric hit report mask=False (review round 3; the reference
    ray_t_range shares the additive flaw)."""
    import jax.numpy as jnp
    import numpy as np

    from learn_nerf_tpu.ops.geometry import ray_bbox_range

    eps = 1e-8
    origins = jnp.asarray([[1.0, 0.0, -3.0]])  # on the +x bbox plane
    dirs = jnp.asarray([[-eps, 0.0, 1.0]])  # grazing inward along z
    t_min, t_max, mask = ray_bbox_range(
        origins, dirs, jnp.full(3, -1.0), jnp.ones(3)
    )
    assert np.all(np.isfinite(np.asarray(t_min)))
    assert np.all(np.isfinite(np.asarray(t_max)))
    assert bool(mask[0])  # the ray passes straight through the box
