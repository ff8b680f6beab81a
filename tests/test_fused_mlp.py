"""Fused Pallas MLP kernel vs the flax NeRFModel (interpret mode on CPU)."""

import numpy as np


def test_fused_matches_flax():
    import jax
    import jax.numpy as jnp

    from learn_nerf_tpu.models import NeRFModel
    from tools.pallas_recipe.fused_mlp import fused_nerf_forward, pack_vanilla_params

    model = NeRFModel()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(300, 3).astype(np.float32))
    d = jnp.asarray(rng.randn(300, 3).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    params = model.init(dict(params=jax.random.PRNGKey(0)), x[:1], d[:1])["params"]

    density_ref, rgb_ref, _ = model.apply(dict(params=params), x, d)
    packed = pack_vanilla_params(params)
    density, rgb = fused_nerf_forward(packed, x, d, interpret=True)

    assert density.shape == (300, 1)
    assert rgb.shape == (300, 3)
    # bf16 matmuls: tolerances follow the measured bf16-vs-f32 model gap.
    np.testing.assert_allclose(
        np.asarray(rgb), np.asarray(rgb_ref), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(density), np.asarray(density_ref), rtol=2e-2, atol=5e-3
    )


def test_fused_leading_dims_and_padding():
    import jax
    import jax.numpy as jnp

    from learn_nerf_tpu.models import NeRFModel
    from tools.pallas_recipe.fused_mlp import fused_nerf_forward, pack_vanilla_params

    model = NeRFModel(input_layers=2, mid_layers=2, hidden_dim=64, color_layer_dim=32)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(7, 5, 3).astype(np.float32))
    d = jnp.asarray(rng.randn(7, 5, 3).astype(np.float32))
    params = model.init(dict(params=jax.random.PRNGKey(0)), x[:1, :1], d[:1, :1])[
        "params"
    ]
    packed = pack_vanilla_params(params, input_layers=2, mid_layers=2)
    density, rgb = fused_nerf_forward(
        packed, x, d, input_layers=2, mid_layers=2, interpret=True
    )
    assert density.shape == (7, 5, 1)
    assert rgb.shape == (7, 5, 3)
    density_ref, rgb_ref, _ = model.apply(dict(params=params), x, d)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref), atol=5e-3)
