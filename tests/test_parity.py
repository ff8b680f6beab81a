"""Golden-value parity tests against the reference implementation.

Fixtures in ``tests/golden/`` were produced by running the upstream
learn-nerf code (see ``make_goldens.py``); these tests pin this independent
implementation to the reference's numerical behaviour.
"""

import os
import pickle

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def load(name):
    return np.load(os.path.join(GOLDEN, name + ".npz"))


def test_ray_bbox_range():
    import jax.numpy as jnp

    from learn_nerf_tpu.ops.geometry import ray_bbox_range

    g = load("ray_t_range")
    t_min, t_max, mask = ray_bbox_range(
        jnp.asarray(g["origins"]),
        jnp.asarray(g["dirs"]),
        jnp.asarray(g["bbox_min"]),
        jnp.asarray(g["bbox_max"]),
    )
    np.testing.assert_array_equal(np.asarray(mask), g["mask"])
    np.testing.assert_allclose(np.asarray(t_min), g["t_min"], rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(t_max), g["t_max"], rtol=1e-6, atol=1e-6)


def test_stratified_sampling_matches_reference_rng():
    import jax
    import jax.numpy as jnp

    from learn_nerf_tpu.ops.sampling import stratified_ts

    g = load("sampling")
    ts = stratified_ts(
        jax.random.PRNGKey(7), jnp.asarray(g["t_min"]), jnp.asarray(g["t_max"]), 16
    )
    np.testing.assert_allclose(np.asarray(ts), g["ts"], rtol=1e-5, atol=1e-6)


def test_bin_deltas_and_termination_weights():
    import jax.numpy as jnp

    from learn_nerf_tpu.ops.volume import bin_deltas, termination_weights

    g = load("sampling")
    starts, ends, deltas = bin_deltas(
        jnp.asarray(g["ts"]), jnp.asarray(g["t_min"]), jnp.asarray(g["t_max"])
    )
    np.testing.assert_allclose(np.asarray(starts), g["starts"], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ends), g["ends"], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(deltas), g["deltas"], rtol=1e-5, atol=1e-7)
    w = termination_weights(jnp.asarray(g["densities"]), deltas)
    np.testing.assert_allclose(np.asarray(w), g["probs"], rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(w.sum(1)), np.ones(w.shape[0]), rtol=1e-5)


def test_fine_sampling():
    import jax
    import jax.numpy as jnp

    from learn_nerf_tpu.ops.sampling import inverse_cdf_ts, merge_sorted
    from learn_nerf_tpu.ops.volume import bin_deltas, termination_weights

    g = load("sampling")
    ts = jnp.asarray(g["ts"])
    t_min = jnp.asarray(g["t_min"])
    t_max = jnp.asarray(g["t_max"])
    _, ends, deltas = bin_deltas(ts, t_min, t_max)
    w = termination_weights(jnp.asarray(g["densities"]), deltas)[:, :-1]
    new_ts = inverse_cdf_ts(jax.random.PRNGKey(8), w, t_min, ends, 24)
    merged = merge_sorted(ts, new_ts)
    np.testing.assert_allclose(np.asarray(merged), g["fine_ts"], rtol=1e-4, atol=1e-5)


def test_compositing():
    import jax.numpy as jnp

    from learn_nerf_tpu.ops.volume import (
        average_aux,
        bin_deltas,
        composite,
        composite_alpha,
        termination_weights,
    )

    g = load("sampling")
    c = load("compositing")
    _, _, deltas = bin_deltas(
        jnp.asarray(g["ts"]), jnp.asarray(g["t_min"]), jnp.asarray(g["t_max"])
    )
    w = termination_weights(jnp.asarray(g["densities"]), deltas)
    mask = jnp.asarray(g["mask"])
    out = composite(w, jnp.asarray(c["rgbs"]), jnp.asarray(c["background"]), mask)
    np.testing.assert_allclose(np.asarray(out), c["outputs"], rtol=1e-5, atol=1e-6)
    alphas = composite_alpha(w, mask)
    np.testing.assert_allclose(np.asarray(alphas), c["alphas"], rtol=1e-5, atol=1e-6)
    aux = average_aux(w, {"a": jnp.asarray(c["aux_in"])}, jnp.ones_like(mask))
    np.testing.assert_allclose(float(aux["a"]), float(c["aux_mean"]), rtol=1e-5)


def test_sinusoidal_features():
    import jax.numpy as jnp

    from learn_nerf_tpu.ops.encoding import sinusoidal_features

    g = load("sinusoidal")
    for freqs, key in ((10, "emb10"), (4, "emb4")):
        out = sinusoidal_features(jnp.asarray(g["coords"]), freqs)
        np.testing.assert_allclose(np.asarray(out), g[key], rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("degree", range(1, 9))
def test_spherical_harmonics(degree):
    import jax.numpy as jnp

    from learn_nerf_tpu.ops.sh import spherical_harmonics

    g = load("sh")
    out = spherical_harmonics(degree, jnp.asarray(g["coords"]))
    np.testing.assert_allclose(
        np.asarray(out), g[f"sh{degree}"], rtol=2e-4, atol=1e-5
    )


def test_integrated_dir_enc():
    import jax.numpy as jnp

    from learn_nerf_tpu.ops.sh import integrated_dir_enc

    g = load("sh")
    out = integrated_dir_enc(4, jnp.asarray(g["coords"]), jnp.asarray(g["roughness"]))
    np.testing.assert_allclose(np.asarray(out), g["ide4"], rtol=2e-4, atol=1e-5)


def test_srgb_and_leaky_clip():
    import jax.numpy as jnp

    from learn_nerf_tpu.models.ref_nerf import leaky_clip, linear_to_srgb

    g = load("srgb")
    np.testing.assert_allclose(
        np.asarray(linear_to_srgb(jnp.asarray(g["colors"]))),
        g["srgb"],
        rtol=1e-5,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(leaky_clip(jnp.asarray(g["colors"]))), g["clipped"], rtol=1e-6
    )


@pytest.mark.parametrize("tag", ["dense", "hashed", "smooth", "dense_smooth"])
def test_hash_grid_encode(tag):
    import jax.numpy as jnp

    from learn_nerf_tpu.ops.hashgrid import hash_grid_encode

    g = load(f"hashgrid_{tag}")
    out = hash_grid_encode(
        [jnp.asarray(g["table"])],
        jnp.asarray(g["x"]),
        [int(g["grid"])],
        [int(g["table_size"])],
        jnp.asarray(g["bbox_min"]),
        jnp.asarray(g["bbox_max"]),
        smooth=bool(g["smooth"]),
    )
    np.testing.assert_allclose(np.asarray(out), g["out"], rtol=1e-5, atol=1e-7)


def test_renderer_end_to_end():
    """Same params + same PRNG key => same images as the reference."""
    import jax
    import jax.numpy as jnp

    from learn_nerf_tpu.models import NeRFModel
    from learn_nerf_tpu.render import Renderer

    g = load("renderer_e2e")
    with open(os.path.join(GOLDEN, "vanilla_params.pkl"), "rb") as f:
        params = pickle.load(f)

    renderer = Renderer(
        coarse=NeRFModel(hidden_dim=32, color_layer_dim=16),
        fine=NeRFModel(hidden_dim=48, color_layer_dim=16),
        bbox_min=tuple(g["bbox_min"].tolist()),
        bbox_max=tuple(g["bbox_max"].tolist()),
        coarse_ts=8,
        fine_ts=12,
    )
    out = renderer.render_rays(
        jax.random.PRNGKey(21),
        jnp.asarray(g["rays"]),
        params["coarse"],
        params["fine"],
        jnp.asarray(g["background"]),
    )
    np.testing.assert_allclose(
        np.asarray(out["coarse"]["outputs"]), g["coarse_outputs"], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["coarse"]["densities"]),
        g["coarse_densities"],
        rtol=1e-4,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out["fine"]["densities"]), g["fine_densities"], rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["fine"]["outputs"]), g["fine_outputs"], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["fine"]["alphas"]), g["fine_alphas"], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["fine"]["coords"]), g["fine_coords"], rtol=1e-4, atol=1e-4
    )


def test_camera_rays():
    from learn_nerf_tpu.data.camera import CameraView

    g = load("camera")
    view = CameraView(
        camera_direction=(0.3, -0.5, 0.81),
        camera_origin=(1.0, 2.0, -3.0),
        x_axis=(0.8, 0.6, 0.0),
        y_axis=(0.0, 0.6, -0.8),
        x_fov=1.047,
        y_fov=0.785,
    )
    rays = view.bare_rays(17, 13)
    np.testing.assert_allclose(rays, g["rays"], rtol=1e-5, atol=1e-6)


def test_reference_ngp_checkpoint_cross_load():
    """A pickle saved by the reference loads and reproduces its outputs."""
    import jax.numpy as jnp

    from learn_nerf_tpu.checkpoint import load_params_pickle
    from learn_nerf_tpu.models import InstantNGPModel

    g = load("ngp_reference_outputs")
    params = load_params_pickle(
        os.path.join(GOLDEN, "ngp_reference_checkpoint.pkl")
    )
    assert "HashGridEncoding_0" in params["fine"]
    model = InstantNGPModel(
        table_sizes=[2**12] * 3,
        grid_sizes=[4, 8, 64],
        bbox_min=tuple(g["bbox_min"].tolist()),
        bbox_max=tuple(g["bbox_max"].tolist()),
    )
    density, rgb, _ = model.apply(
        dict(params=params["fine"]), jnp.asarray(g["x"]), jnp.asarray(g["d"])
    )
    np.testing.assert_allclose(np.asarray(density), g["density"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rgb), g["rgb"], rtol=1e-5, atol=1e-6)


def test_reference_refnerf_checkpoint_cross_load():
    """Ref-NeRF end-to-end vs the reference, proving the VJP-shared normal
    path matches the reference's jax.grad normals numerically
    (reference ref_nerf.py:38-43) along with IDE/sRGB/aux plumbing."""
    import jax.numpy as jnp

    from learn_nerf_tpu.checkpoint import load_params_pickle
    from learn_nerf_tpu.models import RefNeRFModel

    g = load("refnerf_reference_outputs")
    params = load_params_pickle(
        os.path.join(GOLDEN, "refnerf_reference_checkpoint.pkl")
    )
    model = RefNeRFModel(
        sh_degree=4,
        input_layers=2,
        mid_layers=2,
        hidden_dim=32,
        color_layer_dim=16,
    )
    density, rgb, aux = model.apply(
        dict(params=params["fine"]), jnp.asarray(g["x"]), jnp.asarray(g["d"])
    )
    np.testing.assert_allclose(np.asarray(density), g["density"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rgb), g["rgb"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(aux["normal_mse"]), g["normal_mse"], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(aux["neg_normal"]), g["neg_normal"], rtol=1e-4, atol=1e-5
    )


def test_reference_ngp_refnerf_checkpoint_cross_load():
    """NGP x Ref-NeRF hybrid end-to-end vs the reference: smooth hash-grid
    gradients must flow through the VJP normal path identically
    (reference instant_ngp.py:57-89)."""
    import jax.numpy as jnp

    from learn_nerf_tpu.checkpoint import load_params_pickle
    from learn_nerf_tpu.models import InstantNGPRefNeRFModel

    g = load("ngp_refnerf_reference_outputs")
    params = load_params_pickle(
        os.path.join(GOLDEN, "ngp_refnerf_reference_checkpoint.pkl")
    )
    assert "HashGridEncoding_0" in params["fine"]
    model = InstantNGPRefNeRFModel(
        sh_degree=4,
        table_sizes=[2**10] * 3,
        grid_sizes=[4, 8, 32],
        bbox_min=tuple(g["bbox_min"].tolist()),
        bbox_max=tuple(g["bbox_max"].tolist()),
        hidden_dim=32,
    )
    density, rgb, aux = model.apply(
        dict(params=params["fine"]), jnp.asarray(g["x"]), jnp.asarray(g["d"])
    )
    np.testing.assert_allclose(np.asarray(density), g["density"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rgb), g["rgb"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(aux["normal_mse"]), g["normal_mse"], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(aux["neg_normal"]), g["neg_normal"], rtol=1e-4, atol=1e-5
    )
