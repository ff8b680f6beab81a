"""Coordinate encodings."""

import jax.numpy as jnp

Array = jnp.ndarray


def sinusoidal_features(coords: Array, freqs: int) -> Array:
    """NeRF positional encoding: sin/cos at power-of-two frequencies.

    Feature layout parity with the reference (``learn_nerf/model.py:65-77``):
    for each input dim the ``freqs`` sines come first, then the ``freqs``
    cosines, flattened per-dim — i.e.
    ``[sin(x*1)..sin(x*2^{k-1}), cos(x*1)..cos(x*2^{k-1}), sin(y*1)...]``.

    :param coords: ``[..., D]`` coordinates.
    :param freqs: number of octaves ``k``.
    :return: ``[..., D * 2 * freqs]`` features.
    """
    coeffs = 2.0 ** jnp.arange(freqs, dtype=jnp.float32)
    angles = coords[..., None] * coeffs  # [..., D, k]
    feats = jnp.concatenate([jnp.sin(angles), jnp.cos(angles)], axis=-1)
    return feats.reshape(feats.shape[:-2] + (-1,))
