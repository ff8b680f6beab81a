"""Vanilla NeRF MLP (Mildenhall et al. 2020).

Architecture parity with the reference (``learn_nerf/model.py:30-62``):
5 input layers, skip-concat of the positional embedding, 4 mid layers (ReLU
between but not after), softplus density head, and a 128-wide color branch
conditioned on the direction embedding with tanh output in ``[-1, 1]``.

The 256-wide Dense layers are the MXU workload; batches arrive as
``[N, T, F]`` and stay that shape end to end.
"""

import flax.linen as nn
import jax.numpy as jnp

from ..ops.encoding import sinusoidal_features
from .base import FieldModel, FieldOutput

Array = jnp.ndarray


class NeRFModel(FieldModel):
    input_layers: int = 5
    mid_layers: int = 4
    hidden_dim: int = 256
    color_layer_dim: int = 128
    x_freqs: int = 10
    d_freqs: int = 4

    @nn.compact
    def __call__(self, x: Array, d: Array) -> FieldOutput:
        x_emb = sinusoidal_features(x, self.x_freqs)
        d_emb = sinusoidal_features(d, self.d_freqs)

        z = x_emb
        for _ in range(self.input_layers):
            z = nn.relu(nn.Dense(self.hidden_dim)(z))
        z = jnp.concatenate([z, x_emb], axis=-1)
        for i in range(self.mid_layers):
            if i > 0:
                z = nn.relu(z)
            z = nn.Dense(self.hidden_dim)(z)
        density = nn.softplus(nn.Dense(1)(z))
        z = jnp.concatenate([z, d_emb], axis=-1)
        z = nn.relu(nn.Dense(self.color_layer_dim)(z))
        rgb = nn.tanh(nn.Dense(3)(z))
        return density, rgb, {}
