"""Fused vanilla-NeRF MLP forward as a Pallas TPU kernel.

The XLA path materializes every inter-layer activation ``[M, 256]`` in HBM
(9 Dense layers over ~1M points per render step ≈ 18 GB of HBM traffic);
this kernel keeps the whole network — sinusoidal encoding, the 5 input
layers, skip concat, 4 mid layers, density head, and the color branch — in
VMEM per point tile, with the weights resident in VMEM for the entire grid
and matmuls on the MXU in bf16 (f32 accumulation).  HBM traffic drops to
the inputs ``[M, 6]`` and outputs ``[M, 4]``.

Inference-only (rendering, density sweeps, occupancy updates): training
keeps the XLA autodiff path.  Numerics match ``models.vanilla.NeRFModel``
with ``compute_dtype="bfloat16"`` (see tests/test_fused_mlp.py).

Measured on TPU v5e (1M points, tools/exp_fused*.py): 67 ms vs XLA's 59-67
ms — XLA's own pipelining of this layer stack is already near its HBM/MXU
balance point, so the kernel is kept as an optional equal-speed path (and
the in-repo example of the Pallas kernel recipe), not wired as a default.

Architecture contract mirrors the reference MLP (``learn_nerf/model.py:
30-62``): concats are rewritten as split matmuls (``[z, e] @ W == z @ W_z
+ e @ W_e``) so no concatenation happens in the kernel.
"""

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

TILE = 2048


def sincos_projection(freqs: int, dims: int = 3) -> Tuple[np.ndarray, np.ndarray]:
    """Sinusoidal encoding as one matmul + one phase-shifted sine.

    The naive encoding builds 2*dims skinny ``[T, freqs]`` slices and
    concatenates along lanes — a relayout festival on TPU.  Instead:
    ``emb = sin(x @ P + phase)`` where column ``j`` of ``P`` scales the
    right input dim by ``2^freq`` and ``phase`` is ``pi/2`` on cosine slots
    (``cos(a) = sin(a + pi/2)``).  One MXU op, one VPU transcendental, no
    relayouts.  Column order matches ``ops.encoding.sinusoidal_features``
    (per input dim: all sines, then all cosines).
    """
    proj = np.zeros((dims, 2 * dims * freqs), np.float32)
    phase = np.zeros((1, 2 * dims * freqs), np.float32)
    col = 0
    for dim in range(dims):
        for is_cos in (False, True):
            for f in range(freqs):
                proj[dim, col] = 2.0**f
                phase[0, col] = np.pi / 2 if is_cos else 0.0
                col += 1
    return proj, phase


def _sincos(x: Array, proj_ref, phase_ref) -> Array:
    # HIGHEST precision: default TPU matmul precision rounds the f32
    # coordinates toward bf16, and at the top frequency (2^9 for
    # x_freqs=10) that phase error is O(1) radians — the angles must be
    # exact for the encoding to match the elementwise reference.
    angles = (
        jnp.dot(
            x,
            proj_ref[:],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        + phase_ref[:]
    )
    return jnp.sin(angles)


def pack_vanilla_params(
    params: Dict[str, Any],
    input_layers: int = 5,
    mid_layers: int = 4,
    x_freqs: int = 10,
    d_freqs: int = 4,
) -> Tuple[Array, ...]:
    """Flatten a flax NeRFModel param tree into the kernel operand list.

    Weights are pre-cast to bf16 (MXU operands); biases stay f32 and are
    added to the f32 accumulators.  The two concat layers are split into
    paired weight matrices.
    """
    x_dim = 3 * 2 * x_freqs
    d_dim = 3 * 2 * d_freqs

    def w(i):
        return params[f"Dense_{i}"]["kernel"].astype(jnp.bfloat16)

    def b(i):
        return params[f"Dense_{i}"]["bias"].astype(jnp.float32)[None, :]

    ops = []
    for arr in (*sincos_projection(x_freqs), *sincos_projection(d_freqs)):
        ops.append(jnp.asarray(arr))
    for i in range(input_layers):
        ops += [w(i), b(i)]
    skip = input_layers
    w_skip = params[f"Dense_{skip}"]["kernel"].astype(jnp.bfloat16)
    ops += [w_skip[:-x_dim], w_skip[-x_dim:], b(skip)]  # z part, emb part
    for i in range(skip + 1, skip + mid_layers):
        ops += [w(i), b(i)]
    density_i = input_layers + mid_layers
    ops += [w(density_i), b(density_i)]
    w_color = params[f"Dense_{density_i + 1}"]["kernel"].astype(jnp.bfloat16)
    ops += [w_color[:-d_dim], w_color[-d_dim:], b(density_i + 1)]
    ops += [w(density_i + 2), b(density_i + 2)]
    return tuple(ops)


def _kernel(
    input_layers,
    mid_layers,
    x_ref,
    d_ref,
    *ops_and_out,
):
    ops = ops_and_out[:-1]
    out_ref = ops_and_out[-1]
    it = iter(ops)
    proj_x, phase_x, proj_d, phase_d = next(it), next(it), next(it), next(it)

    def matmul(z, w_ref, b_ref):
        # bf16 operands on the MXU, f32 accumulation and activations
        # (bf16 activations measured slower: the casts cost more VPU time
        # than the halved VMEM buys).
        return (
            jnp.dot(
                z.astype(jnp.bfloat16),
                w_ref[:],
                preferred_element_type=jnp.float32,
            )
            + b_ref[:]
        )

    emb_x = _sincos(x_ref[:], proj_x, phase_x)
    z = emb_x
    for _ in range(input_layers):
        z = jax.nn.relu(matmul(z, next(it), next(it)))
    # skip concat as split matmul
    w_z, w_e, b_s = next(it), next(it), next(it)
    z = matmul(z, w_z, b_s) + jnp.dot(
        emb_x.astype(jnp.bfloat16), w_e[:], preferred_element_type=jnp.float32
    )
    for _ in range(mid_layers - 1):
        z = matmul(jax.nn.relu(z), next(it), next(it))
    density = jax.nn.softplus(matmul(z, next(it), next(it)))
    emb_d = _sincos(d_ref[:], proj_d, phase_d)
    w_cz, w_cd, b_c = next(it), next(it), next(it)
    c = jax.nn.relu(
        matmul(z, w_cz, b_c)
        + jnp.dot(
            emb_d.astype(jnp.bfloat16), w_cd[:], preferred_element_type=jnp.float32
        )
    )
    rgb = jnp.tanh(matmul(c, next(it), next(it)))
    out_ref[:] = jnp.concatenate([density, rgb], axis=-1)


@functools.partial(
    jax.jit, static_argnames=("input_layers", "mid_layers", "interpret")
)
def fused_nerf_forward(
    packed: Tuple[Array, ...],
    x: Array,
    d: Array,
    input_layers: int = 5,
    mid_layers: int = 4,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """Run the fused MLP on ``[..., 3]`` points/dirs.

    The encoding frequencies are baked into ``packed`` (the sincos
    projection matrices), so only the layer counts are statics here.

    :param packed: output of :func:`pack_vanilla_params`.
    :return: ``(density [..., 1], rgb [..., 3])`` in f32.
    """
    lead_shape = x.shape[:-1]
    m = int(np.prod(lead_shape)) if lead_shape else 1
    xf = x.reshape(m, 3)
    df = d.reshape(m, 3)
    padded = -(-m // TILE) * TILE
    if padded != m:
        xf = jnp.pad(xf, ((0, padded - m), (0, 0)))
        df = jnp.pad(df, ((0, padded - m), (0, 0)))

    grid = padded // TILE
    point_spec = pl.BlockSpec((TILE, 3), lambda i: (i, 0), memory_space=pltpu.VMEM)
    weight_specs = [
        pl.BlockSpec(
            op.shape, functools.partial(lambda n, i: (0,) * n, len(op.shape)),
            memory_space=pltpu.VMEM,
        )
        for op in packed
    ]
    out = pl.pallas_call(
        functools.partial(_kernel, input_layers, mid_layers),
        out_shape=jax.ShapeDtypeStruct((padded, 4), jnp.float32),
        grid=(grid,),
        in_specs=[point_spec, point_spec] + weight_specs,
        out_specs=pl.BlockSpec(
            (TILE, 4), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(xf, df, *packed)

    out = out[:m].reshape(*lead_shape, 4)
    return out[..., 0:1], out[..., 1:4]
