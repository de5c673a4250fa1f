"""Fused bias + leaky-ReLU * sqrt(2).

TPU-native equivalent of the reference `fused_bias_act` CUDA kernel
(`op/fused_bias_act_kernel.cu:18-65`) and its wrapper (`op/fused_act.py`).
On TPU, XLA fuses bias-add + leaky-ReLU + scale into neighbouring ops
automatically, so the default path is plain jnp; a Pallas kernel is provided
(`fused_leaky_relu_pallas`) to pin the fusion on the hot decoder path and as a
demonstration of the op's kernel form. Both are differentiable to any order
(the reference needed a hand-written grad=1 kernel re-entry; JAX does not).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

SQRT2 = math.sqrt(2.0)


def fused_leaky_relu(x: jnp.ndarray, bias: jnp.ndarray | None = None,
                     negative_slope: float = 0.2,
                     scale: float = SQRT2) -> jnp.ndarray:
    """leaky_relu(x + bias) * scale, bias broadcast over the channel (last) axis.

    Matches `fused_leaky_relu` (`op/fused_act.py:216-233`): the reference
    broadcasts a per-channel bias over NCHW dim 1; here layouts are NHWC /
    (..., C), so bias broadcasts over the trailing axis.
    """
    if bias is not None:
        x = x + bias.reshape((1,) * (x.ndim - 1) + (-1,))
    return jax.nn.leaky_relu(x, negative_slope) * scale


def scaled_leaky_relu(x: jnp.ndarray, negative_slope: float = 0.2) -> jnp.ndarray:
    """leaky_relu(x) * sqrt(2) without bias (`models/CodeDiffuser.py:50-59`)."""
    return jax.nn.leaky_relu(x, negative_slope) * SQRT2


# ---------------------------------------------------------------------------
# Pallas variant
# ---------------------------------------------------------------------------

def _flr_kernel(x_ref, b_ref, o_ref, *, negative_slope, scale):
    x = x_ref[:] + b_ref[:]
    o_ref[:] = jnp.where(x >= 0, x, x * negative_slope) * scale


@partial(jax.jit, static_argnames=("negative_slope", "scale"))
def fused_leaky_relu_pallas(x: jnp.ndarray, bias: jnp.ndarray,
                            negative_slope: float = 0.2,
                            scale: float = SQRT2) -> jnp.ndarray:
    """Pallas fused bias+lrelu for (..., C) tensors with C % 128 == 0.

    Falls back to the XLA path when the trailing dim is not lane-aligned.
    """
    from jax.experimental import pallas as pl

    c = x.shape[-1]
    n = x.size // c
    if c % 128 != 0 or n % 8 != 0:
        return fused_leaky_relu(x, bias, negative_slope, scale)

    xf = x.reshape(n, c)
    bf = bias.reshape(1, c).astype(x.dtype)

    block_n = min(n, 512)
    while n % block_n:
        block_n //= 2

    out = pl.pallas_call(
        partial(_flr_kernel, negative_slope=negative_slope, scale=scale),
        out_shape=jax.ShapeDtypeStruct((n, c), x.dtype),
        grid=(n // block_n,),
        in_specs=[
            pl.BlockSpec((block_n, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_n, c), lambda i: (i, 0)),
        interpret=jax.default_backend() != "tpu",  # CPU tests run interpreted
    )(xf, bf)
    return out.reshape(x.shape)
