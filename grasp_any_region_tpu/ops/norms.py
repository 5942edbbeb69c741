"""Normalization ops.

RMSNorm (Llama decoder) and LayerNorm (PE ViT). Plain jnp — XLA fuses these
into neighboring matmuls on TPU; the reference needed xtuner's
`dispatch_modules` to patch in fused CUDA RMSNorm (grasp_any_region.py:91),
which has no TPU analogue worth hand-writing. fp32 math, cast back to input
dtype.
"""

from __future__ import annotations

import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * (var + eps) ** -0.5
    return (xf * weight.astype(jnp.float32)).astype(x.dtype)


def layer_norm(
    x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-6
) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    xf = (xf - mean) * (var + eps) ** -0.5
    return (xf * weight.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)
