"""Multimodal projector: linear -> GELU -> linear -> 2x mean pool.

Capability of PerceptionLMMultiModalProjector (modeling_perception_lm.py:63-92)
+ PerceptionLMAdaptiveAvgPooling (:42-60). 32x32 ViT tokens per tile become
16x16 = 256 projected tokens (SURVEY.md §0 geometry invariants).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.config import GARConfig
from ..ops.pooling import pool_tokens_2x


def init_projector_params(rng: jax.Array, cfg: GARConfig, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(rng)
    dv, dt = cfg.vision.width, cfg.text.hidden_size

    def trunc(key, shape, std=0.02):
        return (jax.random.truncated_normal(key, -2, 2, shape, jnp.float32) * std).astype(dtype)

    return {
        "fc1": trunc(k1, (dv, dt)),
        "b1": jnp.zeros((dt,), dtype),
        "fc2": trunc(k2, (dt, dt)),
        "b2": jnp.zeros((dt,), dtype),
    }


def projector_forward(params: dict, cfg: GARConfig, features: jnp.ndarray) -> jnp.ndarray:
    """(T, N, Dv) -> (T, N/r^2, Dt)."""
    x = features @ params["fc1"].astype(features.dtype) + params["b1"].astype(features.dtype)
    x = jax.nn.gelu(x, approximate=False)
    x = x @ params["fc2"].astype(x.dtype) + params["b2"].astype(x.dtype)
    if cfg.projector_pooling_ratio > 1:
        x = pool_tokens_2x(x, cfg.projector_pooling_ratio)
    return x
