"""Projector pooling.

The reference uses `F.adaptive_avg_pool2d` to halve the 32x32 token grid to
16x16 (modeling_perception_lm.py:42-60). For an exact integer ratio,
adaptive average pooling == non-overlapping mean pooling, which on TPU is a
reshape + mean the compiler fuses for free — no kernel needed.
"""

from __future__ import annotations

import jax.numpy as jnp


def pool_tokens_2x(tokens: jnp.ndarray, ratio: int = 2) -> jnp.ndarray:
    """(B, N, C) square token grid -> (B, N/ratio^2, C) by mean pooling.

    Equivalent to PerceptionLMAdaptiveAvgPooling(pooling_ratio=ratio) when
    sqrt(N) % ratio == 0 (always true here: 32 % 2 == 0).
    """
    b, n, c = tokens.shape
    h = int(round(n ** 0.5))
    assert h * h == n, f"num_tokens {n} must be square"
    assert h % ratio == 0
    ho = h // ratio
    x = tokens.reshape(b, ho, ratio, ho, ratio, c)
    x = x.astype(jnp.float32).mean(axis=(2, 4))
    return x.reshape(b, ho * ho, c).astype(tokens.dtype)
