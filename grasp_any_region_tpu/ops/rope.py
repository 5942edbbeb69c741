"""Rotary position embeddings: 1D (Llama-3 decoder) and 2D (PE ViT).

Decoder rope follows the Llama-3 "llama3" frequency-scaling rule
(factor/low_freq/high_freq/original_max_position); the reference inherits it
through HF transformers' LlamaRotaryEmbedding.

Vision rope mirrors the capability of timm's PE rope ("rope_mixed":
per-block *learnable* 2D frequencies, used by the vision tower via
`blk(x, rope=rot_pos_embed[i])` in the reference's patched forward_features,
modeling_perception_lm.py:200-214). Angles are computed once per forward in
fp32 and broadcast to all tiles.

Rotation convention: half-rotation ("NeoX"/Llama style) —
  rotate_half(x) = concat(-x2, x1) with x = concat(x1, x2)
  x_rot = x * cos + rotate_half(x) * sin
The 2D variant builds per-token angles ang = fx * x + fy * y with
(head_dim // 4) base magnitudes per axis pair, matching the RoPE-ViT
"mixed" parameterization (freqs learnable per depth & head).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import TextConfig, VisionConfig


# ---------------------------------------------------------------------------
# 1D Llama rope
# ---------------------------------------------------------------------------

def llama_inv_freq(cfg: TextConfig) -> jnp.ndarray:
    """(head_dim/2,) inverse frequencies, with optional llama3 scaling."""
    d = cfg.head_dim
    inv = 1.0 / (cfg.rope_theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    if cfg.rope_scaling_factor is None:
        return inv
    factor = cfg.rope_scaling_factor
    low = cfg.rope_low_freq_factor
    high = cfg.rope_high_freq_factor
    old_len = cfg.rope_original_max_position
    low_wavelen = old_len / low
    high_wavelen = old_len / high
    wavelen = 2.0 * math.pi / inv
    # llama3 rule: long wavelengths scaled by 1/factor, short kept, smooth in between
    scaled = jnp.where(wavelen > low_wavelen, inv / factor, inv)
    smooth = (old_len / wavelen - low) / (high - low)
    smoothed = (1 - smooth) / factor * inv + smooth * inv
    is_medium = (wavelen <= low_wavelen) & (wavelen >= high_wavelen)
    return jnp.where(is_medium, smoothed, scaled)


def rope_cos_sin(positions: jnp.ndarray, inv_freq: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """positions (...,) int -> cos/sin (..., head_dim) with duplicated halves."""
    ang = positions.astype(jnp.float32)[..., None] * inv_freq  # (..., d/2)
    ang = jnp.concatenate([ang, ang], axis=-1)
    return jnp.cos(ang), jnp.sin(ang)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    d = x.shape[-1] // 2
    return jnp.concatenate([-x[..., d:], x[..., :d]], axis=-1)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x (..., S, H, D) or (..., S, D); cos/sin broadcastable (..., S, D)."""
    if x.ndim == cos.ndim + 1:  # (..., S, H, D): insert head axis into cos/sin
        cos = cos[..., :, None, :]
        sin = sin[..., :, None, :]
    xf = x.astype(jnp.float32)
    out = xf * cos + rotate_half(xf) * sin
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# 2D vision rope
# ---------------------------------------------------------------------------

def init_mixed_rope_freqs(
    rng: jax.Array, cfg: VisionConfig
) -> jnp.ndarray:
    """Learnable per-block 2D frequencies, shape (depth, num_heads, head_dim/2, 2).

    Initialization follows the RoPE-ViT "mixed" scheme: base magnitudes
    theta^(-4t/d) for t in [0, d/4), each pair given a random planar rotation
    so x/y axes mix; last axis holds the (fx, fy) coefficients.
    """
    d = cfg.head_dim
    assert d % 4 == 0, "head_dim must be divisible by 4 for 2D rope"
    mag = 1.0 / (
        cfg.rope_temperature ** (jnp.arange(0, d // 4, dtype=jnp.float32) * 4.0 / d)
    )  # (d/4,)
    angles = jax.random.uniform(
        rng, (cfg.depth, cfg.num_heads, 1), minval=0.0, maxval=2 * math.pi
    )
    # two phase-shifted copies per magnitude -> d/2 frequency pairs
    fx = jnp.concatenate(
        [mag * jnp.cos(angles), mag * jnp.cos(angles + math.pi / 2)], axis=-1
    )  # (depth, heads, d/2)
    fy = jnp.concatenate(
        [mag * jnp.sin(angles), mag * jnp.sin(angles + math.pi / 2)], axis=-1
    )
    return jnp.stack([fx, fy], axis=-1)  # (depth, heads, d/2, 2)


def axial_rope_angles(cfg: VisionConfig) -> jnp.ndarray:
    """Non-learnable axial 2D rope: (num_patches, head_dim/2) angles shared by
    all blocks/heads. x-coordinate drives the first d/4 pairs, y the rest."""
    gh, gw = cfg.grid_size
    d = cfg.head_dim
    mag = 1.0 / (
        cfg.rope_temperature ** (jnp.arange(0, d // 4, dtype=jnp.float32) * 4.0 / d)
    )
    ys = jnp.arange(gh, dtype=jnp.float32)
    xs = jnp.arange(gw, dtype=jnp.float32)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    ang_x = xx.reshape(-1, 1) * mag  # (N, d/4)
    ang_y = yy.reshape(-1, 1) * mag
    return jnp.concatenate([ang_x, ang_y], axis=-1)  # (N, d/2)


def mixed_rope_angles(freqs: jnp.ndarray, cfg: VisionConfig) -> jnp.ndarray:
    """freqs (depth, heads, d/2, 2) -> angles (depth, heads, num_patches, d/2)."""
    gh, gw = cfg.grid_size
    ys = jnp.arange(gh, dtype=jnp.float32)
    xs = jnp.arange(gw, dtype=jnp.float32)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    coords = jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1)  # (N, 2)
    # ang[l,h,n,t] = fx[l,h,t]*x[n] + fy[l,h,t]*y[n]
    return jnp.einsum("nc,lhtc->lhnt", coords, freqs.astype(jnp.float32))


def apply_rope_2d(
    x: jnp.ndarray, angles: jnp.ndarray, num_prefix: int = 1
) -> jnp.ndarray:
    """Rotate patch tokens; prefix (CLS) tokens pass through un-rotated.

    x: (B, H, S, D) with S = num_prefix + N
    angles: (H, N, D/2) or (N, D/2)
    """
    if angles.ndim == 2:
        angles = angles[None]  # (1, N, d/2)
    cos = jnp.cos(angles)
    sin = jnp.sin(angles)
    cos = jnp.concatenate([cos, cos], axis=-1)[None]  # (1, H|1, N, D)
    sin = jnp.concatenate([sin, sin], axis=-1)[None]
    prefix, patches = x[:, :, :num_prefix], x[:, :, num_prefix:]
    pf = patches.astype(jnp.float32)
    rotated = pf * cos + rotate_half(pf) * sin
    return jnp.concatenate([prefix, rotated.astype(x.dtype)], axis=2)


def rope_pair_tables(
    angles: jnp.ndarray, s_pad: int, num_prefix: int = 1
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-layer cos/sin tables in HEAD-PAIR layout for the fused ViT
    attention kernel (ops/vit_attention.vit_attention_fused_qkv).

    angles: (H, N, D/2) -> (H/2, s_pad, 2*D) f32 where consecutive head
    pairs share a 128-lane slice. Prefix (CLS) rows and padded tail rows get
    the identity rotation (cos=1, sin=0) — pad rows are masked as keys and
    dropped as queries anyway.
    """
    h, n, half = angles.shape
    d = 2 * half
    assert h % 2 == 0, "pair layout needs an even head count"
    cos = jnp.cos(angles)
    sin = jnp.sin(angles)
    cos = jnp.concatenate([cos, cos], axis=-1)  # (H, N, D) duplicated halves
    sin = jnp.concatenate([sin, sin], axis=-1)
    pad_after = s_pad - num_prefix - n
    cos = jnp.pad(cos, ((0, 0), (num_prefix, pad_after), (0, 0)),
                  constant_values=1.0)
    sin = jnp.pad(sin, ((0, 0), (num_prefix, pad_after), (0, 0)))
    cos2 = cos.reshape(h // 2, 2, s_pad, d).transpose(0, 2, 1, 3)
    sin2 = sin.reshape(h // 2, 2, s_pad, d).transpose(0, 2, 1, 3)
    return cos2.reshape(h // 2, s_pad, 2 * d), sin2.reshape(h // 2, s_pad, 2 * d)


def apply_rope_2d_tshd(
    x: jnp.ndarray, angles: jnp.ndarray, num_prefix: int = 1
) -> jnp.ndarray:
    """Same rotation on a (T, S, H, D) layout — avoids transposing q/k to
    head-major and back every block (two 70 MB round trips per tensor in the
    17-tile ViT). angles: (H, N, D/2) or (N, D/2)."""
    if angles.ndim == 2:
        angles = angles[None]
    cos = jnp.cos(angles)  # (H|1, N, d/2)
    sin = jnp.sin(angles)
    # -> (1, N, H|1, D)
    cos = jnp.concatenate([cos, cos], axis=-1).transpose(1, 0, 2)[None]
    sin = jnp.concatenate([sin, sin], axis=-1).transpose(1, 0, 2)[None]
    prefix, patches = x[:, :num_prefix], x[:, num_prefix:]
    pf = patches.astype(cos.dtype)
    rotated = pf * cos + rotate_half(pf) * sin
    return jnp.concatenate([prefix, rotated.astype(x.dtype)], axis=1)
