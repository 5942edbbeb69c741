"""Fused ViT block kernels (ops/vit_block.py + vit_attention_fused_qkv)
must reproduce the XLA block composition, including 2D rope (mixed and
axial), CLS pass-through, and the S -> S_pad row padding."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from grasp_any_region_tpu.core.config import VisionConfig
from grasp_any_region_tpu.models.vision import init_vision_params, vision_forward


def _cfg(rope_mixed=True):
    return VisionConfig(
        width=128, depth=2, num_heads=2, mlp_ratio=2.0,
        img_size=(112, 112), patch_size=14, rope_mixed=rope_mixed,
    )


@pytest.mark.parametrize("rope_mixed", [True, False])
def test_fused_blocks_match_xla_path(rng, rope_mixed):
    cfg = _cfg(rope_mixed)
    assert cfg.head_dim == 64 and cfg.seq_len % 8 != 0  # exercises padding
    params = init_vision_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    t = 2
    pix = jnp.asarray(rng.standard_normal((t, 3, 112, 112)), jnp.float32)
    ref = vision_forward(params, cfg, pix, compute_dtype=jnp.float32,
                         use_flash=False, fused_blocks=False)
    fused = vision_forward(params, cfg, pix, compute_dtype=jnp.float32,
                           fused_blocks=True)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), rtol=2e-3, atol=2e-4)


def test_fused_blocks_with_mask_embeds(rng):
    """Mask patch embeddings (the GAR injection point) flow through the
    fused path identically."""
    cfg = _cfg(True)
    params = init_vision_params(jax.random.PRNGKey(1), cfg, jnp.float32)
    t = 2
    pix = jnp.asarray(rng.standard_normal((t, 3, 112, 112)), jnp.float32)
    me = jnp.asarray(
        rng.standard_normal((t, cfg.num_patches, cfg.width)) * 0.1, jnp.float32)
    ref = vision_forward(params, cfg, pix, mask_embeds=me,
                         compute_dtype=jnp.float32, use_flash=False,
                         fused_blocks=False)
    fused = vision_forward(params, cfg, pix, mask_embeds=me,
                           compute_dtype=jnp.float32, fused_blocks=True)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), rtol=2e-3, atol=2e-4)


def test_rope_pair_tables_match_tshd_application(rng):
    """The pair-layout cos/sin tables + flat-lane rotate-half must equal
    apply_rope_2d_tshd on head-major data."""
    from grasp_any_region_tpu.ops.rope import (
        apply_rope_2d_tshd,
        mixed_rope_angles,
        init_mixed_rope_freqs,
        rope_pair_tables,
        rotate_half,
    )

    cfg = _cfg(True)
    freqs = init_mixed_rope_freqs(jax.random.PRNGKey(2), cfg)
    ang = mixed_rope_angles(freqs.astype(jnp.float32), cfg)[0]  # (H, N, d/2)
    t, s = 2, cfg.seq_len
    h, d = cfg.num_heads, cfg.head_dim
    x = jnp.asarray(rng.standard_normal((t, s, h, d)), jnp.float32)
    ref = apply_rope_2d_tshd(x, ang, 1)

    s_pad = s + ((-s) % 8)
    cos2, sin2 = rope_pair_tables(ang, s_pad, 1)
    # emulate the kernel's flat-lane math on the (S_pad, 2*64) pair slice
    xf = jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0), (0, 0)))
    flat = xf.reshape(t, s_pad, h // 2, 2 * d).transpose(0, 2, 1, 3)
    lane = np.arange(2 * d)
    half = d // 2
    fwd = jnp.roll(flat, -half, axis=-1)
    bwd = jnp.roll(flat, half, axis=-1)
    rh = jnp.where(jnp.asarray(lane % d < half), -fwd, bwd)
    out = flat * cos2[None] + rh * sin2[None]
    out = out.transpose(0, 2, 1, 3).reshape(t, s_pad, h, d)[:, :s]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
