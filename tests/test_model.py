"""Model-level tests on gar_tiny: shapes, cache consistency, replay parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from grasp_any_region_tpu.core.config import gar_tiny
from grasp_any_region_tpu.models import (
    GARBatch,
    KVCache,
    embed_tokens,
    gar_prefill,
    init_gar_params,
    init_llama_params,
    llama_decode_step,
    llama_prefill,
    lm_logits,
    roi_align_tiled,
    scatter_image_features,
    scatter_replay,
    seed_cache_from_prefill,
)
from grasp_any_region_tpu.ops import merge_tiles, roi_align


CFG = gar_tiny()


@pytest.fixture(scope="module")
def params():
    return init_gar_params(jax.random.PRNGKey(0), CFG)


def _np(x):
    return np.asarray(x)


# ---------------------------------------------------------------------------
# roi_align_tiled == roi_align on the merged map
# ---------------------------------------------------------------------------

def test_roi_align_tiled_matches_merged(rng):
    t, side, d = 6, 16, 8
    ncw, nch = 3, 2
    tiles = rng.standard_normal((t, side, side, d)).astype(np.float32)
    # merged map: (1, T, D, 16, 16) -> (D, H, W)
    tiles_cdhw = jnp.asarray(tiles).transpose(0, 3, 1, 2)[None]
    merged = merge_tiles(tiles_cdhw, ncw=ncw, nch=nch)[0]  # (D, 32, 48)
    boxes = np.array(
        [[1.0, 2.0, 40.0, 30.0], [0.2, 0.1, 1.5, 1.2], [10.0, 5.0, 20.0, 25.0]],
        np.float32,
    )
    ref = roi_align(merged, jnp.asarray(boxes), output_size=(16, 16),
                    spatial_scale=1.0, sampling_ratio=2, aligned=True)
    got = roi_align_tiled(
        jnp.asarray(tiles), jnp.int32(ncw), jnp.int32(nch), jnp.asarray(boxes)
    )  # (R, 16, 16, D)
    np.testing.assert_allclose(
        _np(got.transpose(0, 3, 1, 2)), _np(ref), rtol=1e-4, atol=1e-5
    )


# ---------------------------------------------------------------------------
# scatter ops
# ---------------------------------------------------------------------------

def test_scatter_image_features_order(rng):
    s, d, t, tok = 12, 4, 2, 3
    ids = np.full((s,), 7, np.int32)
    img_pos = [2, 3, 4, 5, 6, 7]  # 6 = t*tok placeholders
    ids[img_pos] = 99
    tok_embeds = rng.standard_normal((s, d)).astype(np.float32)
    feats = rng.standard_normal((t, tok, d)).astype(np.float32)
    out = _np(scatter_image_features(
        jnp.asarray(ids), jnp.asarray(tok_embeds), jnp.asarray(feats), 99))
    flat = feats.reshape(t * tok, d)
    for j, p in enumerate(img_pos):
        np.testing.assert_allclose(out[p], flat[j], rtol=1e-6)
    keep = [i for i in range(s) if i not in img_pos]
    np.testing.assert_allclose(out[keep], tok_embeds[keep], rtol=1e-6)


def test_scatter_replay_valid_and_invalid(rng):
    b, s, d, r, run = 1, 20, 4, 2, 5
    embeds = rng.standard_normal((b, s, d)).astype(np.float32)
    rep = rng.standard_normal((b, r, run, d)).astype(np.float32)
    pos = np.array([[3, 11]], np.int32)
    valid = np.array([[True, False]])
    out = _np(scatter_replay(jnp.asarray(embeds), jnp.asarray(rep),
                             jnp.asarray(pos), jnp.asarray(valid)))
    np.testing.assert_allclose(out[0, 3:8], rep[0, 0], rtol=1e-6)
    np.testing.assert_allclose(out[0, 11:16], embeds[0, 11:16], rtol=1e-6)  # invalid untouched
    np.testing.assert_allclose(out[0, :3], embeds[0, :3], rtol=1e-6)


# ---------------------------------------------------------------------------
# llama prefill/decode cache consistency
# ---------------------------------------------------------------------------

@pytest.mark.slow  # >15 s on the 1-core CPU lane (round-4 fast-lane budget)
def test_decode_matches_teacher_forcing(rng):
    cfg = CFG.text
    params = init_llama_params(jax.random.PRNGKey(1), cfg, CFG.padded_vocab_size)
    b, s_prompt, s_total = 2, 5, 9
    ids = rng.integers(0, 1000, size=(b, s_total)).astype(np.int32)
    pos = np.broadcast_to(np.arange(s_total, dtype=np.int32), (b, s_total)).copy()
    embeds = embed_tokens(params, jnp.asarray(ids), jnp.float32)

    # full forward over the whole sequence
    full_hidden, _ = llama_prefill(
        params, cfg, embeds, jnp.asarray(pos), use_flash=False)
    full_logits = lm_logits(params, cfg, full_hidden, valid_vocab=CFG.extended_vocab_size)

    # prefill prompt, then decode the rest one token at a time
    ph, kv = llama_prefill(
        params, cfg, embeds[:, :s_prompt], jnp.asarray(pos[:, :s_prompt]),
        use_flash=False)
    cache = seed_cache_from_prefill(
        CFG, kv, jnp.full((b,), s_prompt, jnp.int32), s_total, dtype=jnp.float32)
    np.testing.assert_allclose(
        _np(lm_logits(params, cfg, ph[:, -1], valid_vocab=CFG.extended_vocab_size)),
        _np(full_logits[:, s_prompt - 1]), rtol=2e-3, atol=2e-3)

    hidden = None
    for step in range(s_prompt, s_total):
        emb = embeds[:, step : step + 1]
        hidden, cache = llama_decode_step(params, cfg, emb, cache, s_prompt)
        step_logits = lm_logits(params, cfg, hidden[:, 0], valid_vocab=CFG.extended_vocab_size)
        np.testing.assert_allclose(
            _np(step_logits), _np(full_logits[:, step]), rtol=2e-3, atol=2e-3,
            err_msg=f"divergence at decode step {step}")


# ---------------------------------------------------------------------------
# end-to-end tiny prefill
# ---------------------------------------------------------------------------

@pytest.mark.slow  # >15 s on the 1-core CPU lane (round-4 fast-lane budget)
def test_gar_prefill_end_to_end(rng, params):
    cfg = CFG
    tok = cfg.tokens_per_tile  # 256
    t = 1 + 2  # thumb + 2 tiles (ncw=2, nch=1)
    n_img = t * tok
    run = 256
    s = n_img + run + 32
    ids = np.full((1, s), 11, np.int32)
    ids[0, 1 : 1 + n_img] = cfg.image_token_id
    crop_start = 1 + n_img + 3
    crop_id = cfg.crop_token_ids[0]
    ids[0, crop_start : crop_start + run] = crop_id
    positions = np.arange(s, dtype=np.int32)[None]
    seg = np.ones((1, s), np.int32)
    pix = rng.standard_normal((1, t, 3, 448, 448)).astype(np.float32)
    msk = np.zeros((1, t, 3, 448, 448), np.float32)
    msk[:, :, :, :100, :100] = 1.0  # binary mode
    batch = GARBatch(
        input_ids=jnp.asarray(ids),
        positions=jnp.asarray(positions),
        segment_ids=jnp.asarray(seg),
        pixel_values=jnp.asarray(pix),
        mask_values=jnp.asarray(msk),
        aspect_ratio=jnp.asarray([[2, 1]], jnp.int32),
        bboxes=jnp.asarray([[[0.1, 0.2, 0.8, 0.9], [0, 0, 0, 0]]], jnp.float32),
        replay_pos=jnp.asarray([[crop_start, 0]], jnp.int32),
        replay_valid=jnp.asarray([[True, False]]),
        num_tiles=jnp.asarray([t], jnp.int32),
    )
    hidden, (ks, vs) = gar_prefill(
        params, cfg, batch, mask_compat=False, use_flash=False,
        compute_dtype=jnp.float32,
    )
    assert hidden.shape == (1, s, cfg.text.hidden_size)
    assert ks.shape == (cfg.text.num_layers, 1, s, cfg.text.num_kv_heads, cfg.text.head_dim)
    assert np.all(np.isfinite(_np(hidden)))


def test_mask_embed_zero_init_is_noop(rng, params):
    """Zero-init mask conv must not change vision output (reference trains
    from an exact PLM clone at step 0, grasp_any_region.py:86-87)."""
    from grasp_any_region_tpu.models import encode_images

    cfg = CFG
    pix = jnp.asarray(rng.standard_normal((2, 3, 448, 448)).astype(np.float32))
    msk = jnp.asarray(np.ones((2, 3, 448, 448), np.float32))
    with_mask = encode_images(params, cfg, pix, msk, mask_compat=False,
                              compute_dtype=jnp.float32)
    without = encode_images(params, cfg, pix, None, compute_dtype=jnp.float32)
    np.testing.assert_allclose(_np(with_mask), _np(without), rtol=1e-5, atol=1e-5)


def test_vit_grouped_remat_matches_plain():
    """Grouped (nested) remat is numerically invisible: forward AND grads
    match the per-block remat scan exactly (same op order per block; only
    what gets saved vs recomputed changes). depth=5 with group=2 exercises
    the remainder path (2 groups of 2 + 1 trailing block)."""
    import dataclasses

    import numpy as np
    import jax
    import jax.numpy as jnp

    from grasp_any_region_tpu.core.config import gar_tiny
    from grasp_any_region_tpu.models.vision import (
        init_vision_params, vision_forward,
    )

    cfg = dataclasses.replace(gar_tiny().vision, depth=5)
    params = init_vision_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    pix = jnp.asarray(
        rng.standard_normal((2, 3, cfg.img_size[0], cfg.img_size[1])),
        jnp.float32,
    )

    def loss(p, g):
        out = vision_forward(p, cfg, pix, remat=True, remat_group=g,
                             compute_dtype=jnp.float32)
        return jnp.mean(out * out)

    l1, g1 = jax.jit(jax.value_and_grad(loss), static_argnums=1)(params, 1)
    l2, g2 = jax.jit(jax.value_and_grad(loss), static_argnums=1)(params, 2)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(g2))
    for k, v in flat1:
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat2[k]), atol=1e-6,
            err_msg=jax.tree_util.keystr(k),
        )
