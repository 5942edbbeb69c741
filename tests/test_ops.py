"""Unit tests for grasp_any_region_tpu.ops against numpy goldens."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from grasp_any_region_tpu.core.config import TextConfig, VisionConfig, gar_tiny
from grasp_any_region_tpu.ops import (
    apply_rope,
    apply_rope_2d,
    axial_rope_angles,
    decode_attention_reference,
    init_mixed_rope_freqs,
    llama_inv_freq,
    merge_tiles,
    merge_tiles_masked,
    mha_reference,
    mixed_rope_angles,
    pool_tokens_2x,
    roi_align,
    rope_cos_sin,
    split_tiles,
)
from tests.golden.roi_align_ref import roi_align_np


# ---------------------------------------------------------------------------
# tiles
# ---------------------------------------------------------------------------

def test_tiles_roundtrip(rng):
    img = rng.standard_normal((2, 3, 8 * 4, 8 * 6)).astype(np.float32)
    tiles = split_tiles(jnp.asarray(img), ncw=6, nch=4)
    assert tiles.shape == (2, 24, 3, 8, 8)
    back = merge_tiles(tiles, ncw=6, nch=4)
    np.testing.assert_array_equal(np.asarray(back), img)


def test_tiles_order_row_major(rng):
    # tile (row r, col c) of the canvas must land at index r*ncw + c
    img = np.zeros((1, 1, 4, 6), np.float32)
    for r in range(2):
        for c in range(3):
            img[0, 0, r * 2 : (r + 1) * 2, c * 2 : (c + 1) * 2] = r * 3 + c
    tiles = split_tiles(jnp.asarray(img), ncw=3, nch=2)
    for i in range(6):
        assert float(tiles[0, i, 0, 0, 0]) == i


def test_merge_tiles_masked_matches_static(rng):
    tiles = rng.standard_normal((1, 8, 2, 4, 4)).astype(np.float32)
    ncw, nch = 4, 2
    static = merge_tiles(jnp.asarray(tiles), ncw=ncw, nch=nch)
    dynamic = merge_tiles_masked(
        jnp.asarray(tiles), jnp.int32(ncw), jnp.int32(nch), max_grid=4
    )
    np.testing.assert_allclose(
        np.asarray(dynamic[:, :, : nch * 4, : ncw * 4]), np.asarray(static), rtol=1e-6
    )
    # area outside the valid canvas is zero
    assert float(jnp.abs(dynamic[:, :, nch * 4 :, :]).sum()) == 0.0


# ---------------------------------------------------------------------------
# pooling
# ---------------------------------------------------------------------------

def test_pool_tokens_2x_exact_mean(rng):
    b, h, c = 3, 8, 5
    x = rng.standard_normal((b, h * h, c)).astype(np.float32)
    out = pool_tokens_2x(jnp.asarray(x))
    grid = x.reshape(b, h, h, c)
    ref = grid.reshape(b, 4, 2, 4, 2, c).mean(axis=(2, 4)).reshape(b, 16, c)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# roi_align
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("aligned", [True, False])
def test_roi_align_matches_numpy_golden(rng, aligned):
    feat = rng.standard_normal((4, 24, 40)).astype(np.float32)
    boxes = np.array(
        [
            [2.0, 3.0, 30.5, 20.0],
            [0.0, 0.0, 39.0, 23.0],
            [10.2, 5.7, 11.9, 8.1],   # small box
            [-3.0, -3.0, 5.0, 5.0],   # partially out of range
            [0.5, 0.5, 0.6, 0.6],     # degenerate tiny box
        ],
        np.float32,
    )
    got = roi_align(
        jnp.asarray(feat), jnp.asarray(boxes), output_size=(7, 9),
        spatial_scale=0.5, sampling_ratio=2, aligned=aligned,
    )
    ref = roi_align_np(feat, boxes, (7, 9), spatial_scale=0.5, sampling_ratio=2,
                       aligned=aligned)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)


def test_roi_align_constant_map_is_constant(rng):
    feat = np.full((2, 16, 16), 3.25, np.float32)
    boxes = np.array([[1.0, 1.0, 10.0, 12.0]], np.float32)
    out = roi_align(jnp.asarray(feat), jnp.asarray(boxes), output_size=(16, 16))
    np.testing.assert_allclose(np.asarray(out), 3.25, rtol=1e-6)


def test_roi_align_linear_ramp_exact(rng):
    # bilinear sampling of a linear function is exact (away from clamped edges)
    h, w = 32, 32
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    feat = (2.0 * xx + 3.0 * yy)[None]
    boxes = np.array([[4.0, 6.0, 20.0, 26.0]], np.float32)
    out = np.asarray(
        roi_align(jnp.asarray(feat), jnp.asarray(boxes), output_size=(4, 4))
    )
    # sample centers: x = x1-0.5 + (j+0.25±…)*bin — compute expectation directly
    ref = roi_align_np(feat, boxes, (4, 4))
    np.testing.assert_allclose(out, ref, rtol=1e-5)
    # and the analytic value of the center sample average
    bin_w = (20.0 - 4.0) / 4
    bin_h = (26.0 - 6.0) / 4
    x_c = 4.0 - 0.5 + 0 * bin_w + bin_w / 2  # mean of the 2 sample xs in bin 0
    y_c = 6.0 - 0.5 + bin_h / 2
    np.testing.assert_allclose(out[0, 0, 0, 0], 2 * x_c + 3 * y_c, rtol=1e-5)


def test_roi_align_batched_boxes(rng):
    feat = rng.standard_normal((3, 20, 20)).astype(np.float32)
    boxes = rng.uniform(0, 19, size=(8, 4)).astype(np.float32)
    boxes = np.concatenate(
        [np.minimum(boxes[:, :2], boxes[:, 2:]),
         np.maximum(boxes[:, :2], boxes[:, 2:])], axis=1)
    got = roi_align(jnp.asarray(feat), jnp.asarray(boxes), output_size=(16, 16))
    ref = roi_align_np(feat, boxes, (16, 16))
    assert got.shape == (8, 3, 16, 16)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# rope
# ---------------------------------------------------------------------------

def test_llama_inv_freq_no_scaling_matches_formula():
    cfg = TextConfig(head_dim=64, rope_theta=10000.0, rope_scaling_factor=None)
    inv = np.asarray(llama_inv_freq(cfg))
    ref = 1.0 / (10000.0 ** (np.arange(0, 64, 2) / 64))
    np.testing.assert_allclose(inv, ref, rtol=2e-5)


def test_llama3_scaling_monotone_and_bounded():
    cfg = TextConfig(head_dim=64, rope_scaling_factor=32.0)
    base = np.asarray(llama_inv_freq(
        TextConfig(head_dim=64, rope_scaling_factor=None)))
    scaled = np.asarray(llama_inv_freq(cfg))
    # scaled freqs never exceed base, never drop below base/factor
    assert np.all(scaled <= base + 1e-9)
    assert np.all(scaled >= base / 32.0 - 1e-12)
    # high-frequency (short wavelength) components unchanged
    assert np.allclose(scaled[0], base[0])


def test_rope_preserves_norm_and_relative_phase(rng):
    cfg = TextConfig(head_dim=32, rope_scaling_factor=None)
    inv = llama_inv_freq(cfg)
    pos = jnp.arange(10)
    cos, sin = rope_cos_sin(pos, inv)
    x = rng.standard_normal((1, 10, 2, 32)).astype(np.float32)
    out = np.asarray(apply_rope(jnp.asarray(x), cos[None], sin[None]))
    np.testing.assert_allclose(
        np.linalg.norm(out, axis=-1), np.linalg.norm(x, axis=-1), rtol=1e-5
    )
    # relative property: <R(p)q, R(p+k)v> independent of p
    q = rng.standard_normal((32,)).astype(np.float32)
    v = rng.standard_normal((32,)).astype(np.float32)
    def rot(vec, p):
        c, s = rope_cos_sin(jnp.asarray([p]), inv)
        return np.asarray(apply_rope(jnp.asarray(vec)[None, None], c, s))[0, 0]
    d1 = rot(q, 2) @ rot(v, 5)
    d2 = rot(q, 4) @ rot(v, 7)
    np.testing.assert_allclose(d1, d2, rtol=1e-4)


def test_vit_rope_shapes_and_cls_passthrough(rng):
    cfg = VisionConfig(width=64, depth=3, num_heads=4, patch_size=14,
                       img_size=(56, 56), ref_feat_shape=(4, 4))
    assert cfg.grid_size == (4, 4)
    freqs = init_mixed_rope_freqs(jax.random.PRNGKey(0), cfg)
    assert freqs.shape == (3, 4, 8, 2)
    ang = mixed_rope_angles(freqs, cfg)
    assert ang.shape == (3, 4, 16, 8)
    x = rng.standard_normal((2, 4, 17, 16)).astype(np.float32)
    out = np.asarray(apply_rope_2d(jnp.asarray(x), ang[0]))
    np.testing.assert_array_equal(out[:, :, 0], x[:, :, 0])  # CLS untouched
    np.testing.assert_allclose(
        np.linalg.norm(out[:, :, 1:], axis=-1),
        np.linalg.norm(x[:, :, 1:], axis=-1), rtol=1e-5,
    )
    ax = axial_rope_angles(cfg)
    assert ax.shape == (16, 8)


# ---------------------------------------------------------------------------
# attention
# ---------------------------------------------------------------------------

def _np_attention(q, k, v, causal=False, seg=None):
    b, sq, h, d = q.shape
    sk, kh = k.shape[1], k.shape[2]
    rep = h // kh
    k = np.repeat(k, rep, axis=2)
    v = np.repeat(v, rep, axis=2)
    logits = np.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(d)
    mask = np.ones((b, 1, sq, sk), bool)
    if causal:
        mask &= (np.arange(sq)[:, None] + sk - sq) >= np.arange(sk)[None, :]
    if seg is not None:
        mask &= seg[:, None, :, None] == seg[:, None, None, :]
    logits = np.where(mask, logits, -1e30)
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bkhd->bqhd", p, v)


@pytest.mark.parametrize("causal", [False, True])
def test_mha_reference_gqa(rng, causal):
    q = rng.standard_normal((2, 12, 8, 16)).astype(np.float32)
    k = rng.standard_normal((2, 12, 2, 16)).astype(np.float32)
    v = rng.standard_normal((2, 12, 2, 16)).astype(np.float32)
    got = mha_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=causal)
    ref = _np_attention(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)


def test_mha_segment_ids_block_diagonal(rng):
    q = rng.standard_normal((1, 8, 4, 8)).astype(np.float32)
    k = rng.standard_normal((1, 8, 4, 8)).astype(np.float32)
    v = rng.standard_normal((1, 8, 4, 8)).astype(np.float32)
    seg = np.array([[0, 0, 0, 1, 1, 1, 2, 2]], np.int32)
    got = mha_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        segment_ids=jnp.asarray(seg),
    )
    ref = _np_attention(q, k, v, seg=seg)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)


def test_decode_attention_matches_full(rng):
    """Decode-step attention == last-row of full causal attention."""
    b, s, h, kh, d = 2, 10, 8, 2, 16
    q_full = rng.standard_normal((b, s, h, d)).astype(np.float32)
    k = rng.standard_normal((b, s, kh, d)).astype(np.float32)
    v = rng.standard_normal((b, s, kh, d)).astype(np.float32)
    full = _np_attention(q_full, k, v, causal=True)
    # head-major cache (B, K, S_max, D); all s tokens in the prompt block
    cache_k = np.zeros((b, kh, 16, d), np.float32)
    cache_v = np.zeros((b, kh, 16, d), np.float32)
    cache_k[:, :, :s] = k.transpose(0, 2, 1, 3)
    cache_v[:, :, :s] = v.transpose(0, 2, 1, 3)
    got = decode_attention_reference(
        jnp.asarray(q_full[:, -1]),
        jnp.asarray(cache_k), jnp.asarray(cache_v),
        prompt_lens=jnp.full((b,), s, jnp.int32),
        write_pos=jnp.asarray(s - 1, jnp.int32),
        prompt_pad=s,
    )
    np.testing.assert_allclose(np.asarray(got), full[:, -1], rtol=1e-4, atol=1e-5)


def test_config_roundtrip(tmp_path):
    from grasp_any_region_tpu.core.config import (
        apply_overrides, gar_1b, load_config, save_config,
    )

    cfg = gar_1b()
    p = tmp_path / "cfg.json"
    save_config(cfg, str(p))
    cfg2 = load_config(str(p))
    assert cfg2 == cfg
    cfg3 = apply_overrides(cfg, {"text.num_layers": 4, "vision.depth": 2})
    assert cfg3.text.num_layers == 4 and cfg3.vision.depth == 2
    assert cfg.crop_token_ids == (128004, 128005, 128008, 128010, 128011)
    assert cfg.mask_patch_kernel == (14, 14)
    assert cfg.tokens_per_tile == 256
    assert gar_tiny().text.q_per_kv == 2


def test_gar_8b_config_consistency():
    from grasp_any_region_tpu.core.config import gar_8b

    cfg = gar_8b()
    assert cfg.text.num_heads * cfg.text.head_dim == 4096
    assert cfg.text.q_per_kv == 4
    assert cfg.vision.head_dim % 4 == 0  # 2D rope pairs
    assert cfg.mask_patch_kernel == (14, 14)
    assert cfg.tokens_per_tile == 256
    assert cfg.max_num_tiles == 8  # gar_8b trains with 8 tiles
    assert cfg.padded_vocab_size % 256 == 0


def test_layer_norm_fused_matches_reference(rng):
    from grasp_any_region_tpu.ops.norms import (
        layer_norm_fused,
        layer_norm_reference,
    )

    x = jnp.asarray(rng.standard_normal((3, 37, 256)), jnp.float32)
    w = jnp.asarray(rng.standard_normal(256), jnp.float32)
    b = jnp.asarray(rng.standard_normal(256), jnp.float32)
    ref = layer_norm_reference(x, w, b)
    out = layer_norm_fused(x, w, b, interpret=True, block_rows=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_layer_norm_tpu_wrapper_grads(rng):
    """The custom_vjp wrapper must produce the reference gradients (training
    paths differentiate through layer_norm)."""
    from grasp_any_region_tpu.ops import norms

    x = jnp.asarray(rng.standard_normal((4, 64)), jnp.float32)
    w = jnp.asarray(rng.standard_normal(64), jnp.float32)
    b = jnp.asarray(rng.standard_normal(64), jnp.float32)

    def loss_ref(x, w, b):
        return jnp.sum(norms.layer_norm_reference(x, w, b) ** 2)

    # drive the custom_vjp path with an interpret-mode forward
    orig = norms.layer_norm_fused
    norms.layer_norm_fused = lambda x, w, b, eps=1e-6, **kw: orig(
        x, w, b, eps, interpret=True, block_rows=4
    )
    try:
        def loss_tpu(x, w, b):
            return jnp.sum(norms._layer_norm_tpu(x, w, b, 1e-6) ** 2)

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
        g_tpu = jax.grad(loss_tpu, argnums=(0, 1, 2))(x, w, b)
        for a, r in zip(g_tpu, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       rtol=1e-4, atol=1e-4)
    finally:
        norms.layer_norm_fused = orig
