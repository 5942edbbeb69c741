"""SAM module tests: shapes on a tiny config, windowing, pipeline fallback."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from grasp_any_region_tpu.sam.model import (
    SAMConfig,
    _window_partition,
    _window_unpartition,
    encode_image,
    encode_points,
    decode_masks,
    init_sam_params,
    predict_mask,
)
from grasp_any_region_tpu.sam.pipeline import (
    SamPredictor,
    mask_contours,
    postprocess_mask,
    preprocess_sam,
)

TINY = SAMConfig(
    img_size=128, patch_size=16, embed_dim=32, depth=2, num_heads=2,
    window_size=4, global_attn_indexes=(1,), out_chans=32,
    decoder_mlp_dim=64,
)


def test_window_partition_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 7, 9, 5)).astype(np.float32))
    w, padded = _window_partition(x, 4)
    assert w.shape == (2 * 2 * 3, 4, 4, 5)
    back = _window_unpartition(w, 4, padded, (7, 9))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


@pytest.mark.slow  # >15 s on the 1-core CPU lane (round-4 fast-lane budget)
def test_sam_forward_shapes(rng):
    params = init_sam_params(jax.random.PRNGKey(0), TINY)
    pix = jnp.asarray(rng.standard_normal((1, 3, 128, 128)).astype(np.float32))
    emb = encode_image(params, TINY, pix)
    assert emb.shape == (1, 32, 8, 8)
    pts = jnp.asarray([[[0.3, 0.4], [0.1, 0.1]]], jnp.float32)
    labs = jnp.asarray([[1, 2]], jnp.int32)
    sparse = encode_points(params, pts, labs)
    assert sparse.shape == (1, 2, 32)
    masks, iou = decode_masks(params, TINY, emb, sparse)
    assert masks.shape == (1, 4, 32, 32)
    assert iou.shape == (1, 4)
    best, best_iou = predict_mask(params, TINY, pix, pts, labs)
    assert best.shape == (1, 32, 32)
    assert np.isfinite(np.asarray(best)).all()


def test_preprocess_postprocess_roundtrip(rng):
    img = (rng.random((300, 500, 3)) * 255).astype(np.uint8)
    pix, scale, (nh, nw) = preprocess_sam(img, 1024)
    assert pix.shape == (1, 3, 1024, 1024)
    assert nw == 1024 and nh == round(300 * 1024 / 500)
    logits = rng.standard_normal((256, 256)).astype(np.float32)
    m = postprocess_mask(logits, (nh, nw), (300, 500), 1024)
    assert m.shape == (300, 500)


def test_fallback_predictor_box_and_points():
    pred = SamPredictor()
    img = np.zeros((100, 200, 3), np.uint8)
    m = pred.predict(img, box=(20, 10, 80, 60))
    assert m[30, 50] == 1 and m[5, 5] == 0
    assert m.sum() == (80 - 20) * (60 - 10)
    m2 = pred.predict(img, points=[(100, 50)], point_labels=[1])
    assert m2[50, 100] == 1 and m2.sum() > 0


def test_mask_contours():
    m = np.zeros((10, 10), np.uint8)
    m[2:8, 3:9] = 1
    e = mask_contours(m)
    assert e[2, 3] == 1 and e[4, 5] == 0
    assert e.sum() < m.sum()
