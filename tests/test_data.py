"""Data-layer tests: resize parity vs PIL, tiling math, tokenizer/chat,
prompt rasterization, and builder -> model end-to-end."""

import numpy as np
import pytest
from PIL import Image

import jax

from grasp_any_region_tpu.core.config import gar_tiny
from grasp_any_region_tpu.data.builders import (
    RegionSample,
    build_region_batch,
    build_sample,
    collate_samples,
)
from grasp_any_region_tpu.data.chat import (
    ChatMessage,
    apply_chat_template,
    expand_image_tokens,
    find_crop_runs,
    mask_labels,
)
from grasp_any_region_tpu.data.image_processor import (
    GARImageProcessor,
    ImageProcessorConfig,
    find_supported_aspect_ratios,
    select_tile_grid,
)
from grasp_any_region_tpu.data.prompts import (
    bbox_from_mask,
    multi_region_question,
    rasterize_prompts,
    single_region_question,
)
from grasp_any_region_tpu.data.resize import resize_bicubic, resize_nearest
from grasp_any_region_tpu.data.tokenizer import GARTokenizer


# ---------------------------------------------------------------------------
# resize parity vs PIL
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("size", [((64, 48), (448, 448)), ((800, 600), (448, 336)),
                                  ((97, 131), (448, 448)), ((1000, 50), (448, 448))])
def test_bicubic_matches_pil_float(rng, size):
    (w, h), (ow, oh) = size
    img = (rng.random((h, w)) * 255).astype(np.float32)
    ours = resize_bicubic(img, oh, ow)
    ref = np.asarray(Image.fromarray(img, mode="F").resize((ow, oh), Image.BICUBIC))
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-4)


def test_bicubic_matches_pil_uint8_rgb(rng):
    img = (rng.random((120, 200, 3)) * 255).astype(np.uint8)
    ours = resize_bicubic(img, 448, 448)
    # exact against PIL's float path per channel (the algorithm itself)
    refF = np.stack(
        [
            np.asarray(
                Image.fromarray(img[:, :, c].astype(np.float32), mode="F").resize(
                    (448, 448), Image.BICUBIC
                )
            )
            for c in range(3)
        ],
        axis=-1,
    )
    np.testing.assert_allclose(ours, refF, atol=2e-3, rtol=1e-4)
    # loose sanity vs PIL's uint8 path (fixed-point + per-pass clamping there)
    ref8 = np.asarray(Image.fromarray(img).resize((448, 448), Image.BICUBIC)).astype(np.float64)
    d = np.abs(np.clip(ours, 0, 255).round() - ref8)
    assert np.percentile(d, 99) <= 3.0 and d.mean() < 0.75


def test_nearest_matches_pil(rng):
    img = rng.integers(0, 6, size=(37, 53)).astype(np.uint8)
    ours = resize_nearest(img, 448, 448)
    ref = np.asarray(Image.fromarray(img).resize((448, 448), Image.NEAREST))
    np.testing.assert_array_equal(ours, ref)
    # upscale AND downscale
    ours2 = resize_nearest(img, 17, 23)
    ref2 = np.asarray(Image.fromarray(img).resize((23, 17), Image.NEAREST))
    np.testing.assert_array_equal(ours2, ref2)


# ---------------------------------------------------------------------------
# tiling math (hand-derived oracles from the reference algorithm)
# ---------------------------------------------------------------------------

def test_supported_aspect_ratios_structure():
    asp = find_supported_aspect_ratios(5)
    assert asp[1.0] == [(2, 2), (1, 1)]
    assert asp[5.0] == [(5, 1)]
    assert asp[0.2] == [(1, 5)]


def test_select_tile_grid_cases():
    # 800x600 @ 448/16: hand-walked through the reference preference rules
    assert select_tile_grid(800, 600, 448, 16) == (4, 3)
    # square image upsamples onto the largest square canvas; (4,4) is chosen
    assert select_tile_grid(448, 448, 448, 16) == (4, 4)
    # max_num_tiles=1 -> thumbnail-style single tile
    assert select_tile_grid(5000, 100, 448, 1) == (1, 1)
    # huge panorama: nothing fits -> closest-ratio fallback, widest grid
    g = select_tile_grid(50000, 500, 448, 16)
    assert g[0] >= 8 and g[1] == 1


def test_image_processor_shapes(rng):
    proc = GARImageProcessor(ImageProcessorConfig(max_num_tiles=4))
    img = (rng.random((600, 800, 3)) * 255).astype(np.uint8)
    vp = np.full((600, 800), 5, np.uint8)
    vp[100:300, 200:500] = 1
    out = proc.preprocess(img, vp)
    ncw, nch = out["aspect_ratio"]
    assert ncw * nch <= 4
    assert out["pixel_values"].shape == (1 + ncw * nch, 3, 448, 448)
    assert out["mask_values"].shape == out["pixel_values"].shape
    assert -1.0 <= out["pixel_values"].min() and out["pixel_values"].max() <= 1.0
    # mask plane round-trips to integer ids after the [-1,1] normalize
    ids = np.round((out["mask_values"] + 1.0) / 2.0 * 255.0)
    assert set(np.unique(ids)).issubset({1.0, 5.0})


# ---------------------------------------------------------------------------
# tokenizer + chat
# ---------------------------------------------------------------------------

def test_synthetic_tokenizer_roundtrip():
    tok = GARTokenizer.synthetic()
    ids = tok.encode("hello <|image|> world <Prompt1> <NO_Prompt>")
    assert tok.image_token_id in ids
    assert 128257 in ids and 128261 in ids
    assert tok.decode(ids) == "hello <|image|> world <Prompt1> <NO_Prompt>"
    assert tok.convert_tokens_to_ids("<Prompt1>") - 128256 == 1
    assert tok.convert_tokens_to_ids("<|reserved_special_token_3|>") == 128005


def test_chat_template_and_label_mask():
    tok = GARTokenizer.synthetic()
    msgs = [
        ChatMessage("user", "<|image|>what is this?"),
        ChatMessage("assistant", "a frog."),
    ]
    ids = np.asarray(
        apply_chat_template(tok, msgs, num_tiles_per_image=[2], tokens_per_tile=4)
    )
    assert ids[0] == 128000
    assert (ids == tok.image_token_id).sum() == 8  # 2 tiles x 4
    labels = mask_labels(ids)
    sup = labels != -100
    assert sup.sum() > 0
    # supervised span decodes to the assistant answer + eot
    sup_ids = ids[sup]
    assert sup_ids[-1] == 128009
    assert tok.decode(sup_ids[:-1].tolist()) == "a frog."
    # nothing from the user turn is supervised
    img_positions = np.nonzero(ids == tok.image_token_id)[0]
    assert not sup[img_positions].any()


def test_generation_prompt_suffix():
    tok = GARTokenizer.synthetic()
    ids = apply_chat_template(
        tok, [ChatMessage("user", "hi")], add_generation_prompt=True
    )
    assert ids[-4:] == [128006, 78191, 128007, 271]


# ---------------------------------------------------------------------------
# prompts / rasterization
# ---------------------------------------------------------------------------

def test_rasterize_first_fill_wins():
    m0 = np.zeros((4, 4), np.uint8)
    m0[0:2] = 1
    m1 = np.zeros((4, 4), np.uint8)
    m1[1:3] = 1
    # dict order 0 then 1: overlap row 1 keeps id 0
    out = rasterize_prompts({0: m0, 1: m1}, 4, 4, prompt_numbers=5)
    assert (out[0] == 0).all() and (out[1] == 0).all()
    assert (out[2] == 1).all()
    assert (out[3] == 5).all()


def test_bbox_from_mask():
    m = np.zeros((10, 20), np.uint8)
    m[2:5, 4:9] = 1
    x1, y1, x2, y2 = bbox_from_mask(m)
    assert (x1, y1) == (4 / 20, 2 / 10)
    assert (x2, y2) == (8 / 20, 4 / 10)  # max index, not +1 (reference conv.)


def test_question_formats():
    q = single_region_question(1, "Describe.", replay_tokens=3)
    assert q.startswith("There are some objects I am curious about: <Prompt1>;")
    assert q.count("<|reserved_special_token_3|>") == 3
    mq, order = multi_region_question("Is <Prompt0> left of <Prompt2>?", replay_tokens=2)
    assert order == [0, 2]
    assert mq.count("<|reserved_special_token_2|>") == 2
    assert mq.count("<|reserved_special_token_4|>") == 2
    assert mq.endswith("Is <Prompt0> left of <Prompt2>?")


# ---------------------------------------------------------------------------
# builder end-to-end into the tiny model
# ---------------------------------------------------------------------------

@pytest.mark.slow  # >15 s on the 1-core CPU lane (round-4 fast-lane budget)
def test_builder_to_model_end_to_end(rng):
    cfg = gar_tiny()
    tok = GARTokenizer.synthetic(cfg.prompt_numbers)
    proc = GARImageProcessor(ImageProcessorConfig(max_num_tiles=cfg.max_num_tiles))

    img = (rng.random((300, 500, 3)) * 255).astype(np.uint8)
    mask = np.zeros((300, 500), np.uint8)
    mask[50:150, 100:300] = 1
    sample = RegionSample(image=img, masks={1: mask})
    batch, plens = build_region_batch(cfg, tok, proc, [sample])

    assert batch.input_ids.shape[0] == 1
    n_img = int((np.asarray(batch.input_ids) == cfg.image_token_id).sum())
    assert n_img == int(batch.num_tiles[0]) * cfg.tokens_per_tile
    assert bool(batch.replay_valid[0, 0])
    run_start = int(batch.replay_pos[0, 0])
    ids = np.asarray(batch.input_ids[0])
    assert (ids[run_start : run_start + 256] == cfg.crop_token_ids[1]).all()

    from grasp_any_region_tpu.models import init_gar_params
    from grasp_any_region_tpu.models.gar import gar_prefill

    params = init_gar_params(jax.random.PRNGKey(0), cfg)
    hidden, _ = gar_prefill(
        params, cfg, batch, mask_compat=True, use_flash=False,
        compute_dtype=np.float32,
    )
    assert np.isfinite(np.asarray(hidden)).all()


def test_multi_region_builder(rng):
    cfg = gar_tiny()
    tok = GARTokenizer.synthetic(cfg.prompt_numbers)
    proc = GARImageProcessor(ImageProcessorConfig(max_num_tiles=cfg.max_num_tiles))
    img = (rng.random((224, 224, 3)) * 255).astype(np.uint8)
    m0 = np.zeros((224, 224), np.uint8); m0[:100, :100] = 1
    m2 = np.zeros((224, 224), np.uint8); m2[120:, 120:] = 1
    sample = RegionSample(
        image=img, masks={0: m0, 2: m2},
        question="What is the relation between <Prompt0> and <Prompt2>?",
    )
    built = build_sample(cfg, tok, proc, sample)
    assert built["bboxes"].shape == (2, 4)
    batch, plens, labels = collate_samples(cfg, [built], with_labels=True)
    assert bool(batch.replay_valid[0, 0]) and bool(batch.replay_valid[0, 1])
    assert labels is not None
