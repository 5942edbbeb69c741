"""Synthetic GARBatch builder — used by tests, benchmarks, and dry runs.

Constructs a structurally-valid region-captioning sample without any real
image/tokenizer: image placeholder runs sized to the tile bucket, one
256-crop-token run per region, trailing "assistant" tokens supervised.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from ..core.config import GARConfig
from ..models.gar import GARBatch
from ..train.losses import IGNORE_INDEX


def write_synthetic_annotations(
    path: str,
    *,
    n_items: int = 64,
    image_size: Tuple[int, int] = (448, 336),  # (w, h)
    seed: int = 0,
) -> str:
    """Write a GraspAnyRegionDataset-format annotation JSON of synthetic
    region-captioning items (base64 PNG images + compressed-RLE masks +
    human/gpt conversations) — lets `cli/train.py --data` run end-to-end
    with zero external assets (the reference's Seed-Dataset layout,
    `/root/reference/projects/grasp_any_region/datasets/dataset.py`).

    Mixes the three item styles the dataset supports: per-region caption
    lists, multi-region <PromptK> conversations, and whole-image captions.
    """
    import base64
    import io
    import json

    from PIL import Image

    from .rle import encode_rle

    rng = np.random.default_rng(seed)
    w, h = image_size

    def b64_image():
        img = Image.fromarray((rng.random((h, w, 3)) * 255).astype(np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return "data:base64," + base64.b64encode(buf.getvalue()).decode()

    def rand_masks(n):
        out = []
        for _ in range(n):
            m = np.zeros((h, w), np.uint8)
            x1, y1 = rng.integers(0, w // 2), rng.integers(0, h // 2)
            bw, bh = rng.integers(w // 8, w // 2), rng.integers(h // 8, h // 2)
            m[y1 : min(y1 + bh, h), x1 : min(x1 + bw, w)] = 1
            out.append(
                {k: (v.decode() if isinstance(v, bytes) else v)
                 for k, v in encode_rle(m).items()}
            )
        return out

    nouns = ["box", "region", "patch", "area", "object", "shape"]
    adjs = ["red", "blue", "small", "large", "bright", "dark"]

    def caption():
        return (f"a {rng.choice(adjs)} {rng.choice(nouns)}. "
                f"It is {rng.choice(adjs)}.")

    items = []
    for i in range(n_items):
        style = i % 3
        if style == 0:  # single-region captions (one Q/A pair per mask)
            k = int(rng.integers(1, 3))
            conv = []
            for _ in range(k):
                conv += [{"from": "human", "value": "placeholder"},
                         {"from": "gpt", "value": caption()}]
            items.append({"image": b64_image(), "mask_rle": rand_masks(k),
                          "conversations": conv})
        elif style == 1:  # multi-region relationship conversation
            items.append({
                "image": b64_image(),
                "mask_rle": rand_masks(2),
                "conversations": [
                    {"from": "human",
                     "value": "Is <Prompt0> above <Prompt1>?"},
                    {"from": "gpt",
                     "value": rng.choice(["Yes.", "No."])},
                ],
            })
        else:  # whole-image caption (no masks)
            items.append({
                "image": b64_image(),
                "conversations": [
                    {"from": "human", "value": "placeholder"},
                    {"from": "gpt", "value": caption()},
                ],
            })
    with open(path, "w") as f:
        json.dump(items, f)
    return path


def synthetic_batch(
    cfg: GARConfig,
    *,
    batch: int = 1,
    grid: Tuple[int, int] = (2, 1),  # (ncw, nch)
    regions: int = 1,
    max_regions: Optional[int] = None,
    answer_len: int = 32,
    seed: int = 0,
    seq_pad_to: Optional[int] = None,
) -> Tuple[GARBatch, jnp.ndarray, jnp.ndarray]:
    """Returns (batch, labels, prompt_lens)."""
    rng = np.random.default_rng(seed)
    ncw, nch = grid
    n_tiles = 1 + ncw * nch  # thumbnail + grid
    t_bucket = 1 + cfg.max_num_tiles
    t_bucket = max(t_bucket, n_tiles)
    tok = cfg.tokens_per_tile
    r_max = max_regions or cfg.prompt_numbers
    assert regions <= r_max

    n_img = n_tiles * tok
    run = 256
    prefix = 4  # bos + chat preamble stand-ins
    q_text = 16
    s = prefix + n_img + q_text + regions * (run + 2) + answer_len
    s_pad = seq_pad_to or s
    assert s_pad >= s

    ids = np.full((batch, s_pad), 0, np.int32)
    labels = np.full((batch, s_pad), IGNORE_INDEX, np.int32)
    seg = np.zeros((batch, s_pad), np.int32)
    positions = np.zeros((batch, s_pad), np.int32)
    replay_pos = np.zeros((batch, r_max), np.int32)
    replay_valid = np.zeros((batch, r_max), bool)
    bboxes = np.zeros((batch, r_max, 4), np.float32)

    for b in range(batch):
        cur = 0
        ids[b, cur] = 128000  # <|begin_of_text|>
        cur += 1
        ids[b, cur : cur + prefix - 1] = rng.integers(10, 1000, prefix - 1)
        cur += prefix - 1
        ids[b, cur : cur + n_img] = cfg.image_token_id
        cur += n_img
        ids[b, cur : cur + q_text] = rng.integers(10, 1000, q_text)
        cur += q_text
        for r in range(regions):
            ids[b, cur] = 128256 + r  # <Prompt_r>
            cur += 1
            replay_pos[b, r] = cur
            replay_valid[b, r] = True
            ids[b, cur : cur + run] = cfg.crop_token_ids[r]
            cur += run
            ids[b, cur] = rng.integers(10, 1000)
            cur += 1
            x1, y1 = rng.uniform(0, 0.5, 2)
            x2, y2 = x1 + rng.uniform(0.1, 0.5), y1 + rng.uniform(0.1, 0.5)
            bboxes[b, r] = [x1, y1, min(x2, 1.0), min(y2, 1.0)]
        ans = rng.integers(10, 1000, answer_len)
        ids[b, cur : cur + answer_len] = ans
        labels[b, cur : cur + answer_len] = ans
        cur += answer_len
        seg[b, :cur] = 1
        positions[b, :cur] = np.arange(cur)
        positions[b, cur:] = cur - 1 if cur > 0 else 0

    pix = rng.standard_normal((batch, t_bucket, 3, cfg.tile_size, cfg.tile_size))
    pix = pix.astype(np.float32)
    pix[:, n_tiles:] = 0.0
    msk = np.zeros((batch, t_bucket, 3, cfg.tile_size, cfg.tile_size), np.float32)
    msk[:, :n_tiles, :, 100:300, 100:300] = 1.0

    gb = GARBatch(
        input_ids=jnp.asarray(ids),
        positions=jnp.asarray(positions),
        segment_ids=jnp.asarray(seg),
        pixel_values=jnp.asarray(pix),
        mask_values=jnp.asarray(msk),
        aspect_ratio=jnp.asarray(np.tile(np.array([[ncw, nch]], np.int32), (batch, 1))),
        bboxes=jnp.asarray(bboxes),
        replay_pos=jnp.asarray(replay_pos),
        replay_valid=jnp.asarray(replay_valid),
        num_tiles=jnp.asarray(np.full((batch,), n_tiles, np.int32)),
    )
    prompt_lens = jnp.asarray(np.full((batch,), s, np.int32))
    return gb, jnp.asarray(labels), prompt_lens
