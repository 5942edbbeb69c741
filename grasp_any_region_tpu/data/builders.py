"""Model-input builders: (image, masks, question) -> GARBatch.

Host-side equivalents of evaluation/eval_dataset.py's
SingleRegionCaptionDataset / MultiRegionDataset, producing static-shape
batches (tile bucket + sequence bucket padding) ready for the jitted
prefill/generate functions. Unlike the reference (one sample at a time,
batch_size=1 enforced), any number of samples batch together.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from ..core.config import GARConfig
from ..models.gar import GARBatch
from .chat import ChatMessage, apply_chat_template, find_crop_runs, mask_labels
from .image_processor import GARImageProcessor, ImageProcessorConfig
from .prompts import (
    bbox_from_mask,
    multi_region_question,
    rasterize_prompts,
    single_region_question,
)
from .tokenizer import GARTokenizer

SEQ_BUCKET = 128  # pad prompt length up to a multiple (static-shape reuse)


@dataclass
class VideoRegionSample:
    """Video region QA request (zero-shot video region understanding,
    SURVEY.md §0: per-frame crop tokens reserved_{2+frame_idx},
    modeling_perception_lm.py:765-852).

    frames: list of (H, W, 3) uint8 RGB frames (sampled)
    masks: frame_idx -> (H, W) binary mask of the tracked region in that frame
    question: free-form question about the region
    """

    frames: List[np.ndarray]
    masks: Dict[int, np.ndarray]
    question: str = "Describe this masked region in detail."


@dataclass
class RegionSample:
    """One inference request.

    image: (H, W, 3) uint8 RGB
    masks: prompt_id -> (H, W) binary mask
    question: text containing <PromptK> references (multi-region), or None to
        use the canonical single-region caption question for the single mask.
    instruction: single-region instruction override.
    """

    image: np.ndarray
    masks: Dict[int, np.ndarray]
    question: Optional[str] = None
    instruction: str = "Describe this masked region in detail."


def build_sample(
    cfg: GARConfig,
    tok: GARTokenizer,
    proc: GARImageProcessor,
    sample: RegionSample,
    *,
    reference_bbox_compat: bool = False,
) -> dict:
    """Preprocess one sample into unpadded arrays.

    reference_bbox_compat reproduces the reference multi-region bug where all
    bboxes come from the LAST mask (a stale loop variable,
    eval_dataset.py:243-246) — needed only for bit-exact output parity.
    """
    img = np.asarray(sample.image)
    h, w = img.shape[:2]
    masks = {pid: np.asarray(m) for pid, m in sample.masks.items()}
    for pid, m in masks.items():
        assert m.shape[:2] == (h, w), f"mask {pid} shape {m.shape} != image {(h, w)}"

    if sample.question is None:
        assert len(masks) == 1, "single-region path expects exactly one mask"
        pid = next(iter(masks))
        text = single_region_question(pid, sample.instruction)
        order = [pid]
    else:
        text, order = multi_region_question(sample.question)
        assert set(order) == set(masks), (
            f"question references prompts {order} but masks given for {sorted(masks)}"
        )

    vp = rasterize_prompts(masks, h, w, cfg.prompt_numbers)
    pre = proc.preprocess(img, vp, max_num_tiles=cfg.max_num_tiles)
    n_tiles = pre["num_tiles"]

    msgs = [ChatMessage(role="user", content=tok.image_token + text)]
    ids = apply_chat_template(
        tok, msgs, add_generation_prompt=True,
        num_tiles_per_image=[n_tiles], tokens_per_tile=cfg.tokens_per_tile,
    )
    ids = np.asarray(ids, np.int32)

    runs = find_crop_runs(ids, cfg.crop_token_ids)
    bboxes = np.zeros((len(runs), 4), np.float32)
    replay_pos = np.zeros((len(runs),), np.int32)
    last_pid = max(masks) if masks else 0
    for i, (pid, start, length) in enumerate(runs):
        assert length == cfg.tokens_per_tile == 256, f"crop run {length} != 256"
        src = masks[last_pid] if reference_bbox_compat else masks[pid]
        bboxes[i] = bbox_from_mask(src)
        replay_pos[i] = start

    return {
        "input_ids": ids,
        "pixel_values": pre["pixel_values"],
        "mask_values": pre["mask_values"],
        "aspect_ratio": np.asarray(pre["aspect_ratio"], np.int32),
        "num_tiles": n_tiles,
        "bboxes": bboxes,
        "replay_pos": replay_pos,
    }


def collate_samples(
    cfg: GARConfig,
    samples: Sequence[dict],
    *,
    pad_id: int = 0,
    max_regions: Optional[int] = None,
    seq_bucket: int = SEQ_BUCKET,
    with_labels: bool = False,
    seq_multiple: int = 1,
    pad_to_len: Optional[int] = None,
) -> Tuple[GARBatch, jnp.ndarray, Optional[jnp.ndarray]]:
    """Pad per-sample arrays to the batch's static shapes.

    Returns (GARBatch, prompt_lens, labels or None). Right padding throughout
    (mirrors custom_collect_fn.py:67-87). seq_multiple: additionally pad S to
    a multiple of the sequence-parallel world size (the reference's
    pad_for_sequence_parallel, custom_collect_fn.py:89-94) — required for the
    Ulysses/ring seq-axis exchange. pad_to_len: force the padded length to a
    fixed value — multi-host training needs every process to produce the
    same global shapes regardless of its local samples.
    """
    b = len(samples)
    r_max = max_regions or cfg.prompt_numbers
    t_bucket = max(1 + cfg.max_num_tiles,
                   max(s["pixel_values"].shape[0] for s in samples))
    s_max = max(len(s["input_ids"]) for s in samples)
    s_pad = ((s_max + seq_bucket - 1) // seq_bucket) * seq_bucket
    if seq_multiple > 1 and s_pad % seq_multiple:
        s_pad += seq_multiple - s_pad % seq_multiple
    if pad_to_len is not None:
        assert s_max <= pad_to_len, (
            f"sample length {s_max} exceeds pad_to_len {pad_to_len}"
        )
        assert pad_to_len % max(1, seq_multiple) == 0
        s_pad = pad_to_len
    ts = cfg.tile_size

    input_ids = np.full((b, s_pad), pad_id, np.int32)
    positions = np.zeros((b, s_pad), np.int32)
    segs = np.zeros((b, s_pad), np.int32)
    labels = np.full((b, s_pad), -100, np.int32)
    pix = np.zeros((b, t_bucket, 3, ts, ts), np.float32)
    msk = np.zeros((b, t_bucket, 3, ts, ts), np.float32)
    aspect = np.ones((b, 2), np.int32)
    bboxes = np.zeros((b, r_max, 4), np.float32)
    rpos = np.zeros((b, r_max), np.int32)
    rvalid = np.zeros((b, r_max), bool)
    ntiles = np.zeros((b,), np.int32)
    plens = np.zeros((b,), np.int32)
    has_video = any("replay_tile" in s for s in samples)
    rtile = np.zeros((b, r_max), np.int32)

    for i, s in enumerate(samples):
        n = len(s["input_ids"])
        input_ids[i, :n] = s["input_ids"]
        positions[i, :n] = np.arange(n)
        positions[i, n:] = max(n - 1, 0)
        segs[i, :n] = 1
        if with_labels:
            labels[i, :n] = mask_labels(s["input_ids"])
        t = s["pixel_values"].shape[0]
        pix[i, :t] = s["pixel_values"]
        if s.get("mask_values") is not None:
            msk[i, :t] = s["mask_values"]
        aspect[i] = s["aspect_ratio"]
        r = len(s["replay_pos"])
        assert r <= r_max
        bboxes[i, :r] = s["bboxes"]
        rpos[i, :r] = s["replay_pos"]
        rvalid[i, :r] = True
        if "replay_tile" in s:
            rtile[i, :r] = s["replay_tile"]
        ntiles[i] = s["num_tiles"]
        plens[i] = n

    batch = GARBatch(
        input_ids=jnp.asarray(input_ids),
        positions=jnp.asarray(positions),
        segment_ids=jnp.asarray(segs),
        pixel_values=jnp.asarray(pix),
        mask_values=jnp.asarray(msk),
        aspect_ratio=jnp.asarray(aspect),
        bboxes=jnp.asarray(bboxes),
        replay_pos=jnp.asarray(rpos),
        replay_valid=jnp.asarray(rvalid),
        num_tiles=jnp.asarray(ntiles),
        replay_tile=jnp.asarray(rtile) if has_video else None,
    )
    return batch, jnp.asarray(plens), (jnp.asarray(labels) if with_labels else None)


def build_video_sample(
    cfg: GARConfig,
    tok: GARTokenizer,
    proc: GARImageProcessor,
    sample: VideoRegionSample,
) -> dict:
    """Preprocess one video sample: frames are single 448x448 tiles (no
    thumb+tile), placeholders use <|video|>, one crop run per annotated
    frame."""
    from ..core.config import VIDEO_TOKEN_ID
    from .tokenizer import reserved_special_token

    frames = [np.asarray(f) for f in sample.frames]
    n_frames = len(frames)
    ts = proc.config.tile_size
    pix = []
    for f in frames:
        out = proc.preprocess(f, max_num_tiles=1)
        pix.append(out["pixel_values"][0])  # thumbnail == the single tile
    pixel_values = np.stack(pix)  # (F, 3, T, T)

    # question: one crop run per annotated frame, then the question text
    runs_text = ""
    for fi in sorted(sample.masks):
        assert 0 <= fi < n_frames
        runs_text += (
            f"Frame {fi}: {reserved_special_token(fi) * 256}\n"
        )
    text = runs_text + sample.question

    msgs = [ChatMessage(role="user", content="<|video|>" + text)]
    ids = apply_chat_template(tok, msgs, add_generation_prompt=True)
    # expand the single video placeholder to frames * tokens_per_tile
    ids_np = np.asarray(ids, np.int32)
    vid_pos = int(np.nonzero(ids_np == VIDEO_TOKEN_ID)[0][0])
    expanded = np.concatenate([
        ids_np[:vid_pos],
        np.full(n_frames * cfg.tokens_per_tile, VIDEO_TOKEN_ID, np.int32),
        ids_np[vid_pos + 1:],
    ])

    runs = find_crop_runs(expanded, cfg.crop_token_ids)
    bboxes = np.zeros((len(runs), 4), np.float32)
    replay_pos = np.zeros((len(runs),), np.int32)
    replay_tile = np.zeros((len(runs),), np.int32)
    for i, (pid, start, length) in enumerate(runs):
        assert length == 256
        bboxes[i] = bbox_from_mask(np.asarray(sample.masks[pid]))
        replay_pos[i] = start
        replay_tile[i] = pid  # frame index == crop slot index

    return {
        "input_ids": expanded,
        "pixel_values": pixel_values,
        "mask_values": np.zeros_like(pixel_values),
        "aspect_ratio": np.asarray([1, 1], np.int32),
        "num_tiles": n_frames,
        "bboxes": bboxes,
        "replay_pos": replay_pos,
        "replay_tile": replay_tile,
    }


def build_video_batch(
    cfg: GARConfig,
    tok: GARTokenizer,
    proc: GARImageProcessor,
    samples: Sequence[VideoRegionSample],
    **collate_kw,
) -> Tuple[GARBatch, jnp.ndarray]:
    built = [build_video_sample(cfg, tok, proc, s) for s in samples]
    batch, plens, _ = collate_samples(cfg, built, **collate_kw)
    return batch, plens


def build_region_batch(
    cfg: GARConfig,
    tok: GARTokenizer,
    proc: GARImageProcessor,
    samples: Sequence[RegionSample],
    **collate_kw,
) -> Tuple[GARBatch, jnp.ndarray]:
    built = [build_sample(cfg, tok, proc, s) for s in samples]
    batch, plens, _ = collate_samples(cfg, built, **collate_kw)
    return batch, plens


class PackedTextBatch(NamedTuple):
    """Fixed-shape packed rows for text-only training.

    TPU-native form of the reference's varlen packed path
    (custom_collect_fn.py:28-35, 96-106: batch_size-1 rows, no images,
    cumulative-length args for flash-attn varlen): here many documents share
    each static (B, L) row and a block-diagonal segment mask inside the flash
    kernel replaces the cu_seqlens bookkeeping. Padding has segment id 0;
    documents get 1..K per row; positions restart at 0 per document."""

    input_ids: jnp.ndarray   # (B, L) int32
    positions: jnp.ndarray   # (B, L) int32, reset per document
    segment_ids: jnp.ndarray  # (B, L) int32, 0 = pad
    labels: jnp.ndarray      # (B, L) int32, -100 where unsupervised


def pack_text_batch(
    token_seqs: Sequence[np.ndarray],
    *,
    seq_len: int,
    pad_id: int = 0,
    labels: Optional[Sequence[np.ndarray]] = None,
) -> PackedTextBatch:
    """First-fit-decreasing packing of tokenized conversations into rows of
    length seq_len.

    labels defaults to chat-template supervision (mask_labels per document,
    GraspAnyRegion_Dataset.py:504-530 semantics). Cross-document label leak
    through the 1-token loss shift is impossible because a document's first
    token (<|begin_of_text|>) is never supervised. Sequences longer than
    seq_len are truncated (keeping the head, like the reference's max_length
    crop).
    """
    seqs = [np.asarray(s, np.int32)[:seq_len] for s in token_seqs]
    if labels is None:
        labs = [mask_labels(s) for s in seqs]
    else:
        assert len(labels) == len(seqs)
        labs = [np.asarray(l, np.int32)[:seq_len] for l in labels]
        assert all(len(l) == len(s) for l, s in zip(labs, seqs))

    order = sorted(range(len(seqs)), key=lambda i: len(seqs[i]), reverse=True)
    rows: List[List[int]] = []  # row -> list of seq indices
    space: List[int] = []       # row -> remaining tokens
    for i in order:
        n = len(seqs[i])
        for r, free in enumerate(space):
            if free >= n:
                rows[r].append(i)
                space[r] -= n
                break
        else:
            rows.append([i])
            space.append(seq_len - n)

    b = len(rows)
    ids = np.full((b, seq_len), pad_id, np.int32)
    pos = np.zeros((b, seq_len), np.int32)
    seg = np.zeros((b, seq_len), np.int32)
    lab = np.full((b, seq_len), -100, np.int32)
    for r, members in enumerate(rows):
        off = 0
        for s_no, i in enumerate(members, start=1):
            n = len(seqs[i])
            ids[r, off:off + n] = seqs[i]
            pos[r, off:off + n] = np.arange(n)
            seg[r, off:off + n] = s_no
            lab[r, off:off + n] = labs[i]
            off += n
    return PackedTextBatch(
        input_ids=jnp.asarray(ids),
        positions=jnp.asarray(pos),
        segment_ids=jnp.asarray(seg),
        labels=jnp.asarray(lab),
    )
