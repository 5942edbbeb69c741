"""Training dataset: region-caption / multi-region conversation synthesis.

Capability parity with datasets/GraspAnyRegion_Dataset.py:

  * annotation sources: JSON list files or HF `datasets.load_from_disk` dirs
    (:208-223); items carry `image` (path or base64), `conversations`, and
    optionally `mask_rle` (COCO RLE dict or list)
  * random prompt-slot assignment per sample (:300-317)
  * single-region path: one QA turn per mask, 256 crop tokens per question,
    instruction augmentation, 5% "<PromptX> is not in the image" negatives
    (:333-447)
  * multi-region path driven by <PromptK> references already present in the
    conversations (:449-492)
  * prompt-id rasterization (first-fill-wins) + normalized bboxes
  * chat templating + assistant-span label masking (ONE processor — no dual
    bicubic/NEAREST processor equality assert needed, SURVEY.md §1)
  * refetch-on-failure __getitem__ (:723-739)

Output samples feed data.builders.collate_samples(with_labels=True) and then
the jitted train step.
"""

from __future__ import annotations

import base64
import io
import json
import os
import random
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..core.config import GARConfig
from .chat import ChatMessage, apply_chat_template, find_crop_runs
from .image_processor import GARImageProcessor, ImageProcessorConfig
from .prompts import (
    augment_instruction,
    bbox_from_mask,
    rasterize_prompts,
)
from .resize import resize_nearest
from .rle import decode_any
from .tokenizer import GARTokenizer, reserved_special_token

PROMPT_RE_STR = r"<Prompt(\d+)>"


@dataclass
class DatasetConfig:
    annotation_paths: Sequence[str] = ()
    max_length: int = 16384  # configs/gar_1b.py:28
    prompt_augmentation: bool = True
    negative_prob: float = 0.05
    repeat_time: int = 1
    seed: int = 42
    max_refetch: int = 1000


class GraspAnyRegionDataset:
    """Index-addressable training dataset."""

    def __init__(
        self,
        cfg: GARConfig,
        tok: GARTokenizer,
        ds_cfg: DatasetConfig,
        proc: Optional[GARImageProcessor] = None,
    ):
        self.cfg = cfg
        self.tok = tok
        self.ds_cfg = ds_cfg
        self.proc = proc or GARImageProcessor(
            ImageProcessorConfig(max_num_tiles=cfg.max_num_tiles)
        )
        self.sources: List = []
        self.lengths: List[int] = []
        for path in ds_cfg.annotation_paths:
            if path.endswith(".json"):
                with open(path) as f:
                    src = json.load(f)
            else:
                from datasets import load_from_disk

                src = load_from_disk(path)
            self.sources.append(src)
            self.lengths.append(len(src))
        self.total = sum(self.lengths)

    def __len__(self) -> int:
        return self.total * self.ds_cfg.repeat_time

    def modality_lengths(self) -> List[int]:
        """Per-item length proxy for LengthGroupedSampler-style bucketing.

        Improves on the reference (which returns a constant, :199-203): a
        cheap token estimate from the raw conversation text — chars/4 plus
        256 replay tokens per region — so same-step samples really do have
        similar sequence lengths. Falls back to a constant if annotations
        are not inspectable (e.g. lazily-decoded arrow rows erroring)."""
        per_source: List[List[int]] = []
        try:
            for src in self.sources:
                if isinstance(src, list):
                    convs = [a.get("conversations", []) for a in src]
                else:  # HF arrow dataset: one column fetch, no image decode
                    convs = src["conversations"]
                lens = []
                for conv in convs:
                    chars = sum(len(c.get("value", "")) for c in conv)
                    n_regions = max(1, sum(1 for c in conv if c.get("from") == "gpt"))
                    lens.append(chars // 4 + 256 * n_regions)
                per_source.append(lens)
        except Exception:  # noqa: BLE001 — bucketing is best-effort
            return [100] * len(self)
        flat = [l for lens in per_source for l in lens]
        return (flat * self.ds_cfg.repeat_time)[: len(self)]

    def _raw(self, index: int) -> dict:
        index = index % self.total
        for src, n in zip(self.sources, self.lengths):
            if index < n:
                return dict(src[index])
            index -= n
        raise IndexError

    # -- image / mask loading -------------------------------------------------

    @staticmethod
    def _load_image(entry) -> np.ndarray:
        from PIL import Image

        if hasattr(entry, "convert"):
            return np.asarray(entry.convert("RGB"))
        if isinstance(entry, str) and entry.startswith("data:base64,"):
            raw = base64.b64decode(entry[len("data:base64,"):])
            return np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"))
        return np.asarray(Image.open(entry).convert("RGB"))

    # -- conversation synthesis -----------------------------------------------

    def _build_conversation(
        self, ann: dict, image: np.ndarray, rng: random.Random
    ) -> Tuple[List[ChatMessage], Dict[int, np.ndarray]]:
        """Returns (messages, prompt_id -> mask)."""
        import re

        h, w = image.shape[:2]
        captions = [c["value"] for c in ann["conversations"] if c["from"] == "gpt"]

        if ann.get("mask_rle") is not None:
            masks = decode_any(ann["mask_rle"])
        else:
            masks = [np.ones((h, w), np.uint8)] * len(captions)
        masks = [
            m if m.shape == (h, w) else resize_nearest(m, h, w) for m in masks
        ]

        conv_text = "\n".join(c["value"] for c in ann["conversations"])
        referenced = sorted(
            {int(m) for m in re.findall(PROMPT_RE_STR, conv_text)}
        )

        if referenced:
            # multi-region: conversations already reference <PromptK>; prepend
            # the objects preamble + crop runs to the first user turn (:449-492)
            objects_desc = "There are some objects I am curious about: "
            sub_desc = ""
            mask_by_pid: Dict[int, np.ndarray] = {}
            for pid in referenced:
                objects_desc += f"<Prompt{pid}>; "
                sub_desc += f"<Prompt{pid}>: {reserved_special_token(pid) * 256}\n"
                mask_by_pid[pid] = masks[pid]
            msgs: List[ChatMessage] = []
            for i, c in enumerate(ann["conversations"]):
                role = "user" if c["from"] == "human" else "assistant"
                value = c["value"]
                if i == 0:
                    value = objects_desc + "\n" + sub_desc + "\n" + value
                msgs.append(ChatMessage(role, value))
            return msgs, mask_by_pid

        # single-region: assign masks to shuffled prompt slots (:300-317)
        slots = list(range(self.cfg.prompt_numbers))
        rng.shuffle(slots)
        n_sel = min(len(masks), self.cfg.prompt_numbers - 1)
        selected = slots[:n_sel]
        spare = slots[n_sel:]
        np_rng = np.random.default_rng(rng.getrandbits(32))

        def instruction(caption: str) -> str:
            if self.ds_cfg.prompt_augmentation:
                return augment_instruction(np_rng, caption)
            return "Describe this masked region in detail."

        objects_desc = (
            "There are some objects I am curious about: "
            + "; ".join(f"<Prompt{p}>" for p in selected)
            + "; "
        )
        msgs = []
        mask_by_pid = {}
        none_prompt_left = bool(spare)
        for i in range(n_sel):
            pid = selected[i]
            crop = reserved_special_token(pid) * 256
            q = f"<Prompt{pid}>: {crop}{instruction(captions[i])}"
            if i == 0:
                q = objects_desc + "\n" + q
            else:
                if none_prompt_left and rng.random() < self.ds_cfg.negative_prob:
                    neg = spare[0]
                    msgs.append(ChatMessage("user", f"<Prompt{neg}>: {instruction(captions[i])}"))
                    msgs.append(ChatMessage("assistant", f"<Prompt{neg}> is not in the image."))
                    none_prompt_left = False
            msgs.append(ChatMessage("user", q))
            msgs.append(ChatMessage("assistant", captions[i]))
            mask_by_pid[pid] = masks[i]
        return msgs, mask_by_pid

    # -- item assembly ----------------------------------------------------------

    def build_item(self, index: int, rng: Optional[random.Random] = None) -> dict:
        rng = rng or random.Random(self.ds_cfg.seed + index)
        ann = self._raw(index)
        image = self._load_image(ann["image"])
        h, w = image.shape[:2]
        msgs, mask_by_pid = self._build_conversation(ann, image, rng)

        vp = rasterize_prompts(mask_by_pid, h, w, self.cfg.prompt_numbers)
        pre = self.proc.preprocess(image, vp, max_num_tiles=self.cfg.max_num_tiles)
        n_tiles = pre["num_tiles"]

        # image placeholder prepends the first user turn (chat template)
        msgs[0] = ChatMessage(msgs[0].role, self.tok.image_token + msgs[0].content)
        ids = apply_chat_template(
            self.tok, msgs,
            num_tiles_per_image=[n_tiles], tokens_per_tile=self.cfg.tokens_per_tile,
        )
        ids = np.asarray(ids, np.int32)
        if len(ids) > self.ds_cfg.max_length:
            raise ValueError(f"sample {index} length {len(ids)} > max_length")

        runs = find_crop_runs(ids, self.cfg.crop_token_ids)
        bboxes = np.zeros((len(runs), 4), np.float32)
        replay_pos = np.zeros((len(runs),), np.int32)
        for i, (pid, start, length) in enumerate(runs):
            assert length % 256 == 0
            bboxes[i] = bbox_from_mask(mask_by_pid[pid])
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

    def __getitem__(self, index: int) -> dict:
        """Refetch-on-failure like the reference (:723-739), but bounded and
        loud about what failed."""
        rng = random.Random(self.ds_cfg.seed + index)
        last_err: Optional[Exception] = None
        for _ in range(self.ds_cfg.max_refetch):
            try:
                return self.build_item(index, rng)
            except Exception as e:  # noqa: BLE001 — data errors are expected
                last_err = e
                index = rng.randrange(self.total)
        raise RuntimeError(f"exhausted refetch budget; last error: {last_err}")


def length_grouped_indices(
    lengths: Sequence[int], batch_size: int, rng: np.random.Generator
) -> np.ndarray:
    """LengthGroupedSampler capability (configs/gar_1b.py:113-118): shuffle,
    then sort within megabatches so same-step samples have similar lengths."""
    idx = rng.permutation(len(lengths))
    mega = 50 * batch_size
    out = []
    for i in range(0, len(idx), mega):
        chunk = idx[i : i + mega]
        out.append(chunk[np.argsort(np.asarray(lengths)[chunk], kind="stable")])
    return np.concatenate(out)
