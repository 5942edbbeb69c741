"""Ferret-Bench refer_desc inference.

Mirrors Ferret-Bench/inference.py: COCO val2017 images + box_refer_caption
annotations whose `annotation.segmentation` is a COCO polygon (or RLE).
Outputs LLaVA-review-style records for the pairwise GPT judge
(eval_gpt.py + summarize_gpt_review.py).
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

import numpy as np

from ..data.builders import RegionSample
from ..data.rle import segmentation_to_mask
from .engine import BatchedCaptioner, write_outputs


def run_ferret(
    captioner: BatchedCaptioner,
    anno_file: str,
    image_folder: str,
    out_path: str,
    limit: Optional[int] = None,
) -> List[dict]:
    from PIL import Image

    with open(anno_file) as f:
        items = json.load(f)
    if limit:
        items = items[:limit]
    samples = []
    for it in items:
        img = np.asarray(
            Image.open(os.path.join(image_folder, it["image"])).convert("RGB")
        )
        h, w = img.shape[:2]
        mask = segmentation_to_mask(it["annotation"]["segmentation"], h, w)
        samples.append(RegionSample(image=img, masks={1: mask}))
    outputs = captioner.run(samples)
    results = [
        {
            "question_id": it["question_id"],
            "image": it["image"],
            "category": it.get("category", "refer_desc"),
            "text": out.replace("<|eot_id|>", "").strip(),
        }
        for it, out in zip(items, outputs)
    ]
    write_outputs(out_path, results)
    return results
