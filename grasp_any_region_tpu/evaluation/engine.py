"""Batched benchmark inference engine.

The reference loops benchmark items one at a time through GARModel.generate
(GAR-Bench/inference.py:117-174). Here items batch into fixed-size groups and
run through the single jitted generate — the TPU decodes B caption streams
per weight pass (the reference enforces batch=1, grasp_any_region.py:270).
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..cli.runtime import GARRuntime
from ..data.builders import RegionSample


class BatchedCaptioner:
    def __init__(self, runtime: GARRuntime, batch_size: int = 8,
                 max_new_tokens: int = 1024):
        self.rt = runtime
        self.batch_size = batch_size
        self.max_new_tokens = max_new_tokens

    def run(self, samples: Sequence[RegionSample]) -> List[str]:
        outs: List[str] = []
        bs = self.batch_size
        t0 = time.time()
        for i in range(0, len(samples), bs):
            chunk = list(samples[i : i + bs])
            pad = 0
            if len(chunk) < bs and len(samples) > bs:
                pad = bs - len(chunk)  # reuse the compiled batch shape
                chunk = chunk + [chunk[-1]] * pad
            texts = self.rt.caption(chunk, max_new_tokens=self.max_new_tokens)
            outs.extend(texts[: len(texts) - pad] if pad else texts)
            done = min(i + bs, len(samples))
            rate = done / (time.time() - t0)
            print(f"[eval] {done}/{len(samples)} ({rate:.2f} items/s)",
                  file=sys.stderr)
        return outs


def write_outputs(path: str, items: List[dict]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(items, f, indent=4, ensure_ascii=False)
    print(f"[eval] wrote {path}", file=sys.stderr)


def load_cache(path: str):
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return None
