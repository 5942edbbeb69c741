"""Video container ingestion: file -> uniformly sampled RGB frames.

The reference consumes video through the HF processor stack
(`PerceptionLMProcessor` video path, processing_perception_lm.py:92-198),
whose loader (transformers video_utils) decodes the container and uniformly
samples frames before the per-frame 448x448 bicubic resize. This module is
that loader: cv2.VideoCapture decode + uniform temporal sampling; the
sampled frames feed data/builders.build_video_sample (per-frame tiles +
per-frame crop-token runs, modeling_perception_lm.py:765-852).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def uniform_frame_indices(total: int, num_frames: int) -> List[int]:
    """Uniform temporal sampling (transformers video_utils convention:
    linspace over [0, total-1] rounded to ints; all frames if fewer)."""
    if total <= 0:
        return []
    if total <= num_frames:
        return list(range(total))
    return [int(round(x)) for x in np.linspace(0, total - 1, num_frames)]


def read_video_frames(
    path: str,
    num_frames: int = 32,
) -> Tuple[List[np.ndarray], List[int], float]:
    """Decode a video file -> (frames RGB uint8, frame indices, fps).

    Seeks to each sampled index when the container reports a frame count;
    falls back to a sequential decode for streams without metadata.
    """
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise FileNotFoundError(f"cannot open video: {path}")
    try:
        fps = float(cap.get(cv2.CAP_PROP_FPS) or 0.0)
        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT) or 0)
        if total > 0:
            idx = uniform_frame_indices(total, num_frames)
            frames: List[np.ndarray] = []
            kept: List[int] = []
            for i in idx:
                cap.set(cv2.CAP_PROP_POS_FRAMES, i)
                ok, fr = cap.read()
                if not ok:  # metadata over-reported; stop at the real end
                    break
                frames.append(cv2.cvtColor(fr, cv2.COLOR_BGR2RGB))
                kept.append(i)
            if frames:
                return frames, kept, fps
        # no (reliable) frame count: decode sequentially, then sample
        cap.release()
        cap = cv2.VideoCapture(path)
        all_frames: List[np.ndarray] = []
        while True:
            ok, fr = cap.read()
            if not ok:
                break
            all_frames.append(cv2.cvtColor(fr, cv2.COLOR_BGR2RGB))
        idx = uniform_frame_indices(len(all_frames), num_frames)
        return [all_frames[i] for i in idx], idx, fps
    finally:
        cap.release()
