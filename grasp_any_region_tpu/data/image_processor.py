"""Host-side image/mask preprocessing: the "thumb+tile" pipeline.

Behavioral parity with PerceptionLMImageProcessorFast
(image_processing_perception_lm_fast.py):

  * factor-enumerated supported aspect ratios (:95-134)
  * canvas fitting that prefers the largest upsample (:171-225) with
    closest-ratio fallback when nothing fits (:227-252)
  * thumbnail (1 tile) + aspect-fitted tile grid, concatenated (:292-372)
  * fused rescale+normalize with mean = std = 0.5 -> values in [-1, 1]

Unlike the reference's dual-processor hack (one bicubic instance for RGB,
one NEAREST instance for the prompt matrix, GraspAnyRegion_Dataset.py:114-128,
and a processor extension that only ships as HF remote code — SURVEY.md §1),
this is ONE processor whose `preprocess` takes the image and, optionally, the
prompt-id matrix, and returns pixel_values, mask_values, and the aspect
ratio. Output arrays are numpy; padding to the model's static tile bucket
happens in the input builders.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce
from typing import Dict, List, Optional, Tuple

import numpy as np

from .resize import resize_bicubic, resize_nearest


@dataclass(frozen=True)
class ImageProcessorConfig:
    tile_size: int = 448
    max_num_tiles: int = 16  # train configs: 16 (1B) / 8 (8B); class default 36
    image_mean: float = 0.5
    image_std: float = 0.5


def _factors(n: int):
    return set(
        reduce(
            list.__add__,
            ([i, n // i] for i in range(1, int(n ** 0.5) + 1) if n % i == 0),
        )
    )


def find_supported_aspect_ratios(max_num_tiles: int) -> Dict[float, List[Tuple[int, int]]]:
    """All (ncw, nch) grids with ncw*nch <= max_num_tiles, grouped by ratio.

    Iteration order matters for tie-breaking (later wins in canvas fitting),
    mirroring _find_supported_aspect_ratios (:105-134): chunk counts descend.
    """
    asp: Dict[float, List[Tuple[int, int]]] = {}
    for chunks in range(max_num_tiles, 0, -1):
        for x in sorted(_factors(chunks)):
            ratio = (x, chunks // x)
            k = ratio[0] / ratio[1]
            asp.setdefault(k, []).append(ratio)
    return asp


def _fitted_size(img_w: int, img_h: int, target_w: int, target_h: int) -> Tuple[int, int]:
    """Aspect-preserving size inside the canvas (:138-167)."""
    scale = img_w / img_h
    rescale = min(target_w / img_w, target_h / img_h)
    if scale > 1.0:
        new_w = rescale * img_w
        new_h = int(np.floor(new_w / scale))
        new_w = new_w  # float kept like reference's new_w (only h floors)
    else:
        new_h = rescale * img_h
        new_w = int(np.floor(new_h * scale))
        new_h = new_h
    return new_w, new_h


def fit_image_to_canvas(img_w: int, img_h: int, tile_size: int, max_num_tiles: int) -> Optional[Tuple[int, int]]:
    """Pick the grid whose canvas fits the image without downsampling,
    preferring the one that upsamples the constrained edge most (:169-225)."""
    optimal = None
    optimal_wh = None
    scale = img_w / img_h
    arrangements = [
        r for lst in find_supported_aspect_ratios(max_num_tiles).values() for r in lst
    ]
    for n_w, n_h in arrangements:
        cw, ch = n_w * tile_size, n_h * tile_size
        if cw >= img_w and ch >= img_h:
            wh = _fitted_size(img_w, img_h, cw, ch)
            if optimal is None:
                optimal, optimal_wh = (n_w, n_h), wh
            else:
                if (scale < 1.0 and wh[0] >= optimal_wh[0]) or (
                    scale >= 1.0 and wh[1] >= optimal_wh[1]
                ):
                    optimal, optimal_wh = (n_w, n_h), wh
    return optimal


def find_closest_aspect_ratio(img_w: int, img_h: int, max_num_tiles: int) -> Tuple[int, int]:
    """Fallback when the image fits no canvas (:227-252)."""
    target = img_w / img_h
    asp = find_supported_aspect_ratios(max_num_tiles)
    if target >= 1:
        closest = min((k for k in asp if k <= target), key=lambda x: abs(x - target))
        return max(asp[closest], key=lambda r: r[0])
    closest = min((k for k in asp if k > target), key=lambda x: abs(1 / x - 1 / target))
    return max(asp[closest], key=lambda r: r[1])


def select_tile_grid(img_w: int, img_h: int, tile_size: int, max_num_tiles: int) -> Tuple[int, int]:
    if max_num_tiles <= 1:
        return (1, 1)
    grid = fit_image_to_canvas(img_w, img_h, tile_size, max_num_tiles)
    if grid is None:
        grid = find_closest_aspect_ratio(img_w, img_h, max_num_tiles)
    return grid


def _split_tiles_np(img: np.ndarray, ncw: int, nch: int) -> np.ndarray:
    """(H, W, C) canvas -> (nch*ncw, C, th, tw), row-major tiles."""
    h, w, c = img.shape
    th, tw = h // nch, w // ncw
    x = img.reshape(nch, th, ncw, tw, c)
    return x.transpose(0, 2, 4, 1, 3).reshape(nch * ncw, c, th, tw)


class GARImageProcessor:
    """images (+ prompt matrices) -> model-ready arrays."""

    def __init__(self, config: ImageProcessorConfig = ImageProcessorConfig()):
        self.config = config

    def _normalize(self, x: np.ndarray) -> np.ndarray:
        c = self.config
        return ((x / 255.0) - c.image_mean) / c.image_std

    def preprocess(
        self,
        image: np.ndarray,  # (H, W, 3) uint8/float RGB
        visual_prompt: Optional[np.ndarray] = None,  # (H, W) uint8 prompt ids
        max_num_tiles: Optional[int] = None,
    ) -> dict:
        """Returns dict with:
        pixel_values: (1+ncw*nch, 3, T, T) float32 in [-1, 1]
        mask_values:  same shape (NEAREST + same normalize; present if
                      visual_prompt given) — compat with the reference's
                      normalized mask plane (grasp_any_region.py:255-261)
        aspect_ratio: (ncw, nch)
        """
        cfgt = self.config.tile_size
        mnt = max_num_tiles or self.config.max_num_tiles
        img = np.asarray(image)
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        h, w = img.shape[:2]
        was_uint8 = img.dtype == np.uint8

        def _resize(arr, oh, ow):
            out = resize_bicubic(arr, oh, ow)
            if was_uint8:
                # uint8 tensors stay uint8 through torchvision resize
                # (overshoot rounds + clamps); match that quantization
                out = np.clip(np.round(out), 0, 255)
            return out.astype(np.float32)

        # thumbnail: 1-tile grid
        thumb = _resize(img, cfgt, cfgt)
        # tile grid
        ncw, nch = select_tile_grid(w, h, cfgt, mnt)
        canvas = _resize(img, nch * cfgt, ncw * cfgt)
        tiles = _split_tiles_np(canvas, ncw, nch)  # (n, 3, T, T)
        thumb_chw = thumb.transpose(2, 0, 1)[None]
        pixel_values = np.concatenate([thumb_chw, tiles], axis=0)
        pixel_values = self._normalize(pixel_values).astype(np.float32)

        out = {
            "pixel_values": pixel_values,
            "aspect_ratio": (ncw, nch),
            "num_tiles": 1 + ncw * nch,
        }
        if visual_prompt is not None:
            vp = np.asarray(visual_prompt)
            if vp.ndim == 2:
                vp = np.stack([vp] * 3, axis=-1)
            vthumb = resize_nearest(vp, cfgt, cfgt).astype(np.float32)
            vcanvas = resize_nearest(vp, nch * cfgt, ncw * cfgt).astype(np.float32)
            vtiles = _split_tiles_np(vcanvas, ncw, nch)
            mv = np.concatenate([vthumb.transpose(2, 0, 1)[None], vtiles], axis=0)
            out["mask_values"] = self._normalize(mv).astype(np.float32)
        return out
