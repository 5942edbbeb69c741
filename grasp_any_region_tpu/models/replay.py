"""RoI-aligned feature replay — the core GAR mechanism, as static-shape XLA.

Reference behavior (grasp_any_region.py:291-379, modeling_gar.py:348-414):
for each region's crop-token run, re-merge the tile-grid vision features into
a full feature map, roi_align a 16x16 crop of the region bbox, and replace
the 256 crop-token embeddings with those features. The reference does this
with a per-region Python loop + per-region torchvision roi_align + a dynamic
`torch.cat` splice; since the crop run length == replay length == 256
(SURVEY.md §0), we do it as:

  * ONE batched RoIAlign over all R regions that samples *directly from the
    tile array* via global->tile coordinate mapping — the merged canvas is
    never materialized (the reference merges a full feature map per region,
    grasp_any_region.py:304-309; a static-shape merge here would need a
    max_tiles x max_tiles canvas, 16x waste). Bilinear neighbors that cross
    tile boundaries are handled exactly because gathers use global integer
    coords.
  * Accumulation over the 2x2 sample grid x 4 bilinear taps (16 weighted
    gathers) keeps peak memory at O(R * 256 * D).
  * ONE scan of `dynamic_update_slice` writes at precomputed positions —
    sequence length is static; no splice.

COMPAT NOTE (checkpoint-faithful by default): the reference scales bboxes to
feature coords (grasp_any_region.py:316-329) and then ALSO passes
spatial_scale=1/28 to torchvision roi_align, which multiplies the boxes by
spatial_scale again. The released checkpoints were trained with this double
scaling; `double_scale_compat=True` reproduces it bit-for-bit,
`False` gives the geometrically-correct crop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..core.config import GARConfig, PIXELS_PER_POOLED_TOKEN, REPLAY_SIDE


def _roi_sample_coords(boxes: jnp.ndarray, pooled: int, sampling_ratio: int):
    """Per-region sample point coordinates, torchvision aligned=True semantics.

    boxes: (R, 4) already in feature coords (post any spatial_scale).
    Returns ys, xs each (R, pooled, sampling_ratio) fp32.
    """
    start_w = boxes[:, 0] - 0.5
    start_h = boxes[:, 1] - 0.5
    bin_w = (boxes[:, 2] - boxes[:, 0]) / pooled
    bin_h = (boxes[:, 3] - boxes[:, 1]) / pooled
    p = jnp.arange(pooled, dtype=jnp.float32)
    frac = (jnp.arange(sampling_ratio, dtype=jnp.float32) + 0.5) / sampling_ratio
    ys = start_h[:, None, None] + (p[None, :, None] + frac[None, None, :]) * bin_h[:, None, None]
    xs = start_w[:, None, None] + (p[None, :, None] + frac[None, None, :]) * bin_w[:, None, None]
    return ys, xs


def roi_align_tiled(
    tiles: jnp.ndarray,  # (T, side, side, D) per-tile feature grids
    ncw: jnp.ndarray,  # () int32 tile columns
    nch: jnp.ndarray,  # () int32 tile rows
    boxes: jnp.ndarray,  # (R, 4) in *feature* coords
    *,
    side: int = REPLAY_SIDE,
    pooled: int = REPLAY_SIDE,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """RoIAlign(aligned=True) sampling straight off the tile array.

    Equivalent to merging tiles row-major into an (nch*side, ncw*side) map
    then torchvision roi_align — verified against ops.roi_align in tests.
    Returns (R, pooled, pooled, D) fp32.
    """
    t, sh, sw, d = tiles.shape
    assert sh == side and sw == side
    r = boxes.shape[0]
    feat_h = (nch * side).astype(jnp.float32)
    feat_w = (ncw * side).astype(jnp.float32)
    flat = tiles.reshape(t * side * side, d).astype(jnp.float32)

    ys, xs = _roi_sample_coords(boxes.astype(jnp.float32), pooled, sampling_ratio)

    out = jnp.zeros((r, pooled, pooled, d), jnp.float32)
    inv_count = 1.0 / (sampling_ratio * sampling_ratio)

    def gather_global(yy: jnp.ndarray, xx: jnp.ndarray) -> jnp.ndarray:
        """Integer global coords (R,pooled,pooled) -> features (R,pooled,pooled,D).
        Out-of-tile-array indices are clamped (weights handle validity)."""
        tile_r = yy // side
        tile_c = xx // side
        tile_idx = tile_r * ncw + tile_c
        local = (yy % side) * side + (xx % side)
        gidx = jnp.clip(tile_idx * (side * side) + local, 0, t * side * side - 1)
        return flat[gidx.reshape(-1)].reshape(r, pooled, pooled, d)

    for iy in range(sampling_ratio):
        for ix in range(sampling_ratio):
            y = ys[:, :, iy][:, :, None]  # (R, pooled, 1)
            x = xs[:, :, ix][:, None, :]  # (R, 1, pooled)
            y = jnp.broadcast_to(y, (r, pooled, pooled))
            x = jnp.broadcast_to(x, (r, pooled, pooled))
            oob = (y < -1.0) | (y > feat_h) | (x < -1.0) | (x > feat_w)
            yc = jnp.maximum(y, 0.0)
            xc = jnp.maximum(x, 0.0)
            y_low = jnp.floor(yc).astype(jnp.int32)
            x_low = jnp.floor(xc).astype(jnp.int32)
            h_i = (nch * side).astype(jnp.int32)
            w_i = (ncw * side).astype(jnp.int32)
            y_clamp = y_low >= h_i - 1
            x_clamp = x_low >= w_i - 1
            y_low = jnp.where(y_clamp, h_i - 1, y_low)
            x_low = jnp.where(x_clamp, w_i - 1, x_low)
            y_high = jnp.where(y_clamp, h_i - 1, y_low + 1)
            x_high = jnp.where(x_clamp, w_i - 1, x_low + 1)
            yc = jnp.where(y_clamp, y_low.astype(yc.dtype), yc)
            xc = jnp.where(x_clamp, x_low.astype(xc.dtype), xc)
            ly = yc - y_low
            lx = xc - x_low
            hy = 1.0 - ly
            hx = 1.0 - lx
            w1 = jnp.where(oob, 0.0, hy * hx) * inv_count
            w2 = jnp.where(oob, 0.0, hy * lx) * inv_count
            w3 = jnp.where(oob, 0.0, ly * hx) * inv_count
            w4 = jnp.where(oob, 0.0, ly * lx) * inv_count
            out = out + w1[..., None] * gather_global(y_low, x_low)
            out = out + w2[..., None] * gather_global(y_low, x_high)
            out = out + w3[..., None] * gather_global(y_high, x_low)
            out = out + w4[..., None] * gather_global(y_high, x_high)
    return out


def roi_align_per_region(
    maps: jnp.ndarray,  # (R, side, side, D) — one feature map per region
    boxes: jnp.ndarray,  # (R, 4) in feature coords
    *,
    pooled: int = REPLAY_SIDE,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """RoIAlign(aligned=True) where each region samples its OWN map (the
    video path: one 16x16 map per frame, modeling_perception_lm.py:776-816).
    Returns (R, pooled, pooled, D) fp32."""
    r, side, _, d = maps.shape
    flat = maps.reshape(r, side * side, d).astype(jnp.float32)
    ys, xs = _roi_sample_coords(boxes.astype(jnp.float32), pooled, sampling_ratio)
    out = jnp.zeros((r, pooled, pooled, d), jnp.float32)
    inv_count = 1.0 / (sampling_ratio * sampling_ratio)
    fdim = jnp.float32(side)
    ridx = jnp.arange(r)[:, None, None]

    def gather(yy, xx):
        idx = jnp.clip(yy * side + xx, 0, side * side - 1)
        return flat[ridx, idx]  # (R, pooled, pooled, D)

    for iy in range(sampling_ratio):
        for ix in range(sampling_ratio):
            y = jnp.broadcast_to(ys[:, :, iy][:, :, None], (r, pooled, pooled))
            x = jnp.broadcast_to(xs[:, :, ix][:, None, :], (r, pooled, pooled))
            oob = (y < -1.0) | (y > fdim) | (x < -1.0) | (x > fdim)
            yc = jnp.maximum(y, 0.0)
            xc = jnp.maximum(x, 0.0)
            y_low = jnp.floor(yc).astype(jnp.int32)
            x_low = jnp.floor(xc).astype(jnp.int32)
            y_clamp = y_low >= side - 1
            x_clamp = x_low >= side - 1
            y_low = jnp.where(y_clamp, side - 1, y_low)
            x_low = jnp.where(x_clamp, side - 1, x_low)
            y_high = jnp.where(y_clamp, side - 1, y_low + 1)
            x_high = jnp.where(x_clamp, side - 1, x_low + 1)
            yc = jnp.where(y_clamp, y_low.astype(yc.dtype), yc)
            xc = jnp.where(x_clamp, x_low.astype(xc.dtype), xc)
            ly = yc - y_low
            lx = xc - x_low
            hy = 1.0 - ly
            hx = 1.0 - lx
            w1 = jnp.where(oob, 0.0, hy * hx) * inv_count
            w2 = jnp.where(oob, 0.0, hy * lx) * inv_count
            w3 = jnp.where(oob, 0.0, ly * hx) * inv_count
            w4 = jnp.where(oob, 0.0, ly * lx) * inv_count
            out = out + w1[..., None] * gather(y_low, x_low)
            out = out + w2[..., None] * gather(y_low, x_high)
            out = out + w3[..., None] * gather(y_high, x_low)
            out = out + w4[..., None] * gather(y_high, x_high)
    return out


def replay_features_video(
    cfg: GARConfig,
    frame_features: jnp.ndarray,  # (F, 256, Dt): one entry per frame
    frame_idx: jnp.ndarray,  # (R,) int32 frame of each region's crop run
    bboxes: jnp.ndarray,  # (R, 4) normalized
    *,
    double_scale_compat: bool = True,
) -> jnp.ndarray:
    """Video feature replay: region r samples frame frame_idx[r]'s 16x16 map
    (modeling_perception_lm.py:765-830; feat is always 16x16, orig = 16*28).
    Returns (R, 256, Dt) fp32."""
    side = REPLAY_SIDE
    f, n, dt = frame_features.shape
    assert n == side * side
    grid = frame_features.reshape(f, side, side, dt)
    maps = grid[jnp.clip(frame_idx, 0, f - 1)]  # (R, side, side, Dt)
    feat = jnp.float32(side)
    boxes_feat = bboxes.astype(jnp.float32) * feat
    if double_scale_compat:
        boxes_feat = boxes_feat / PIXELS_PER_POOLED_TOKEN
    rois = roi_align_per_region(maps, boxes_feat)
    return rois.reshape(-1, side * side, dt)


def replay_features(
    cfg: GARConfig,
    image_features: jnp.ndarray,  # (1+T, 256, Dt): thumbnail + T tiles
    aspect_ratio: jnp.ndarray,  # (2,) int32 [ncw, nch]
    bboxes: jnp.ndarray,  # (R, 4) normalized [x1, y1, x2, y2]
    *,
    double_scale_compat: bool = True,
) -> jnp.ndarray:
    """-> (R, 256, Dt) fp32 replay features for R regions."""
    side = REPLAY_SIDE
    tiles = image_features[1:]  # (T, 256, Dt) — thumbnail excluded
    t, n, dt = tiles.shape
    assert n == side * side
    grid = tiles.reshape(t, side, side, dt)
    ncw = aspect_ratio[0].astype(jnp.int32)
    nch = aspect_ratio[1].astype(jnp.int32)

    feat_w = (ncw * side).astype(jnp.float32)
    feat_h = (nch * side).astype(jnp.float32)
    boxes_feat = jnp.stack(
        [
            bboxes[:, 0] * feat_w,
            bboxes[:, 1] * feat_h,
            bboxes[:, 2] * feat_w,
            bboxes[:, 3] * feat_h,
        ],
        axis=-1,
    )
    if double_scale_compat:
        boxes_feat = boxes_feat / PIXELS_PER_POOLED_TOKEN
    rois = roi_align_tiled(grid, ncw, nch, boxes_feat)  # (R, 16, 16, Dt)
    # row-major flatten matches `permute(0,2,3,1).flatten(1,2)`
    # (grasp_any_region.py:344-349)
    return rois.reshape(-1, side * side, dt)


def scatter_replay(
    inputs_embeds: jnp.ndarray,  # (B, S, Dt)
    replay: jnp.ndarray,  # (B, R, 256, Dt)
    replay_pos: jnp.ndarray,  # (B, R) int32 start index of each crop run
    replay_valid: jnp.ndarray,  # (B, R) bool
) -> jnp.ndarray:
    """Write each region's 256 replay vectors at its crop-token span."""
    r = replay.shape[1]

    def per_sample(embeds, rep, pos, valid):
        def body(e, i):
            upd = lax.dynamic_update_slice(e, rep[i].astype(e.dtype), (pos[i], 0))
            return jnp.where(valid[i], upd, e), None

        out, _ = lax.scan(body, embeds, jnp.arange(r))
        return out

    return jax.vmap(per_sample)(inputs_embeds, replay, replay_pos, replay_valid)
