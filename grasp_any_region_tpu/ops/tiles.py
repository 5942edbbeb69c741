"""Tile split / merge — pure reshapes (zero-copy under XLA).

Reference semantics:
  split: image_processing_perception_lm_fast.py:254-266  (canvas -> tiles)
  merge: grasp_any_region.py:233-245                     (tiles -> canvas)

Used on both the pixel plane (host preprocessing) and the feature plane
(re-merging per-tile ViT features before RoIAlign feature replay).
"""

from __future__ import annotations

import jax.numpy as jnp


def split_tiles(image: jnp.ndarray, ncw: int, nch: int) -> jnp.ndarray:
    """(B, C, H, W) -> (B, ncw*nch, C, H//nch, W//ncw), row-major tile order."""
    b, c, h, w = image.shape
    th, tw = h // nch, w // ncw
    x = image.reshape(b, c, nch, th, ncw, tw)
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(b, nch * ncw, c, th, tw)


def merge_tiles(tiles: jnp.ndarray, ncw: int, nch: int) -> jnp.ndarray:
    """(B, ncw*nch, C, th, tw) -> (B, C, nch*th, ncw*tw). Inverse of split."""
    b, n, c, th, tw = tiles.shape
    assert n == ncw * nch, f"{ncw * nch} != {n}"
    x = tiles.reshape(b, nch, ncw, c, th, tw)
    x = x.transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(b, c, nch * th, ncw * tw)


def merge_tiles_masked(
    tiles: jnp.ndarray, ncw: jnp.ndarray, nch: jnp.ndarray, max_grid: int
) -> jnp.ndarray:
    """Merge with *traced* grid dims onto a static (max_grid x max_grid) canvas.

    XLA needs static shapes; the tile grid (ncw, nch) is data-dependent
    (aspect-ratio fitting). We place each tile at its (row, col) slot on a
    max_grid canvas via one scatter; unused canvas area is zero and is never
    read because RoI boxes are normalized to the *valid* region by the caller.

    tiles: (B, T, C, th, tw) with T >= ncw*nch; tiles beyond ncw*nch ignored.
    Returns (B, C, max_grid*th, max_grid*tw).
    """
    b, t, c, th, tw = tiles.shape
    idx = jnp.arange(t)
    row = idx // ncw
    col = idx % ncw
    valid = idx < ncw * nch
    # clamp scatter targets of invalid tiles to slot 0, then mask contributions
    row = jnp.where(valid, row, 0)
    col = jnp.where(valid, col, 0)
    canvas = jnp.zeros((b, max_grid, max_grid, c, th, tw), tiles.dtype)
    vals = jnp.where(valid[None, :, None, None, None], tiles, 0)
    canvas = canvas.at[:, row, col].add(vals)
    # (B, gh, gw, C, th, tw) -> (B, C, gh*th, gw*tw)
    canvas = canvas.transpose(0, 3, 1, 4, 2, 5)
    return canvas.reshape(b, c, max_grid * th, max_grid * tw)
