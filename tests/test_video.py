"""Video path tests: per-frame replay, builder, end-to-end prefill."""

import numpy as np
import jax
import jax.numpy as jnp

from grasp_any_region_tpu.core.config import gar_tiny
from grasp_any_region_tpu.data.builders import (
    VideoRegionSample,
    build_video_batch,
    build_video_sample,
)
from grasp_any_region_tpu.data.image_processor import GARImageProcessor, ImageProcessorConfig
from grasp_any_region_tpu.data.tokenizer import GARTokenizer
from grasp_any_region_tpu.models import init_gar_params
from grasp_any_region_tpu.models.gar import gar_prefill
from grasp_any_region_tpu.models.replay import roi_align_per_region, roi_align_tiled

CFG = gar_tiny()


def test_roi_per_region_matches_tiled_single_tile(rng):
    """A region sampling its own 16x16 map == roi_align_tiled over a 1x1 grid."""
    side, d = 16, 8
    maps = rng.standard_normal((3, side, side, d)).astype(np.float32)
    boxes = np.array(
        [[1.0, 2.0, 10.0, 12.0], [0.1, 0.1, 15.5, 15.5], [4.0, 4.0, 5.0, 6.0]],
        np.float32,
    )
    got = roi_align_per_region(jnp.asarray(maps), jnp.asarray(boxes))
    for r in range(3):
        ref = roi_align_tiled(
            jnp.asarray(maps[r : r + 1]), jnp.int32(1), jnp.int32(1),
            jnp.asarray(boxes[r : r + 1]),
        )
        np.testing.assert_allclose(np.asarray(got[r]), np.asarray(ref[0]),
                                   rtol=1e-5, atol=1e-6)


def _video_sample(rng, n_frames=3):
    frames = [(rng.random((120, 160, 3)) * 255).astype(np.uint8) for _ in range(n_frames)]
    m0 = np.zeros((120, 160), np.uint8); m0[10:60, 20:80] = 1
    m2 = np.zeros((120, 160), np.uint8); m2[40:100, 60:140] = 1
    return VideoRegionSample(frames=frames, masks={0: m0, 2: m2},
                             question="What is it doing?")


def test_build_video_sample(rng):
    tok = GARTokenizer.synthetic(CFG.prompt_numbers)
    proc = GARImageProcessor(ImageProcessorConfig(max_num_tiles=CFG.max_num_tiles))
    s = build_video_sample(CFG, tok, proc, _video_sample(rng))
    assert s["pixel_values"].shape == (3, 3, 448, 448)
    n_vid = (s["input_ids"] == CFG.video_token_id).sum()
    assert n_vid == 3 * CFG.tokens_per_tile
    assert list(s["replay_tile"]) == [0, 2]
    ids = s["input_ids"]
    for (tile, pos) in zip(s["replay_tile"], s["replay_pos"]):
        assert (ids[pos : pos + 256] == CFG.crop_token_ids[tile]).all()


def test_video_prefill_end_to_end(rng):
    tok = GARTokenizer.synthetic(CFG.prompt_numbers)
    proc = GARImageProcessor(ImageProcessorConfig(max_num_tiles=CFG.max_num_tiles))
    params = init_gar_params(jax.random.PRNGKey(0), CFG)
    batch, plens = build_video_batch(CFG, tok, proc, [_video_sample(rng)])
    assert batch.replay_tile is not None
    hidden, _ = gar_prefill(
        params, CFG, batch, mask_compat=True, use_flash=False,
        compute_dtype=jnp.float32, video_mode=True,
    )
    assert np.isfinite(np.asarray(hidden)).all()
