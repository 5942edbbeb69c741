"""Video path tests: per-frame replay, builder, end-to-end prefill."""

import numpy as np
import pytest
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


def test_read_video_frames_uniform_sampling(tmp_path):
    """Write a tiny mp4 with cv2, read it back through the container loader
    (data/video.py) and check uniform sampling + RGB conversion."""
    cv2 = pytest.importorskip("cv2")
    from grasp_any_region_tpu.data.video import (
        read_video_frames,
        uniform_frame_indices,
    )

    path = str(tmp_path / "clip.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
    for i in range(20):
        # frame index encoded in the blue channel (BGR order in cv2)
        frame = np.full((48, 64, 3), 0, np.uint8)
        frame[..., 0] = i * 10  # blue
        w.write(frame)
    w.release()

    frames, idx, fps = read_video_frames(path, num_frames=5)
    assert len(frames) == 5 and len(idx) == 5
    assert idx == uniform_frame_indices(20, 5) == [0, 5, 10, 14, 19]
    assert abs(fps - 10.0) < 0.5
    for fr, i in zip(frames, idx):
        assert fr.shape == (48, 64, 3)
        # BGR->RGB: encoded value lands in channel 2 (lossy codec: tolerance)
        assert abs(int(fr[0, 0, 2]) - i * 10) <= 12, (i, fr[0, 0])

    # request more frames than exist -> all frames
    frames_all, idx_all, _ = read_video_frames(path, num_frames=50)
    assert len(frames_all) == 20 and idx_all == list(range(20))


def test_uniform_frame_indices_edges():
    from grasp_any_region_tpu.data.video import uniform_frame_indices

    assert uniform_frame_indices(0, 4) == []
    assert uniform_frame_indices(3, 4) == [0, 1, 2]
    assert uniform_frame_indices(4, 4) == [0, 1, 2, 3]
    idx = uniform_frame_indices(100, 8)
    assert idx[0] == 0 and idx[-1] == 99 and len(idx) == 8
    assert idx == sorted(idx)
