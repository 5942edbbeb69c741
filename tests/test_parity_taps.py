"""Per-block vision checksum taps (cli/parity.py) run on gar_tiny.

VERDICT r4 Next #7: the PE-ViT tower has no external numerical anchor in
this environment (timm is not installable), so `cli/parity.py
--dump-checksums` must let a real-weights mismatch bisect to a single
vision block in one run. These tests pin the tap surface on gar_tiny:
the taps exist at blocks {0, L//2, L-1}, and the tap path (python loop
over `_block`) is numerically the same program as the `lax.scan` inside
`vision_forward` — if they ever diverge, the bisection itself lies.

Reference spec for the tower being checked:
projects/grasp_any_region/models/modeling/modeling_perception_lm.py:177-221
(see docs/VISION_COMPAT.md for the line-by-line dossier).
"""

import jax
import jax.numpy as jnp
import numpy as np

from grasp_any_region_tpu.cli.parity import activation_checksums
from grasp_any_region_tpu.cli.runtime import GARRuntime


def _tiny_runtime():
    return GARRuntime.load(None, "gar_tiny", random_init=True)


def _demo_inputs(rng):
    image = (rng.random((96, 128, 3)) * 255).astype(np.uint8)
    mask = np.zeros((96, 128), np.uint8)
    mask[16:64, 24:100] = 1
    return image, mask


def test_taps_cover_first_mid_last_blocks():
    rt = _tiny_runtime()
    image, mask = _demo_inputs(np.random.default_rng(0))
    taps = activation_checksums(rt, image, mask)
    L = jax.tree_util.tree_leaves(rt.params["vision"]["blocks"])[0].shape[0]
    for i in sorted({0, L // 2, L - 1}):
        key = f"vision_block{i}"
        assert key in taps, sorted(taps)
        assert np.isfinite(taps[key]["abs_sum"]) and taps[key]["abs_sum"] > 0
    for key in ("mask_patch_embed", "vision_patch_embed", "vision_final",
                "projector", "prefill_embeds", "decoder_final"):
        assert key in taps, sorted(taps)


def test_tap_block_loop_matches_scan_forward():
    """The bisection path must BE the production path: replaying the blocks
    one by one (what the taps do) + ln_post must reproduce vision_forward's
    scan output bit-for-close on the same inputs."""
    from grasp_any_region_tpu.data.builders import RegionSample, build_region_batch
    from grasp_any_region_tpu.models.gar import decode_mask_values, mask_patch_embed
    from grasp_any_region_tpu.models.vision import (
        _block, layer_norm, vision_embed, vision_forward,
    )

    rt = _tiny_runtime()
    cfg = rt.cfg
    image, mask = _demo_inputs(np.random.default_rng(1))
    batch, _ = build_region_batch(
        cfg, rt.tok, rt.proc,
        [RegionSample(image=image, masks={1: mask}, instruction="Describe.")],
    )
    b, t = batch.pixel_values.shape[:2]
    pix = jnp.asarray(
        batch.pixel_values.reshape((b * t,) + batch.pixel_values.shape[2:])
    )
    msk = jnp.asarray(
        batch.mask_values.reshape((b * t,) + batch.mask_values.shape[2:])
    )
    binary = decode_mask_values(cfg, msk, compat=True)
    membeds = mask_patch_embed(rt.params, cfg, binary.astype(jnp.bfloat16))
    vp = rt.params["vision"]

    x, angles = vision_embed(vp, cfg.vision, pix, membeds)
    L = jax.tree_util.tree_leaves(vp["blocks"])[0].shape[0]
    for i in range(L):
        bp = jax.tree_util.tree_map(lambda a: a[i], vp["blocks"])
        ang = None if angles is None else angles[i]
        x = _block(cfg.vision, x, bp, ang, use_flash=False)
    if vp.get("ln_post") is not None:
        x = layer_norm(x, vp["ln_post"]["scale"], vp["ln_post"]["bias"])

    ref = vision_forward(vp, cfg.vision, pix, membeds)
    np.testing.assert_allclose(
        np.asarray(x, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,  # bf16 block math
    )
