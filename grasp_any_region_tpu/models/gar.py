"""GAR model assembly, TPU-native.

Puts together (reference: models/grasp_any_region.py forward +
hf_models/modeling_gar.py GARModel):

  1. mask patch embedding — zero-init patchify-matmul over the binarized
     prompt matrix (reference: nn.Conv2d 3->Dv kernel 14 stride 14,
     grasp_any_region.py:78-87; binarize at :255-266)
  2. PE-ViT encode of all tiles with mask embeds injected after patch embed
  3. projector (+2x pool) -> 256 tokens/tile
  4. placeholder scatter of image features into the token embedding sequence
     (reference masked_scatter, grasp_any_region.py:284-289) — here an
     order-preserving gather, fully static
  5. RoI feature replay scatter (models/replay.py)
  6. Llama prefill / decode

Everything below operates on static shapes: tiles are padded to a bucket
(T = 1 + max_num_tiles), regions to R_max; validity masks make padding inert.
The reference enforces batch_size=1 (grasp_any_region.py:270); here batch is
a first-class axis.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import GARConfig
from ..ops.norms import rms_norm
from .llama import (
    KVCache,
    embed_tokens,
    init_llama_params,
    llama_decode_step,
    llama_prefill,
    lm_logits,
)
from .projector import init_projector_params, projector_forward
from .replay import replay_features, scatter_replay
from .vision import init_vision_params, patchify, vision_forward


class GARBatch(NamedTuple):
    """Host-prepared, static-shape model inputs (one or more samples).

    input_ids:    (B, S) int32, right-padded with pad_id
    positions:    (B, S) int32
    segment_ids:  (B, S) int32 — 1 for real tokens, 0 for padding
    pixel_values: (B, T, 3, H, W) — T = 1 (thumbnail) + tile bucket; padded
                  tiles are zeros and their features are never gathered
    mask_values:  (B, T, 3, H, W) — rasterized prompt-id plane through the
                  NEAREST pipeline (normalized to [-1,1], compat mode) or
                  already-binary {0,1} plane (native mode)
    aspect_ratio: (B, 2) int32 [ncw, nch]
    bboxes:       (B, R, 4) fp32 normalized region boxes
    replay_pos:   (B, R) int32 start of each region's 256-crop-token run
    replay_valid: (B, R) bool
    num_tiles:    (B,) int32 — 1 + ncw*nch valid entries of pixel_values
    """

    input_ids: jnp.ndarray
    positions: jnp.ndarray
    segment_ids: jnp.ndarray
    pixel_values: jnp.ndarray
    mask_values: jnp.ndarray
    aspect_ratio: jnp.ndarray
    bboxes: jnp.ndarray
    replay_pos: jnp.ndarray
    replay_valid: jnp.ndarray
    num_tiles: jnp.ndarray
    # video mode only: frame index of each region's crop run (image mode: None)
    replay_tile: Optional[jnp.ndarray] = None


def init_gar_params(rng: jax.Array, cfg: GARConfig, dtype=jnp.float32) -> dict:
    k1, k2, k3 = jax.random.split(rng, 3)
    kh, kw = cfg.mask_patch_kernel
    return {
        "vision": init_vision_params(k1, cfg.vision, dtype),
        "projector": init_projector_params(k2, cfg, dtype),
        "llm": init_llama_params(k3, cfg.text, cfg.padded_vocab_size, dtype),
        # zero-init (reference grasp_any_region.py:86-87); channel-major
        # flattening matches patchify()
        "mask_embed": {
            "kernel": jnp.zeros((kh * kw * cfg.mask_in_channels, cfg.vision.width), dtype)
        },
    }


def decode_mask_values(cfg: GARConfig, mask_values: jnp.ndarray, *, compat: bool = True) -> jnp.ndarray:
    """Recover the binary region-vs-background plane from the mask pipeline.

    compat=True reproduces the reference's round trip through image
    normalization: ids = clamp(round((x+1)/2*255), 0, N); binary = ids != N
    (grasp_any_region.py:255-266). compat=False expects {0,1} input already.
    """
    if not compat:
        return mask_values.astype(jnp.float32)
    n = cfg.prompt_numbers
    ids = jnp.round((mask_values.astype(jnp.float32) + 1.0) / 2.0 * 255.0)
    ids = jnp.clip(ids, 0, n)
    return (ids != n).astype(jnp.float32)


def mask_patch_embed(params: dict, cfg: GARConfig, binary_mask: jnp.ndarray) -> jnp.ndarray:
    """(T, 3, H, W) binary plane -> (T, N_patches, Dv) via zero-init matmul."""
    x = patchify(binary_mask, cfg.vision)  # reuses ViT patch flattening
    return x @ params["mask_embed"]["kernel"].astype(x.dtype)


def encode_images(
    params: dict,
    cfg: GARConfig,
    pixel_values: jnp.ndarray,  # (T, 3, H, W) — tiles of ONE (or flattened) batch
    mask_values: Optional[jnp.ndarray] = None,
    *,
    mask_compat: bool = True,
    remat: bool = False,
    remat_group: int = 1,
    compute_dtype=jnp.bfloat16,
    mesh=None,
) -> jnp.ndarray:
    """-> (T, tokens_per_tile, Dt) projected image features.

    Mirrors get_image_features (modeling_perception_lm.py:239-269): vision
    tower with mask embeds, drop CLS, project + pool.
    """
    mask_embeds = None
    if mask_values is not None:
        binary = decode_mask_values(cfg, mask_values, compat=mask_compat)
        mask_embeds = mask_patch_embed(params, cfg, binary.astype(compute_dtype))
    hidden = vision_forward(
        params["vision"], cfg.vision, pixel_values, mask_embeds,
        remat=remat, remat_group=remat_group, compute_dtype=compute_dtype,
        mesh=mesh,
    )
    if cfg.vision_use_cls_token:
        hidden = hidden[:, 1:, :]
    return projector_forward(params["projector"], cfg, hidden)


def scatter_image_features(
    input_ids: jnp.ndarray,  # (S,)
    token_embeds: jnp.ndarray,  # (S, D)
    image_features: jnp.ndarray,  # (T, tok, D) valid tiles first
    media_token_id,
) -> jnp.ndarray:
    """Order-preserving scatter: j-th media placeholder <- j-th feature row.

    Static-shape equivalent of masked_scatter (grasp_any_region.py:284-289).
    Valid tiles occupy a prefix of image_features, and input_ids contains
    exactly (valid tiles * tok) placeholders, so order alignment is exact.
    media_token_id: int or tuple of ints (image and/or video placeholder).
    """
    t, tok, d = image_features.shape
    flat = image_features.reshape(t * tok, d)
    ids = (media_token_id,) if isinstance(media_token_id, int) else tuple(media_token_id)
    is_img = jnp.zeros(input_ids.shape, bool)
    for mid in ids:
        is_img = is_img | (input_ids == mid)
    idx = jnp.clip(jnp.cumsum(is_img) - 1, 0, t * tok - 1)
    return jnp.where(is_img[:, None], flat[idx].astype(token_embeds.dtype), token_embeds)


def build_prefill_embeds(
    params: dict,
    cfg: GARConfig,
    batch: GARBatch,
    *,
    mask_compat: bool = True,
    double_scale_compat: bool = True,
    remat: bool = False,
    remat_group: int = 1,
    compute_dtype=jnp.bfloat16,
    video_mode: bool = False,
    mesh=None,
) -> jnp.ndarray:
    """Token embeds + media scatter + feature replay -> (B, S, Dt).

    video_mode: pixel_values rows are FRAMES (no thumbnail), placeholders use
    video_token_id, and replay samples each region's own frame
    (batch.replay_tile) instead of the merged tile grid.

    mesh: when given, the tile features are constrained to batch-only
    sharding before the replay gather — the gather's indices are
    data-dependent, and without the explicit constraint GSPMD falls back to
    'involuntary full rematerialization' resharding (observed in
    MULTICHIP_r02.json) when the producer is tensor/seq-sharded.
    """
    b, t = batch.pixel_values.shape[:2]
    pix = batch.pixel_values.reshape((b * t,) + batch.pixel_values.shape[2:])
    msk = batch.mask_values.reshape((b * t,) + batch.mask_values.shape[2:])
    feats = encode_images(
        params, cfg, pix, msk,
        mask_compat=mask_compat, remat=remat, remat_group=remat_group,
        compute_dtype=compute_dtype, mesh=mesh,
    )  # (B*T, tok, Dt)
    feats = feats.reshape(b, t, feats.shape[-2], feats.shape[-1])
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        feats = jax.lax.with_sharding_constraint(
            feats, NamedSharding(mesh, P(("data", "fsdp"), None, None, None))
        )

    tok_embeds = embed_tokens(params["llm"], batch.input_ids, compute_dtype,
                              mesh=mesh)

    media_ids = cfg.video_token_id if video_mode else cfg.image_token_id
    embeds = jax.vmap(
        lambda ids, te, f: scatter_image_features(ids, te, f, media_ids)
    )(batch.input_ids, tok_embeds, feats)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        # The scatter's gather component otherwise inherits the projector's
        # hidden-dim sharding and pays a full-remat reshard downstream.
        embeds = jax.lax.with_sharding_constraint(
            embeds, NamedSharding(mesh, P(("data", "fsdp"), None, None))
        )

    if video_mode:
        from .replay import replay_features_video

        replay = jax.vmap(
            lambda f, fi, bx: replay_features_video(
                cfg, f, fi, bx, double_scale_compat=double_scale_compat
            )
        )(feats, batch.replay_tile, batch.bboxes)
    else:
        replay = jax.vmap(
            lambda f, ar, bx: replay_features(
                cfg, f, ar, bx, double_scale_compat=double_scale_compat
            )
        )(feats, batch.aspect_ratio, batch.bboxes)  # (B, R, 256, Dt)

    return scatter_replay(embeds, replay, batch.replay_pos, batch.replay_valid)


def gar_prefill(
    params: dict,
    cfg: GARConfig,
    batch: GARBatch,
    *,
    mask_compat: bool = True,
    double_scale_compat: bool = True,
    remat: bool = False,
    compute_dtype=jnp.bfloat16,
    use_flash: Optional[bool] = None,
    video_mode: bool = False,
    mesh=None,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Full multimodal prefill. Returns (hidden (B,S,D), (k,v) per layer)).

    mesh: enables multi-chip inference — tensor-parallel weights (GSPMD
    propagates from params sharded per parallel/sharding.py), explicit
    replay-gather constraints, and Ulysses/ring sequence parallelism when
    the mesh has seq > 1 (llama_prefill dispatch). The reference exposes
    TP/PP only on its vLLM judge (serve_judge.sh:6-7); here the GAR model
    itself shards over ICI (BASELINE north star)."""
    embeds = build_prefill_embeds(
        params, cfg, batch,
        mask_compat=mask_compat, double_scale_compat=double_scale_compat,
        remat=remat, compute_dtype=compute_dtype, video_mode=video_mode,
        mesh=mesh,
    )
    return llama_prefill(
        params["llm"], cfg.text, embeds, batch.positions,
        segment_ids=batch.segment_ids, remat=remat, use_flash=use_flash,
        mesh=mesh,
    )


def gar_decode_step(
    params: dict,
    cfg: GARConfig,
    token_ids: jnp.ndarray,  # (B,) current tokens
    cache: KVCache,
    prompt_pad: int,
    *,
    compute_dtype=jnp.bfloat16,
    use_kernel: Optional[bool] = None,
) -> Tuple[jnp.ndarray, KVCache]:
    """One decode step. Returns (logits (B, V), new cache).

    use_kernel=False forces the plain-XLA step — required under a
    multi-chip mesh, where GSPMD partitions the einsum path but cannot
    partition the single-chip Pallas megakernels."""
    embeds = embed_tokens(params["llm"], token_ids[:, None], compute_dtype)
    hidden, cache = llama_decode_step(
        params["llm"], cfg.text, embeds, cache, prompt_pad,
        use_kernel=use_kernel,
    )
    logits = lm_logits(
        params["llm"], cfg.text, hidden[:, 0], valid_vocab=cfg.extended_vocab_size
    )
    return logits, cache


def seed_cache_from_prefill(
    cfg: GARConfig,
    kv: Tuple[jnp.ndarray, jnp.ndarray],
    seq_lens: jnp.ndarray,  # (B,) true prompt lengths
    max_len: int,
    dtype=jnp.bfloat16,
    paired: bool = False,
    quantize_kv: bool = False,
) -> KVCache:
    """Place prefill K/V (L,B,S,K,Dh) into a head-major cache of max_len
    columns. The prompt block occupies columns [0, S) (right-padded rows
    masked by prompt_lens); write_pos starts at S (== prompt_pad).

    paired: pack kv-head PAIRS into the last axis — (L, B, K/2, S, 2*Dh) —
    so the fused decode-attention kernel streams full 128-lane tiles
    (Dh=64 alone wastes half of every (8,128) tile in DMA and VMEM; the
    kernel-isolation probe measured the unpaired slab read at 2.4x its
    bandwidth floor, docs/PERF_NOTES.md round-3). Only the TPU fused
    decode path consumes this layout (ops/decode_attention.py infers it
    from the cache shape).

    quantize_kv (requires paired): store the cache int8 with one static
    f32 scale per (layer, batch, head-pair) — decode attention's HBM
    stream halves again on top of pairing. Scales come from the prefill
    amax with 1.5x headroom so decode-time columns (quantized in-kernel
    with the SAME static scale — no per-step scale updates, which would
    invalidate already-written columns) survive moderate outliers; the
    effective resolution is still ~85 levels over the observed range
    (~0.6% rounding), well inside bf16 attention noise."""
    ks, vs = kv
    L, b, s, kh, dh = ks.shape
    assert max_len >= s
    if paired:
        assert kh % 2 == 0, "head pairing needs an even kv-head count"
        # (L,B,S,K,Dh) -> reshape pairs (contiguous) -> (L,B,K/2,S,2Dh)
        ks = ks.reshape(L, b, s, kh // 2, 2 * dh)
        vs = vs.reshape(L, b, s, kh // 2, 2 * dh)
    pad = ((0, 0), (0, 0), (0, 0), (0, max_len - s), (0, 0))
    k = jnp.pad(ks.astype(dtype).transpose(0, 1, 3, 2, 4), pad)
    v = jnp.pad(vs.astype(dtype).transpose(0, 1, 3, 2, 4), pad)
    k_scale = v_scale = None
    if quantize_kv:
        assert paired, "int8 KV caches require the paired layout"

        def _q(x):  # (L, B, K/2, S', 2Dh) -> int8 + (L, B, K/2, 1, 1) scale
            amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(3, 4),
                           keepdims=True)
            scale = jnp.maximum(amax * 1.5 / 127.0, 1e-8)
            q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
            return q.astype(jnp.int8), scale

        k, k_scale = _q(k)
        v, v_scale = _q(v)
    return KVCache(
        k=k, v=v,
        prompt_lens=seq_lens.astype(jnp.int32),
        write_pos=jnp.asarray(s, jnp.int32),
        k_scale=k_scale, v_scale=v_scale,
    )
