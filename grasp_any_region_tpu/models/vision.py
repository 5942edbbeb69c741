"""Perception-Encoder ViT tower, TPU-native.

Capability parity with the reference's timm PE vision tower as driven by the
monkey-patched `forward_features` (modeling_perception_lm.py:177-221):

  patch_embed -> (+ mask_embeds) -> abs pos embed + CLS -> ln_pre ->
  blocks (2D rope, per-block freqs when rope_mixed) -> final norm

TPU-first design choices (not a port):
  * Patchify is a reshape + one big matmul (stride == kernel), not a conv —
    lands directly on the MXU with no im2col lowering.
  * Blocks are scanned (`lax.scan` over stacked per-layer params): one trace/
    compile of a single block regardless of depth, with `jax.checkpoint`
    applied to the scan body for training (replaces timm's
    `checkpoint(blk, ...)`, modeling_perception_lm.py:204-213).
  * All tiles of all images in the batch are one leading dim — the ViT never
    sees "batch" vs "tile", just (T, S, D); tile bookkeeping lives upstream.
  * Attention softmax in fp32; params/activations bf16.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.config import VisionConfig
from ..core.platform import is_tpu
from ..ops.attention import mha
from ..ops.norms import layer_norm
from ..ops.vit_attention import vit_attention, vit_attention_df
from ..ops.rope import (
    apply_rope_2d_tshd,
    axial_rope_angles,
    init_mixed_rope_freqs,
    mixed_rope_angles,
)


def init_vision_params(rng: jax.Array, cfg: VisionConfig, dtype=jnp.float32) -> dict:
    keys = jax.random.split(rng, 8)
    d, m, L = cfg.width, cfg.mlp_hidden, cfg.depth
    p = cfg.patch_size
    s = cfg.seq_len

    def trunc(key, shape, std=0.02):
        return (jax.random.truncated_normal(key, -2, 2, shape, jnp.float32) * std).astype(dtype)

    params = {
        "patch_embed": {
            "kernel": trunc(keys[0], (p * p * 3, d)),
            "bias": jnp.zeros((d,), dtype),
        },
        "ln_pre": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}
        if cfg.use_ln_pre
        else None,
        "ln_post": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}
        if cfg.use_ln_post
        else None,
        "blocks": {
            "ln1_scale": jnp.ones((L, d), dtype),
            "ln1_bias": jnp.zeros((L, d), dtype),
            "wqkv": trunc(keys[1], (L, d, 3 * d)),
            "bqkv": jnp.zeros((L, 3 * d), dtype),
            "wo": trunc(keys[2], (L, d, d)),
            "bo": jnp.zeros((L, d), dtype),
            "ln2_scale": jnp.ones((L, d), dtype),
            "ln2_bias": jnp.zeros((L, d), dtype),
            "fc1": trunc(keys[3], (L, d, m)),
            "b1": jnp.zeros((L, m), dtype),
            "fc2": trunc(keys[4], (L, m, d)),
            "b2": jnp.zeros((L, d), dtype),
        },
    }
    if cfg.init_values is not None:
        params["blocks"]["ls1"] = jnp.full((L, d), cfg.init_values, dtype)
        params["blocks"]["ls2"] = jnp.full((L, d), cfg.init_values, dtype)
    if cfg.class_token:
        params["cls_token"] = trunc(keys[5], (1, 1, d))
    if cfg.use_abs_pos:
        params["pos_embed"] = trunc(keys[6], (s, d))
    if cfg.use_rope and cfg.rope_mixed:
        params["rope_freqs"] = init_mixed_rope_freqs(keys[7], cfg).astype(jnp.float32)
    return params


def patchify(pixel_values: jnp.ndarray, cfg: VisionConfig) -> jnp.ndarray:
    """(T, 3, H, W) -> (T, gh*gw, 3*p*p) patch pixels, row-major patches.

    Channel-major within a patch (c, ph, pw) to match the flattening of a
    torch Conv2d weight (D, C, ph, pw) -> (C*ph*pw, D) so converted
    checkpoints drop in without permutation.
    """
    t, c, h, w = pixel_values.shape
    p = cfg.patch_size
    gh, gw = h // p, w // p
    x = pixel_values.reshape(t, c, gh, p, gw, p)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # (T, gh, gw, c, p, p)
    return x.reshape(t, gh * gw, c * p * p)


def _block(cfg: VisionConfig, x: jnp.ndarray, bp: dict, angles: Optional[jnp.ndarray],
           use_flash: Optional[bool] = None, mesh=None):
    """One transformer block. x: (T, S, D); angles: (H, N, d/2) or None."""
    t, s, d = x.shape
    h = cfg.num_heads
    dh = cfg.head_dim
    n_prefix = 1 if cfg.class_token else 0

    y = layer_norm(x, bp["ln1_scale"], bp["ln1_bias"])
    qkv = y @ bp["wqkv"].astype(y.dtype) + bp["bqkv"].astype(y.dtype)
    qkv = qkv.reshape(t, s, 3, h, dh)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    if angles is not None:
        # rope over patch tokens, CLS passes through (token-major layout —
        # no head-major transpose round trips)
        q = apply_rope_2d_tshd(q, angles, n_prefix)
        k = apply_rope_2d_tshd(k, angles, n_prefix)
    multi = mesh is not None and mesh.size > 1
    on_tpu = is_tpu()
    if use_flash is not False and on_tpu and s <= 2048 and not multi:
        # fused single-pass kernel: whole (S, S) logits block lives in VMEM
        # (custom_vjp wrapper — training differentiates through this path)
        attn = vit_attention_df(q, k, v)
    else:
        # multi-device: mha's shard_map wrapper keeps the Pallas path legal
        # under GSPMD (tiles shard over data/fsdp, heads over tensor)
        attn = mha(q, k, v, causal=False, use_flash=use_flash, mesh=mesh)
    attn = attn.reshape(t, s, d) @ bp["wo"].astype(x.dtype) + bp["bo"].astype(x.dtype)
    if "ls1" in bp:
        attn = attn * bp["ls1"].astype(attn.dtype)
    x = x + attn

    y = layer_norm(x, bp["ln2_scale"], bp["ln2_bias"])
    y = y @ bp["fc1"].astype(y.dtype) + bp["b1"].astype(y.dtype)
    y = jax.nn.gelu(y, approximate=cfg.fast_gelu)
    y = y @ bp["fc2"].astype(y.dtype) + bp["b2"].astype(y.dtype)
    if "ls2" in bp:
        y = y * bp["ls2"].astype(y.dtype)
    return x + y


def vision_embed(
    params: dict,
    cfg: VisionConfig,
    pixel_values: jnp.ndarray,
    mask_embeds: Optional[jnp.ndarray] = None,
    *,
    compute_dtype=jnp.bfloat16,
):
    """Everything before the transformer blocks: patchify + patch embed +
    mask-embed injection + CLS + abs pos + ln_pre, plus the per-layer rope
    angle tables. Split out of vision_forward so the parity harness
    (cli/parity.py) can checksum the patch-embed stage and run block 0 in
    isolation — localizing a real-checkpoint mismatch to a module in
    minutes instead of bisecting the whole tower.

    Returns (x (T, S, D), angles (L, H, N, d/2) or None).
    """
    t = pixel_values.shape[0]
    d = cfg.width

    x = patchify(pixel_values.astype(compute_dtype), cfg)
    x = x @ params["patch_embed"]["kernel"].astype(compute_dtype)
    x = x + params["patch_embed"]["bias"].astype(compute_dtype)
    if mask_embeds is not None:
        x = x + mask_embeds.astype(compute_dtype)
    if cfg.class_token:
        cls = jnp.broadcast_to(params["cls_token"].astype(compute_dtype), (t, 1, d))
        x = jnp.concatenate([cls, x], axis=1)
    if cfg.use_abs_pos:
        x = x + params["pos_embed"].astype(compute_dtype)
    if params.get("ln_pre") is not None:
        x = layer_norm(x, params["ln_pre"]["scale"], params["ln_pre"]["bias"])

    # per-layer rope angles
    if cfg.use_rope:
        if cfg.rope_mixed:
            angles = mixed_rope_angles(params["rope_freqs"], cfg)  # (L, H, N, d/2)
        else:
            ax = axial_rope_angles(cfg)  # (N, d/2)
            angles = jnp.broadcast_to(
                ax[None, None], (cfg.depth, 1, *ax.shape)
            )
    else:
        angles = None
    return x, angles


def vision_forward(
    params: dict,
    cfg: VisionConfig,
    pixel_values: jnp.ndarray,
    mask_embeds: Optional[jnp.ndarray] = None,
    *,
    remat: bool = False,
    remat_group: int = 1,
    compute_dtype=jnp.bfloat16,
    use_flash: Optional[bool] = None,
    fused_blocks: Optional[bool] = None,
    mesh=None,
) -> jnp.ndarray:
    """Run the tower.

    pixel_values: (T, 3, H, W) — T = total tiles (thumbnails + grid tiles,
        across the whole batch).
    mask_embeds: (T, N, D) patch-aligned mask embeddings added right after
        patch embed (injection point mirrors modeling_perception_lm.py:194-196).
    Returns (T, S, D) final hidden states (CLS still included at index 0).

    fused_blocks: run each layer as 4 Pallas kernels (ops/vit_block.py +
    vit_attention_fused_qkv): no separate LN/rope/gelu HBM passes and no
    head-major transposes; LayerScale folds into the residual kernels.
    Inference-only (forward kernels have no VJP; training keeps the XLA
    composition, whose attention has the FA-2 custom_vjp) and requires
    head_dim 64 (128-lane head pairs), an even head count, and rope
    enabled. None = auto: on for TPU when not remat'ing and the shapes
    allow.
    """
    x, angles = vision_embed(
        params, cfg, pixel_values, mask_embeds, compute_dtype=compute_dtype
    )

    blocks = params["blocks"]

    multi = mesh is not None and mesh.size > 1
    if fused_blocks is None:
        fused_blocks = (
            not remat
            and not multi  # fused kernels have no shard_map wrapper yet;
                           # multi-device uses mha's sharded flash path
            and is_tpu()
            and cfg.head_dim == 64
            and cfg.num_heads % 2 == 0
            and cfg.use_rope
        )

    if fused_blocks:
        from ..ops.rope import rope_pair_tables
        from ..ops.vit_attention import vit_attention_fused_qkv
        from ..ops.vit_block import vit_ln_qkv, vit_mlp_residual, vit_wo_residual

        assert cfg.head_dim == 64 and cfg.num_heads % 2 == 0 and cfg.use_rope
        s_true = x.shape[1]
        n_prefix = 1 if cfg.class_token else 0
        pad = (-s_true) % 8
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        s_pad = s_true + pad
        interp = not is_tpu()

        def body(carry, layer):
            bp, ang = layer
            if ang.shape[0] == 1:  # axial rope: one table for all heads
                ang = jnp.broadcast_to(
                    ang, (cfg.num_heads, *ang.shape[1:])
                )
            cos2, sin2 = rope_pair_tables(ang, s_pad, n_prefix)
            qkv = vit_ln_qkv(
                carry, bp["ln1_scale"], bp["ln1_bias"], bp["wqkv"],
                bp["bqkv"], interpret=interp,
            )
            attn = vit_attention_fused_qkv(
                qkv, cos2, sin2, cfg.num_heads, cfg.head_dim,
                kv_valid=s_true, interpret=interp,
            )
            out = vit_wo_residual(attn, carry, bp["wo"], bp["bo"],
                                  bp.get("ls1"), interpret=interp)
            out = vit_mlp_residual(
                out, bp["ln2_scale"], bp["ln2_bias"], bp["fc1"], bp["b1"],
                bp["fc2"], bp["b2"], bp.get("ls2"), fast_gelu=cfg.fast_gelu,
                interpret=interp,
            )
            return out, None

        x, _ = jax.lax.scan(body, x, (blocks, angles))
        if pad:
            x = x[:, :s_true]
        if params.get("ln_post") is not None:
            x = layer_norm(x, params["ln_post"]["scale"], params["ln_post"]["bias"])
        return x

    def body(carry, layer):
        bp, ang = layer
        out = _block(cfg, carry, bp, ang, use_flash, mesh=mesh)
        return out, None

    if angles is not None:
        xs = (blocks, angles)
    else:
        xs = (blocks, jnp.zeros((cfg.depth, 0)))

        def body(carry, layer):  # noqa: F811
            bp, _ = layer
            return _block(cfg, carry, bp, None, use_flash, mesh=mesh), None

    body_fn = jax.checkpoint(body) if remat else body
    if remat and remat_group > 1:
        # nested (grouped) remat: the plain checkpointed scan saves every
        # block's input as a backward residual - depth x (T, S, D), the
        # largest HLO temp of the B=2 train step (1.54 GB of the 74 MB-over
        # OOM, bench.py run_train notes). Scanning GROUPS of g checkpointed
        # blocks under an outer checkpoint keeps only ceil(depth/g) + g
        # boundaries live (the group replay re-saves its inner boundaries
        # transiently) at the cost of one extra tower forward in the
        # backward - the classic sqrt(L) recompute/memory trade.
        g = remat_group
        n_grp, rem_n = divmod(cfg.depth, g)
        tmap = jax.tree_util.tree_map

        def group_body(carry, layer_grp):
            c, _ = jax.lax.scan(body_fn, carry, layer_grp)
            return c, None

        grp_xs = tmap(
            lambda a: a[: n_grp * g].reshape(n_grp, g, *a.shape[1:]), xs
        )
        x, _ = jax.lax.scan(jax.checkpoint(group_body), x, grp_xs)
        if rem_n:
            rem_xs = tmap(lambda a: a[n_grp * g:], xs)
            x, _ = jax.lax.scan(body_fn, x, rem_xs)
    else:
        x, _ = jax.lax.scan(body_fn, x, xs)

    if params.get("ln_post") is not None:
        x = layer_norm(x, params["ln_post"]["scale"], params["ln_post"]["bias"])
    return x
