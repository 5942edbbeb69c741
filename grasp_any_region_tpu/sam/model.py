"""Segment-Anything (SAM) in JAX: points/box -> mask front-end.

The reference calls HF `facebook/sam-vit-huge` as a preprocessing service
(demo/gar_with_sam.py:45-68, gradio/app.py:61-105, plus a browser-side ONNX
decoder). Here SAM is part of the framework: a functional JAX implementation
of the three SAM stages, built from the published architecture:

  * ImageEncoderViT — 1024x1024/16 ViT with windowed attention (window 14)
    and decomposed relative position embeddings; global attention at a few
    blocks; 1x1+3x3 conv neck to 256-d embeddings (64x64)
  * PromptEncoder — random-Fourier positional encoding of points/boxes,
    learned type embeddings
  * MaskDecoder — two-way transformer (tokens<->image cross attention),
    IoU head, hypernetwork mask heads, 4x upscaling

Weights load from an HF SamModel safetensors export via sam/weights.py.
Like the rest of the framework, layers are stacked and scanned where uniform
(the encoder blocks alternate window/global attention so blocks stay
unstacked here — SAM runs once per image, not per token).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.norms import layer_norm


@dataclass(frozen=True)
class SAMConfig:
    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 768  # vit-b (vit-l: 1024, vit-h: 1280)
    depth: int = 12  # vit-l: 24, vit-h: 32
    num_heads: int = 12  # vit-l/h: 16
    window_size: int = 14
    global_attn_indexes: Tuple[int, ...] = (2, 5, 8, 11)
    # vit-l: (5, 11, 17, 23); vit-h: (7, 15, 23, 31)
    out_chans: int = 256
    decoder_depth: int = 2
    decoder_heads: int = 8
    decoder_mlp_dim: int = 2048
    num_multimask_outputs: int = 3

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size  # 64


def sam_vit_b() -> SAMConfig:
    return SAMConfig()


def sam_vit_l() -> SAMConfig:
    return SAMConfig(embed_dim=1024, depth=24, num_heads=16,
                     global_attn_indexes=(5, 11, 17, 23))


def sam_vit_h() -> SAMConfig:
    return SAMConfig(embed_dim=1280, depth=32, num_heads=16,
                     global_attn_indexes=(7, 15, 23, 31))


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init_sam_params(rng: jax.Array, cfg: SAMConfig, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(rng, 64 + 8 * cfg.depth))

    def nrm(shape, std=0.02):
        return (jax.random.normal(next(keys), shape, jnp.float32) * std).astype(dtype)

    d = cfg.embed_dim
    g = cfg.grid
    dh = d // cfg.num_heads

    def block(window: bool):
        size = cfg.window_size if window else g
        return {
            "ln1": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
            "wqkv": nrm((d, 3 * d)),
            "bqkv": jnp.zeros((3 * d,), dtype),
            "wo": nrm((d, d)),
            "bo": jnp.zeros((d,), dtype),
            "rel_h": nrm((2 * size - 1, dh)),
            "rel_w": nrm((2 * size - 1, dh)),
            "ln2": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
            "fc1": nrm((d, 4 * d)),
            "b1": jnp.zeros((4 * d,), dtype),
            "fc2": nrm((4 * d, d)),
            "b2": jnp.zeros((d,), dtype),
        }

    c = cfg.out_chans
    enc = {
        "patch_embed": {"kernel": nrm((cfg.patch_size * cfg.patch_size * 3, d)),
                        "bias": jnp.zeros((d,), dtype)},
        "pos_embed": nrm((g, g, d)),
        "blocks": [block(i not in cfg.global_attn_indexes) for i in range(cfg.depth)],
        "neck": {
            "conv1": nrm((d, c)),  # 1x1
            "ln1": {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)},
            "conv2": nrm((3 * 3 * c, c)),  # 3x3, pad 1
            "ln2": {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)},
        },
    }

    pe = {
        "pe_gaussian": nrm((2, c // 2), std=1.0),
        "point_embeds": nrm((4, c)),  # neg, pos, box tl, box br
        "not_a_point": nrm((1, c)),
        "no_mask": nrm((1, c)),
    }

    def attn(dim_kv=None):
        dkv = dim_kv or c
        return {
            "wq": nrm((c, c)), "bq": jnp.zeros((c,), dtype),
            "wk": nrm((c, c)), "bk": jnp.zeros((c,), dtype),
            "wv": nrm((c, c)), "bv": jnp.zeros((c,), dtype),
            "wo": nrm((c, c)), "bo": jnp.zeros((c,), dtype),
        }

    def ln():
        return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}

    def twoway_block():
        return {
            "self_attn": attn(),
            "ln1": ln(),
            "cross_t2i": attn(),
            "ln2": ln(),
            "mlp_fc1": nrm((c, cfg.decoder_mlp_dim)),
            "mlp_b1": jnp.zeros((cfg.decoder_mlp_dim,), dtype),
            "mlp_fc2": nrm((cfg.decoder_mlp_dim, c)),
            "mlp_b2": jnp.zeros((c,), dtype),
            "ln3": ln(),
            "cross_i2t": attn(),
            "ln4": ln(),
        }

    nm = cfg.num_multimask_outputs + 1
    dec = {
        "iou_token": nrm((1, c)),
        "mask_tokens": nrm((nm, c)),
        "blocks": [twoway_block() for _ in range(cfg.decoder_depth)],
        "final_t2i": attn(),
        "ln_final": ln(),
        "upscale1": nrm((c, c // 4, 2, 2)),  # conv-transpose 2x
        "up_ln": {"scale": jnp.ones((c // 4,), dtype), "bias": jnp.zeros((c // 4,), dtype)},
        "upscale2": nrm((c // 4, c // 8, 2, 2)),
        "hyper_mlps": [
            {
                "fc1": nrm((c, c)), "b1": jnp.zeros((c,), dtype),
                "fc2": nrm((c, c)), "b2": jnp.zeros((c,), dtype),
                "fc3": nrm((c, c // 8)), "b3": jnp.zeros((c // 8,), dtype),
            }
            for _ in range(nm)
        ],
        "iou_mlp": {
            "fc1": nrm((c, c)), "b1": jnp.zeros((c,), dtype),
            "fc2": nrm((c, c)), "b2": jnp.zeros((c,), dtype),
            "fc3": nrm((c, nm)), "b3": jnp.zeros((nm,), dtype),
        },
    }
    return {"encoder": enc, "prompt": pe, "decoder": dec}


# ---------------------------------------------------------------------------
# image encoder
# ---------------------------------------------------------------------------

def _rel_pos_bias(rel: jnp.ndarray, size: int) -> jnp.ndarray:
    """(2*size-1, dh) table -> (size, size, dh) per (q, k) offset."""
    q = jnp.arange(size)[:, None]
    k = jnp.arange(size)[None, :]
    idx = q - k + (size - 1)
    return rel[idx]  # (size, size, dh)


def _windowed_attn(x: jnp.ndarray, bp: dict, heads: int) -> jnp.ndarray:
    """x: (B, H, W, D) already window-partitioned to (B*nw, ws, ws, D)."""
    b, hh, ww, d = x.shape
    dh = d // heads
    qkv = x.reshape(b, hh * ww, d) @ bp["wqkv"] + bp["bqkv"]
    qkv = qkv.reshape(b, hh * ww, 3, heads, dh).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]  # (B, heads, N, dh)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * (dh ** -0.5), k,
                        preferred_element_type=jnp.float32)
    # decomposed relative position (SAM add_decomposed_rel_pos)
    rh = _rel_pos_bias(bp["rel_h"], hh)  # (hh, hh, dh)
    rw = _rel_pos_bias(bp["rel_w"], ww)
    qr = q.reshape(b, heads, hh, ww, dh)
    bias_h = jnp.einsum("bhywd,ykd->bhywk", qr, rh.astype(qr.dtype))  # (B,hd,hh,ww,hh)
    bias_w = jnp.einsum("bhywd,wkd->bhywk", qr, rw.astype(qr.dtype))  # (B,hd,hh,ww,ww)
    bias = bias_h[..., :, None] + bias_w[..., None, :]  # (B,hd,hh,ww,hh,ww)
    logits = logits + bias.reshape(b, heads, hh * ww, hh * ww)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)
    out = out.transpose(0, 2, 1, 3).reshape(b, hh * ww, d)
    out = out @ bp["wo"] + bp["bo"]
    return out.reshape(b, hh, ww, d)


def _window_partition(x: jnp.ndarray, ws: int):
    b, h, w, d = x.shape
    ph = (ws - h % ws) % ws
    pw = (ws - w % ws) % ws
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, d)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, d)
    return x, (hp, wp)


def _window_unpartition(x: jnp.ndarray, ws: int, padded, orig):
    hp, wp = padded
    h, w = orig
    b = x.shape[0] // ((hp // ws) * (wp // ws))
    x = x.reshape(b, hp // ws, wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def encode_image(params: dict, cfg: SAMConfig, pixels: jnp.ndarray) -> jnp.ndarray:
    """pixels (B, 3, 1024, 1024), SAM-normalized -> (B, 256, 64, 64)."""
    b = pixels.shape[0]
    p = cfg.patch_size
    g = cfg.grid
    x = pixels.reshape(b, 3, g, p, g, p).transpose(0, 2, 4, 1, 3, 5)
    x = x.reshape(b, g, g, 3 * p * p)
    enc = params["encoder"]
    x = x @ enc["patch_embed"]["kernel"] + enc["patch_embed"]["bias"]
    x = x + enc["pos_embed"]

    for i, bp in enumerate(enc["blocks"]):
        shortcut = x
        y = layer_norm(x, bp["ln1"]["scale"], bp["ln1"]["bias"])
        if i in cfg.global_attn_indexes:
            y = _windowed_attn(y, bp, cfg.num_heads)
        else:
            yw, padded = _window_partition(y, cfg.window_size)
            yw = _windowed_attn(yw, bp, cfg.num_heads)
            y = _window_unpartition(yw, cfg.window_size, padded, (g, g))
        x = shortcut + y
        y = layer_norm(x, bp["ln2"]["scale"], bp["ln2"]["bias"])
        y = jax.nn.gelu(y @ bp["fc1"] + bp["b1"], approximate=False)
        x = x + (y @ bp["fc2"] + bp["b2"])

    neck = enc["neck"]
    x = x @ neck["conv1"]
    x = layer_norm(x, neck["ln1"]["scale"], neck["ln1"]["bias"])
    # 3x3 conv via lax.conv on NHWC
    w2 = neck["conv2"].reshape(3, 3, x.shape[-1], -1)
    x = jax.lax.conv_general_dilated(
        x, w2, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    x = layer_norm(x, neck["ln2"]["scale"], neck["ln2"]["bias"])
    return x.transpose(0, 3, 1, 2)  # (B, 256, 64, 64)


# ---------------------------------------------------------------------------
# prompt encoder
# ---------------------------------------------------------------------------

def _fourier_pe(params: dict, coords: jnp.ndarray) -> jnp.ndarray:
    """coords in [0,1]^2 (..., 2) -> (..., 256) random Fourier features."""
    x = (2.0 * coords - 1.0) @ params["prompt"]["pe_gaussian"]  # (..., 128)
    x = 2 * jnp.pi * x
    return jnp.concatenate([jnp.sin(x), jnp.cos(x)], axis=-1)


def encode_points(
    params: dict,
    points: jnp.ndarray,  # (B, N, 2) in [0,1] image coords
    labels: jnp.ndarray,  # (B, N) 1=fg, 0=bg, -1=pad, 2/3=box corners
) -> jnp.ndarray:
    pe = _fourier_pe(params, points)
    pp = params["prompt"]
    emb = jnp.where(
        (labels == -1)[..., None], pp["not_a_point"][0] + jnp.zeros_like(pe),
        pe
        + jnp.where((labels == 0)[..., None], pp["point_embeds"][0], 0.0)
        + jnp.where((labels == 1)[..., None], pp["point_embeds"][1], 0.0)
        + jnp.where((labels == 2)[..., None], pp["point_embeds"][2], 0.0)
        + jnp.where((labels == 3)[..., None], pp["point_embeds"][3], 0.0),
    )
    return emb  # (B, N, 256)


def image_pe(params: dict, cfg: SAMConfig) -> jnp.ndarray:
    g = cfg.grid
    ys = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
    xs = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    return _fourier_pe(params, jnp.stack([xx, yy], -1))  # (g, g, 256)


# ---------------------------------------------------------------------------
# mask decoder (two-way transformer)
# ---------------------------------------------------------------------------

def _attn(ap: dict, q, k, v, heads: int):
    b, nq, c = q.shape
    dh = c // heads
    qq = (q @ ap["wq"] + ap["bq"]).reshape(b, nq, heads, dh).transpose(0, 2, 1, 3)
    kk = (k @ ap["wk"] + ap["bk"]).reshape(b, -1, heads, dh).transpose(0, 2, 1, 3)
    vv = (v @ ap["wv"] + ap["bv"]).reshape(b, -1, heads, dh).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qq * (dh ** -0.5), kk,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(vv.dtype), vv)
    out = out.transpose(0, 2, 1, 3).reshape(b, nq, c)
    return out @ ap["wo"] + ap["bo"]


def decode_masks(
    params: dict,
    cfg: SAMConfig,
    image_embed: jnp.ndarray,  # (B, 256, 64, 64)
    sparse_prompt: jnp.ndarray,  # (B, N, 256)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (masks (B, 4, 256, 256) logits, iou (B, 4))."""
    dec = params["decoder"]
    b = image_embed.shape[0]
    c = cfg.out_chans
    g = cfg.grid
    heads = cfg.decoder_heads

    tokens = jnp.concatenate([dec["iou_token"], dec["mask_tokens"]], axis=0)
    nm = tokens.shape[0]
    tokens = jnp.broadcast_to(tokens[None], (b, nm, c))
    tokens = jnp.concatenate([tokens, sparse_prompt], axis=1)  # (B, nm+N, C)

    src = image_embed.reshape(b, c, g * g).transpose(0, 2, 1)  # (B, g*g, C)
    # dense prompt (no mask): no_mask embed added everywhere
    src = src + params["prompt"]["no_mask"][0]
    pos = image_pe(params, cfg).reshape(1, g * g, c)

    q = tokens
    for bp in dec["blocks"]:
        q = q + _attn(bp["self_attn"], q, q, q, heads)
        q = layer_norm(q, bp["ln1"]["scale"], bp["ln1"]["bias"])
        q = q + _attn(bp["cross_t2i"], q, src + pos, src, heads)
        q = layer_norm(q, bp["ln2"]["scale"], bp["ln2"]["bias"])
        m = jax.nn.relu(q @ bp["mlp_fc1"] + bp["mlp_b1"])
        q = q + (m @ bp["mlp_fc2"] + bp["mlp_b2"])
        q = layer_norm(q, bp["ln3"]["scale"], bp["ln3"]["bias"])
        src = src + _attn(bp["cross_i2t"], src + pos, q, q, heads)
        src = layer_norm(src, bp["ln4"]["scale"], bp["ln4"]["bias"])

    q = q + _attn(dec["final_t2i"], q, src + pos, src, heads)
    q = layer_norm(q, dec["ln_final"]["scale"], dec["ln_final"]["bias"])

    iou_tok = q[:, 0]
    mask_toks = q[:, 1 : 1 + cfg.num_multimask_outputs + 1]  # (B, 4, C)

    # upscale image features 4x: two stride-2 transposed convs
    feat = src.transpose(0, 2, 1).reshape(b, c, g, g)
    feat = feat.transpose(0, 2, 3, 1)  # NHWC
    feat = jax.lax.conv_transpose(
        feat, dec["upscale1"].transpose(2, 3, 0, 1), (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    feat = layer_norm(feat, dec["up_ln"]["scale"], dec["up_ln"]["bias"])
    feat = jax.nn.gelu(feat, approximate=False)
    feat = jax.lax.conv_transpose(
        feat, dec["upscale2"].transpose(2, 3, 0, 1), (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    feat = jax.nn.gelu(feat, approximate=False)  # (B, 256, 256, c//8)

    hyper = []
    for i, mp in enumerate(dec["hyper_mlps"]):
        t = mask_toks[:, i]
        t = jax.nn.relu(t @ mp["fc1"] + mp["b1"])
        t = jax.nn.relu(t @ mp["fc2"] + mp["b2"])
        hyper.append(t @ mp["fc3"] + mp["b3"])
    hyper = jnp.stack(hyper, axis=1)  # (B, 4, c//8)
    masks = jnp.einsum("bnc,bhwc->bnhw", hyper, feat)

    im = dec["iou_mlp"]
    t = jax.nn.relu(iou_tok @ im["fc1"] + im["b1"])
    t = jax.nn.relu(t @ im["fc2"] + im["b2"])
    iou = t @ im["fc3"] + im["b3"]
    return masks, iou


def predict_mask(
    params: dict,
    cfg: SAMConfig,
    pixels: jnp.ndarray,  # (1, 3, 1024, 1024) SAM-normalized
    points: jnp.ndarray,  # (1, N, 2) in [0,1]
    labels: jnp.ndarray,  # (1, N)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full pipeline -> (best mask logits (1, 256, 256), best iou ())."""
    emb = encode_image(params, cfg, pixels)
    sparse = encode_points(params, points, labels)
    masks, iou = decode_masks(params, cfg, emb, sparse)
    # best of the multimask outputs (demo picks argmax IoU,
    # gar_with_sam.py:45-68); skip index 0 (the single-mask output)
    best = jnp.argmax(iou[:, 1:], axis=-1) + 1
    bidx = jnp.arange(masks.shape[0])
    return masks[bidx, best], iou[bidx, best]
