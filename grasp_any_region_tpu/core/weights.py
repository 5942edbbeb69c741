"""Checkpoint IO: native safetensors format + HF/torch name conversion.

Native format: `config.json` (core.config dict) + `model.safetensors` with
'/'-joined pytree paths, per-layer weights pre-stacked (L, ...).

`convert_hf_state_dict` maps the reference's exported GAR checkpoint
(hf_models/modeling_gar.py GARModel.save_pretrained: torch names like
`mllm.model.language_model.layers.0.self_attn.q_proj.weight`) and bare
Perception-LM checkpoints onto our pytree:

  * torch Linear stores (out, in); our matmuls use (in, out) -> transpose
  * per-layer tensors stack into a leading (L, ...) axis (scan layout)
  * ViT patch conv (D, C, p, p) flattens channel-major to (C*p*p, D),
    matching models/vision.patchify
  * embedding rows pad up to cfg.padded_vocab_size

Replaces tools/convert_to_hf.py + xtuner guess_load_checkpoint for the
inference direction; train/export.py provides the reverse (our -> HF).
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, Optional, Tuple

import numpy as np

from .config import GARConfig, from_hf_config, gar_config_from_dict, to_dict


# ---------------------------------------------------------------------------
# native format
# ---------------------------------------------------------------------------

def flatten_params(params, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(params, dict):
        for k, v in params.items():
            if v is None:
                continue
            out.update(flatten_params(v, f"{prefix}{k}/"))
        return out
    out[prefix[:-1]] = np.asarray(params)
    return out


def unflatten_params(flat: Dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


def save_checkpoint(path: str, cfg: GARConfig, params) -> None:
    from safetensors.numpy import save_file
    import jax

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump({"gar_tpu_config": to_dict(cfg)}, f, indent=2)
    host = jax.tree_util.tree_map(lambda x: np.asarray(x), params)
    flat = flatten_params(host)
    # safetensors has no bf16 numpy dtype pre-2.0 in some versions; store raw
    save_file(_to_savable(flat), os.path.join(path, "model.safetensors"))


def _to_savable(flat: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in flat.items():
        if v.dtype == np.dtype("bfloat16") if hasattr(np, "bfloat16") else False:
            v = v.astype(np.float32)
        if str(v.dtype) == "bfloat16":
            v = v.astype(np.float32)
        out[k] = v
    return out


def load_checkpoint(path: str, dtype=None) -> Tuple[GARConfig, dict]:
    """Load a checkpoint directory (native or HF-exported)."""
    from safetensors.numpy import load_file

    cfg_path = os.path.join(path, "config.json")
    with open(cfg_path) as f:
        raw = json.load(f)

    files = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".safetensors")
    )
    tensors: Dict[str, np.ndarray] = {}
    for f in files:
        tensors.update(load_file(f))

    if "gar_tpu_config" in raw:
        cfg = gar_config_from_dict(raw["gar_tpu_config"])
        params = unflatten_params(tensors)
    else:
        cfg = from_hf_config(raw)
        params = convert_hf_state_dict(cfg, tensors)
    if dtype is not None:
        import jax

        params = jax.tree_util.tree_map(
            lambda x: x.astype(dtype) if np.issubdtype(x.dtype, np.floating) else x,
            params,
        )
    return cfg, params


# ---------------------------------------------------------------------------
# HF/torch -> native conversion
# ---------------------------------------------------------------------------

def _strip_prefixes(name: str) -> str:
    """Normalize the various wrapper prefixes across GAR export / PLM /
    train-time state dicts."""
    for p in (
        "mllm.model.",
        "mllm.",
        "model.model.",
        "model.",
    ):
        if name.startswith(p):
            name = name[len(p):]
    return name


def convert_hf_llama(
    text_cfg,
    tensors: Dict[str, np.ndarray],
    vocab_rows: Optional[int] = None,
    already_stripped: bool = False,
) -> Optional[dict]:
    """Map an HF Llama(-3) decoder state dict onto our scanned-layer pytree.

    Works standalone on a bare `LlamaForCausalLM.save_pretrained` dict
    (names like `model.layers.0.self_attn.q_proj.weight`) as well as inside
    a GAR/PLM export (names prefixed `language_model.`). Returns None when
    no decoder weights are present. Validated against the installed
    transformers stack in tests/test_hf_parity.py."""
    L = text_cfg.num_layers
    t = tensors if already_stripped else {
        _strip_prefixes(k): v for k, v in tensors.items()
    }

    def take(name: str, transpose: bool = False) -> Optional[np.ndarray]:
        if name not in t:
            return None
        x = np.asarray(t[name])
        return x.T if transpose else x

    def stack(fmt: str, n: int, transpose: bool = False) -> Optional[np.ndarray]:
        xs = []
        for i in range(n):
            x = take(fmt.format(i), transpose)
            if x is None:
                return None
            xs.append(x)
        return np.stack(xs)

    lm = None
    for prefix in ("language_model.", "language_model.model.", ""):
        if take(prefix + "embed_tokens.weight") is not None:
            lm = prefix
            break
    if lm is None:
        return None
    embed = take(lm + "embed_tokens.weight")
    rows = vocab_rows or embed.shape[0]
    if embed.shape[0] < rows:
        embed = np.concatenate(
            [embed, np.zeros((rows - embed.shape[0], embed.shape[1]), embed.dtype)]
        )
    llm = {
        "embed": embed,
        "blocks": {
            "attn_norm": stack(lm + "layers.{}.input_layernorm.weight", L),
            "wq": stack(lm + "layers.{}.self_attn.q_proj.weight", L, transpose=True),
            "wk": stack(lm + "layers.{}.self_attn.k_proj.weight", L, transpose=True),
            "wv": stack(lm + "layers.{}.self_attn.v_proj.weight", L, transpose=True),
            "wo": stack(lm + "layers.{}.self_attn.o_proj.weight", L, transpose=True),
            "mlp_norm": stack(lm + "layers.{}.post_attention_layernorm.weight", L),
            "w_gate": stack(lm + "layers.{}.mlp.gate_proj.weight", L, transpose=True),
            "w_up": stack(lm + "layers.{}.mlp.up_proj.weight", L, transpose=True),
            "w_down": stack(lm + "layers.{}.mlp.down_proj.weight", L, transpose=True),
        },
        "final_norm": take(lm + "norm.weight"),
    }
    head = take("lm_head.weight")
    if head is None:
        head = take("language_model.lm_head.weight")
    if head is not None and not text_cfg.tie_word_embeddings:
        h = head.T  # (D, V)
        if h.shape[1] < rows:
            h = np.concatenate(
                [h, np.zeros((h.shape[0], rows - h.shape[1]), h.dtype)], axis=1
            )
        llm["lm_head"] = h
    return llm


def convert_hf_state_dict(cfg: GARConfig, tensors: Dict[str, np.ndarray]) -> dict:
    L = cfg.text.num_layers
    VL = cfg.vision.depth
    t = {_strip_prefixes(k): v for k, v in tensors.items()}

    def take(name: str, transpose: bool = False) -> Optional[np.ndarray]:
        if name not in t:
            return None
        x = np.asarray(t[name])
        return x.T if transpose else x

    def stack(fmt: str, n: int, transpose: bool = False) -> Optional[np.ndarray]:
        xs = []
        for i in range(n):
            x = take(fmt.format(i), transpose)
            if x is None:
                return None
            xs.append(x)
        return np.stack(xs)

    params: dict = {}

    # --- vision tower (timm VisionTransformer naming under vision_tower.timm_model) ---
    vt = "vision_tower.timm_model."
    pe = take(vt + "patch_embed.proj.weight")
    if pe is not None:
        d = pe.shape[0]
        vision = {
            "patch_embed": {
                "kernel": pe.reshape(d, -1).T,  # (C*p*p, D) channel-major
                "bias": take(vt + "patch_embed.proj.bias"),
            },
            "blocks": {
                "ln1_scale": stack(vt + "blocks.{}.norm1.weight", VL),
                "ln1_bias": stack(vt + "blocks.{}.norm1.bias", VL),
                "wqkv": stack(vt + "blocks.{}.attn.qkv.weight", VL, transpose=True),
                "bqkv": stack(vt + "blocks.{}.attn.qkv.bias", VL),
                "wo": stack(vt + "blocks.{}.attn.proj.weight", VL, transpose=True),
                "bo": stack(vt + "blocks.{}.attn.proj.bias", VL),
                "ln2_scale": stack(vt + "blocks.{}.norm2.weight", VL),
                "ln2_bias": stack(vt + "blocks.{}.norm2.bias", VL),
                "fc1": stack(vt + "blocks.{}.mlp.fc1.weight", VL, transpose=True),
                "b1": stack(vt + "blocks.{}.mlp.fc1.bias", VL),
                "fc2": stack(vt + "blocks.{}.mlp.fc2.weight", VL, transpose=True),
                "b2": stack(vt + "blocks.{}.mlp.fc2.bias", VL),
            },
        }
        ls1 = stack(vt + "blocks.{}.ls1.gamma", VL)
        if ls1 is not None:
            vision["blocks"]["ls1"] = ls1
            vision["blocks"]["ls2"] = stack(vt + "blocks.{}.ls2.gamma", VL)
        cls = take(vt + "cls_token")
        if cls is not None:
            vision["cls_token"] = cls.reshape(1, 1, -1)
        pos = take(vt + "pos_embed")
        if pos is not None:
            vision["pos_embed"] = pos.reshape(pos.shape[-2], pos.shape[-1])
        npre = take(vt + "norm_pre.weight")
        if npre is not None:
            vision["ln_pre"] = {"scale": npre, "bias": take(vt + "norm_pre.bias")}
        npost = take(vt + "norm.weight")
        if npost is not None:
            vision["ln_post"] = {"scale": npost, "bias": take(vt + "norm.bias")}
        rope = take(vt + "rope.freqs")
        if rope is not None:
            # timm mixed rope: learnable (depth, num_heads, head_dim/2, 2) —
            # stored layouts vary across versions; reshape defensively
            vision["rope_freqs"] = rope.reshape(
                VL, cfg.vision.num_heads, cfg.vision.head_dim // 2, 2
            )
        params["vision"] = vision

    # --- projector ---
    fc1 = take("multi_modal_projector.linear_1.weight", transpose=True)
    if fc1 is not None:
        params["projector"] = {
            "fc1": fc1,
            "b1": take("multi_modal_projector.linear_1.bias"),
            "fc2": take("multi_modal_projector.linear_2.weight", transpose=True),
            "b2": take("multi_modal_projector.linear_2.bias"),
        }

    # --- decoder ---
    llm = convert_hf_llama(cfg.text, t, vocab_rows=cfg.padded_vocab_size,
                           already_stripped=True)
    if llm is not None:
        params["llm"] = llm

    # --- mask patch embedding (GAR-specific, zero-init at train start) ---
    mpe = take("mask_patch_embedding.weight")
    if mpe is None:
        mpe = take("mask_conv.weight")
    if mpe is not None:
        params["mask_embed"] = {"kernel": mpe.reshape(mpe.shape[0], -1).T}

    missing = [k for k in ("vision", "projector", "llm") if k not in params]
    if missing:
        raise ValueError(
            f"HF checkpoint missing components {missing}; found keys like "
            f"{list(t)[:8]}"
        )
    if "mask_embed" not in params:
        kh, kw = cfg.mask_patch_kernel
        params["mask_embed"] = {
            "kernel": np.zeros((kh * kw * cfg.mask_in_channels, cfg.vision.width), np.float32)
        }
    return params
