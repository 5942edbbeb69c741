"""Export: native params -> HF-style safetensors (torch naming).

Reverse of core/weights.convert_hf_state_dict; gives convert_to_hf.py parity
(hf_models/convert_to_hf.py: xtuner .pth -> GARModel save_pretrained) so
checkpoints trained here load in the reference's HF stack.
"""

from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np
import jax

from ..core.config import GARConfig, to_dict


def export_hf_state_dict(cfg: GARConfig, params) -> Dict[str, np.ndarray]:
    host = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float32), params)
    out: Dict[str, np.ndarray] = {}

    # vision
    v = host["vision"]
    vt = "mllm.model.vision_tower.timm_model."
    d = cfg.vision.width
    p = cfg.vision.patch_size
    out[vt + "patch_embed.proj.weight"] = (
        v["patch_embed"]["kernel"].T.reshape(d, 3, p, p)
    )
    out[vt + "patch_embed.proj.bias"] = v["patch_embed"]["bias"]
    if "cls_token" in v:
        out[vt + "cls_token"] = v["cls_token"]
    if "pos_embed" in v:
        out[vt + "pos_embed"] = v["pos_embed"][None]
    if v.get("ln_pre") is not None:
        out[vt + "norm_pre.weight"] = v["ln_pre"]["scale"]
        out[vt + "norm_pre.bias"] = v["ln_pre"]["bias"]
    if v.get("ln_post") is not None:
        out[vt + "norm.weight"] = v["ln_post"]["scale"]
        out[vt + "norm.bias"] = v["ln_post"]["bias"]
    if "rope_freqs" in v:
        out[vt + "rope.freqs"] = v["rope_freqs"]
    blocks = v["blocks"]
    for i in range(cfg.vision.depth):
        b = f"{vt}blocks.{i}."
        out[b + "norm1.weight"] = blocks["ln1_scale"][i]
        out[b + "norm1.bias"] = blocks["ln1_bias"][i]
        out[b + "attn.qkv.weight"] = blocks["wqkv"][i].T
        out[b + "attn.qkv.bias"] = blocks["bqkv"][i]
        out[b + "attn.proj.weight"] = blocks["wo"][i].T
        out[b + "attn.proj.bias"] = blocks["bo"][i]
        out[b + "norm2.weight"] = blocks["ln2_scale"][i]
        out[b + "norm2.bias"] = blocks["ln2_bias"][i]
        out[b + "mlp.fc1.weight"] = blocks["fc1"][i].T
        out[b + "mlp.fc1.bias"] = blocks["b1"][i]
        out[b + "mlp.fc2.weight"] = blocks["fc2"][i].T
        out[b + "mlp.fc2.bias"] = blocks["b2"][i]
        if "ls1" in blocks:
            out[b + "ls1.gamma"] = blocks["ls1"][i]
            out[b + "ls2.gamma"] = blocks["ls2"][i]

    # projector
    pj = host["projector"]
    mm = "mllm.model.multi_modal_projector."
    out[mm + "linear_1.weight"] = pj["fc1"].T
    out[mm + "linear_1.bias"] = pj["b1"]
    out[mm + "linear_2.weight"] = pj["fc2"].T
    out[mm + "linear_2.bias"] = pj["b2"]

    # decoder (unpad vocab rows back to the true extended vocab)
    llm = host["llm"]
    lm = "mllm.model.language_model."
    vocab = cfg.extended_vocab_size
    out[lm + "embed_tokens.weight"] = llm["embed"][:vocab]
    out[lm + "norm.weight"] = llm["final_norm"]
    for i in range(cfg.text.num_layers):
        b = f"{lm}layers.{i}."
        bl = llm["blocks"]
        out[b + "input_layernorm.weight"] = bl["attn_norm"][i]
        out[b + "self_attn.q_proj.weight"] = bl["wq"][i].T
        out[b + "self_attn.k_proj.weight"] = bl["wk"][i].T
        out[b + "self_attn.v_proj.weight"] = bl["wv"][i].T
        out[b + "self_attn.o_proj.weight"] = bl["wo"][i].T
        out[b + "post_attention_layernorm.weight"] = bl["mlp_norm"][i]
        out[b + "mlp.gate_proj.weight"] = bl["w_gate"][i].T
        out[b + "mlp.up_proj.weight"] = bl["w_up"][i].T
        out[b + "mlp.down_proj.weight"] = bl["w_down"][i].T
    if "lm_head" in llm:
        out["mllm.lm_head.weight"] = llm["lm_head"].T[:vocab]

    # mask patch embedding
    kh, kw = cfg.mask_patch_kernel
    out["mask_patch_embedding.weight"] = (
        host["mask_embed"]["kernel"].T.reshape(cfg.vision.width, cfg.mask_in_channels, kh, kw)
    )
    return out


def export_hf_checkpoint(path: str, cfg: GARConfig, params) -> None:
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    sd = export_hf_state_dict(cfg, params)
    save_file(sd, os.path.join(path, "model.safetensors"))
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump({"model_type": "gar", "gar_tpu_config": to_dict(cfg)}, f, indent=2)
