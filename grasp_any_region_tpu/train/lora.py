"""LoRA adapters for the decoder.

Capability parity with the reference's `llm_lora` option (peft LoRA over the
LLM linears, grasp_any_region.py:151-169 + get_peft_model_state_dict slim
checkpoints). TPU-native shape: adapters live alongside the stacked block
weights as (L, Din, r) / (L, r, Dout) pairs so the scanned prefill applies
them with two small extra matmuls per target; inference merges them into the
base weights (`merge_lora`) so the fused decode kernels stay untouched.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp

# decoder matmuls eligible for adaptation, with their (din, dout) extents
TARGET_DIMS = {
    "wq": ("hidden", "q"),
    "wk": ("hidden", "kv"),
    "wv": ("hidden", "kv"),
    "wo": ("q", "hidden"),
    "w_gate": ("hidden", "mlp"),
    "w_up": ("hidden", "mlp"),
    "w_down": ("mlp", "hidden"),
}


@dataclass(frozen=True)
class LoRAConfig:
    rank: int = 16
    alpha: float = 32.0
    targets: Tuple[str, ...] = ("wq", "wk", "wv", "wo")

    @property
    def scaling(self) -> float:
        return self.alpha / self.rank


def _dims(text_cfg) -> dict:
    return {
        "hidden": text_cfg.hidden_size,
        "q": text_cfg.num_heads * text_cfg.head_dim,
        "kv": text_cfg.num_kv_heads * text_cfg.head_dim,
        "mlp": text_cfg.intermediate_size,
    }


def add_lora_params(
    rng: jax.Array, params: dict, text_cfg, lora_cfg: LoRAConfig, dtype=jnp.float32
) -> dict:
    """Return params with `llm/blocks/{target}_lora_{a,b}` added.

    A ~ N(0, 1/r) (kaiming-ish), B = 0 — so the adapted model starts exactly
    at the base model (peft convention).
    """
    dims = _dims(text_cfg)
    L = text_cfg.num_layers
    r = lora_cfg.rank
    blocks = dict(params["llm"]["blocks"])
    for i, t in enumerate(lora_cfg.targets):
        assert t in TARGET_DIMS, f"unknown LoRA target {t}"
        din = dims[TARGET_DIMS[t][0]]
        dout = dims[TARGET_DIMS[t][1]]
        key = jax.random.fold_in(rng, i)
        blocks[f"{t}_lora_a"] = (
            jax.random.normal(key, (L, din, r), jnp.float32) / (r ** 0.5)
        ).astype(dtype)
        blocks[f"{t}_lora_b"] = jnp.zeros((L, r, dout), dtype)
    out = dict(params)
    out["llm"] = dict(params["llm"])
    out["llm"]["blocks"] = blocks
    out["llm"]["lora_scaling"] = jnp.asarray(lora_cfg.scaling, jnp.float32)
    return out


def lora_delta(bp: dict, name: str, x: jnp.ndarray, scaling: float) -> jnp.ndarray:
    """(x @ A) @ B * s for one (sliced, per-layer) block dict; 0 if absent."""
    a = bp.get(f"{name}_lora_a")
    if a is None:
        return jnp.zeros(())
    b = bp[f"{name}_lora_b"]
    return ((x @ a.astype(x.dtype)) @ b.astype(x.dtype)) * scaling


def merge_lora(params: dict, lora_cfg: LoRAConfig) -> dict:
    """Fold adapters into the base weights (W += s * A @ B) and drop them —
    required before the fused decode path / HF export."""
    blocks = dict(params["llm"]["blocks"])
    for t in lora_cfg.targets:
        a = blocks.pop(f"{t}_lora_a", None)
        b = blocks.pop(f"{t}_lora_b", None)
        if a is None:
            continue
        delta = jnp.einsum(
            "lir,lro->lio", a.astype(jnp.float32), b.astype(jnp.float32)
        ) * lora_cfg.scaling
        blocks[t] = (blocks[t].astype(jnp.float32) + delta).astype(blocks[t].dtype)
    out = dict(params)
    out["llm"] = {k: v for k, v in params["llm"].items() if k != "lora_scaling"}
    out["llm"]["blocks"] = blocks
    return out


def lora_trainable_mask(params: dict, *, train_embeddings: bool = True) -> Any:
    """Bool tree: only LoRA adapters (+ optionally embeds/lm_head and the
    always-new mask_patch_embedding) train — the reference's LoRA regime."""

    def decide(key_path, _):
        path = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in key_path)
        if "_lora_" in path or "mask_embed" in path:
            return True
        if train_embeddings and (path.endswith("embed") or path.endswith("lm_head")):
            return True
        return False

    return jax.tree_util.tree_map_with_path(decide, params)
