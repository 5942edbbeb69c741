"""Optimizer + schedule: AdamW, linear warmup -> cosine, grad clip,
gradient accumulation, parameter freezing.

Mirrors the reference recipe (configs/gar_1b.py:126-158): AdamW lr 1e-5,
betas (0.9, 0.999), wd 0, clip 1.0, 3% linear warmup then cosine to 0,
accumulation x2 — minus AMP loss scaling (bf16 on TPU needs none).
Freezing flags mirror GraspAnyRegion.__init__ (grasp_any_region.py:97-125):
freeze_llm / freeze_visual_encoder / freeze_connector with
unfreeze_vocab / unfreeze_lm_head overrides; mask_embed always trains.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import optax


@dataclass(frozen=True)
class OptimizerConfig:
    lr: float = 1e-5
    betas: tuple = (0.9, 0.999)
    weight_decay: float = 0.0
    max_grad_norm: float = 1.0
    warmup_ratio: float = 0.03
    total_steps: int = 10000
    accumulation: int = 1
    freeze_llm: bool = False
    freeze_visual_encoder: bool = False
    freeze_connector: bool = False
    unfreeze_vocab: bool = True
    unfreeze_lm_head: bool = True
    lora_only: bool = False  # train only LoRA adapters (+ embeds/lm_head/
    # mask_embed), the reference's llm_lora regime


def trainable_mask(params: Any, cfg: OptimizerConfig) -> Any:
    """Bool tree: True = trainable."""

    def decide(key_path, _):
        path = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in key_path
        )
        if "mask_embed" in path:
            return True
        if path.startswith("vision"):
            return not cfg.freeze_visual_encoder
        if path.startswith("projector"):
            return not cfg.freeze_connector
        if path.startswith("llm"):
            if path.endswith("embed") and cfg.unfreeze_vocab:
                return True
            if path.endswith("lm_head") and cfg.unfreeze_lm_head:
                return True
            return not cfg.freeze_llm
        return True

    return jax.tree_util.tree_map_with_path(decide, params)


def make_schedule(cfg: OptimizerConfig) -> optax.Schedule:
    warmup = int(cfg.total_steps * cfg.warmup_ratio)
    if warmup == 0:
        return optax.cosine_decay_schedule(cfg.lr, max(1, cfg.total_steps))
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, cfg.lr, warmup),
            optax.cosine_decay_schedule(cfg.lr, max(1, cfg.total_steps - warmup)),
        ],
        [warmup],
    )


def make_optimizer(params: Any, cfg: OptimizerConfig) -> optax.GradientTransformation:
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(
            make_schedule(cfg),
            b1=cfg.betas[0],
            b2=cfg.betas[1],
            weight_decay=cfg.weight_decay,
        ),
    )
    if cfg.lora_only:
        from .lora import lora_trainable_mask

        mask = lora_trainable_mask(params, train_embeddings=cfg.unfreeze_vocab)
    else:
        mask = trainable_mask(params, cfg)
    # NOT optax.masked: its pass-through leaves raw gradients as updates for
    # frozen params (gradient ASCENT once apply_updates adds them). Frozen
    # params must get zero updates.
    labels = jax.tree_util.tree_map(lambda m: "train" if m else "freeze", mask)
    tx = optax.multi_transform({"train": tx, "freeze": optax.set_to_zero()}, labels)
    if cfg.accumulation > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accumulation)
    return tx
