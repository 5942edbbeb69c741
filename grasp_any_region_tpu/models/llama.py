"""Llama-3-family decoder, TPU-native.

Capability parity with the reference's HF Llama text model (the decoder side
of PerceptionLMForConditionalGeneration, modeling_perception_lm.py:429-572),
re-designed for XLA:

  * Layers are stacked and scanned (`lax.scan`) — one compiled block.
  * KV cache is a static-shape (L, B, S_max, K, Dh) pair; prefill emits it as
    scan outputs, decode updates it in place per step (no dynamic torch.cat
    like HF's DynamicCache).
  * GQA flash attention via ops.attention dispatch; fp32 softmax.
  * Big-vocab cross-entropy is chunked over the sequence so full
    (B, S, 128k) logits are never materialized (see train/losses.py).
  * Embedding table is padded to a multiple of 256 rows (MXU/TP friendly);
    out-of-vocab logits are masked to -inf.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import TextConfig
from ..ops.attention import NEG_INF, decode_attention_reference, mha
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope, llama_inv_freq, rope_cos_sin


class KVCache(NamedTuple):
    k: jnp.ndarray  # (L, B, S_max, K, Dh)
    v: jnp.ndarray  # (L, B, S_max, K, Dh)
    length: jnp.ndarray  # (B,) int32 valid entries

    @classmethod
    def zeros(cls, cfg: TextConfig, batch: int, max_len: int, dtype=jnp.bfloat16):
        shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim)
        return cls(
            k=jnp.zeros(shape, dtype),
            v=jnp.zeros(shape, dtype),
            length=jnp.zeros((batch,), jnp.int32),
        )


def init_llama_params(
    rng: jax.Array, cfg: TextConfig, vocab_rows: Optional[int] = None, dtype=jnp.float32
) -> dict:
    """vocab_rows: padded embedding rows (defaults to cfg.vocab_size)."""
    v = vocab_rows or cfg.vocab_size
    d, m, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    h, k, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    keys = jax.random.split(rng, 8)

    def trunc(key, shape, std=0.02):
        return (jax.random.truncated_normal(key, -2, 2, shape, jnp.float32) * std).astype(dtype)

    params = {
        "embed": trunc(keys[0], (v, d)),
        "blocks": {
            "attn_norm": jnp.ones((L, d), dtype),
            "wq": trunc(keys[1], (L, d, h * dh)),
            "wk": trunc(keys[2], (L, d, k * dh)),
            "wv": trunc(keys[3], (L, d, k * dh)),
            "wo": trunc(keys[4], (L, h * dh, d)),
            "mlp_norm": jnp.ones((L, d), dtype),
            "w_gate": trunc(keys[5], (L, d, m)),
            "w_up": trunc(keys[6], (L, d, m)),
            "w_down": trunc(keys[7], (L, m, d)),
        },
        "final_norm": jnp.ones((d,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = trunc(jax.random.fold_in(rng, 99), (d, v))
    return params


def _qkv(cfg: TextConfig, bp: dict, x: jnp.ndarray, cos, sin):
    b, s, _ = x.shape
    h, k, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    q = (x @ bp["wq"].astype(x.dtype)).reshape(b, s, h, dh)
    kk = (x @ bp["wk"].astype(x.dtype)).reshape(b, s, k, dh)
    vv = (x @ bp["wv"].astype(x.dtype)).reshape(b, s, k, dh)
    q = apply_rope(q, cos, sin)
    kk = apply_rope(kk, cos, sin)
    return q, kk, vv


def _mlp(bp: dict, x: jnp.ndarray) -> jnp.ndarray:
    gate = x @ bp["w_gate"].astype(x.dtype)
    up = x @ bp["w_up"].astype(x.dtype)
    return (jax.nn.silu(gate) * up) @ bp["w_down"].astype(x.dtype)


def llama_prefill(
    params: dict,
    cfg: TextConfig,
    inputs_embeds: jnp.ndarray,  # (B, S, D)
    positions: jnp.ndarray,  # (B, S) int32
    *,
    segment_ids: Optional[jnp.ndarray] = None,  # (B, S) packing/padding mask
    remat: bool = False,
    use_flash: Optional[bool] = None,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Full-sequence forward. Returns (hidden (B,S,D), (k_all, v_all)) where
    k_all/v_all are (L, B, S, K, Dh) for cache seeding."""
    inv = llama_inv_freq(cfg)
    cos, sin = rope_cos_sin(positions, inv)  # (B, S, Dh)
    eps = cfg.rms_norm_eps

    def body(x, bp):
        y = rms_norm(x, bp["attn_norm"], eps)
        q, k, v = _qkv(cfg, bp, y, cos, sin)
        a = mha(q, k, v, causal=True, segment_ids=segment_ids, use_flash=use_flash)
        a = a.reshape(x.shape[0], x.shape[1], -1) @ bp["wo"].astype(x.dtype)
        x = x + a
        y = rms_norm(x, bp["mlp_norm"], eps)
        x = x + _mlp(bp, y)
        return x, (k, v)

    body_fn = jax.checkpoint(body) if remat else body
    x, (ks, vs) = jax.lax.scan(body_fn, inputs_embeds, params["blocks"])
    return x, (ks, vs)


def llama_decode_step(
    params: dict,
    cfg: TextConfig,
    inputs_embeds: jnp.ndarray,  # (B, 1, D)
    cache: KVCache,
) -> Tuple[jnp.ndarray, KVCache]:
    """One token step. Reads positions from cache.length, appends k/v."""
    b = inputs_embeds.shape[0]
    inv = llama_inv_freq(cfg)
    pos = cache.length  # (B,) position of the new token
    cos, sin = rope_cos_sin(pos[:, None], inv)  # (B, 1, Dh)
    eps = cfg.rms_norm_eps
    batch_idx = jnp.arange(b)

    def body(x, layer):
        bp, k_cache, v_cache = layer  # k_cache: (B, S_max, K, Dh)
        y = rms_norm(x, bp["attn_norm"], eps)
        q, k, v = _qkv(cfg, bp, y, cos, sin)  # q: (B,1,H,Dh), k/v: (B,1,K,Dh)
        k_cache = k_cache.at[batch_idx, pos].set(k[:, 0])
        v_cache = v_cache.at[batch_idx, pos].set(v[:, 0])
        a = decode_attention_reference(
            q[:, 0], k_cache, v_cache, cache_len=pos + 1
        )  # (B, H, Dh)
        a = a.reshape(b, 1, -1) @ bp["wo"].astype(x.dtype)
        x = x + a
        y = rms_norm(x, bp["mlp_norm"], eps)
        x = x + _mlp(bp, y)
        return x, (k_cache, v_cache)

    x, (new_k, new_v) = jax.lax.scan(
        body, inputs_embeds, (params["blocks"], cache.k, cache.v)
    )
    return x, KVCache(k=new_k, v=new_v, length=cache.length + 1)


def embed_tokens(params: dict, input_ids: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    return params["embed"].astype(dtype)[input_ids]


def lm_logits(
    params: dict,
    cfg: TextConfig,
    hidden: jnp.ndarray,
    *,
    valid_vocab: Optional[int] = None,
) -> jnp.ndarray:
    """hidden (..., D) -> fp32 logits (..., V_rows), padded rows masked."""
    x = rms_norm(hidden, params["final_norm"], cfg.rms_norm_eps)
    head = params.get("lm_head")
    if head is None:
        head = params["embed"].T
    logits = jnp.einsum(
        "...d,dv->...v", x, head.astype(x.dtype), preferred_element_type=jnp.float32
    )
    v_rows = logits.shape[-1]
    if valid_vocab is not None and valid_vocab < v_rows:
        mask = jnp.arange(v_rows) < valid_vocab
        logits = jnp.where(mask, logits, NEG_INF)
    return logits
