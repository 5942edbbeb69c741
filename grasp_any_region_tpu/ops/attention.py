"""Attention ops — XLA reference path + dispatch to Pallas flash kernels.

Replaces the reference's flash-attn 2.7.4 CUDA dependency
(configs/gar_1b.py:78, `attn_implementation="flash_attention_2"`; vision
tower forced eager in hf_models/modeling_gar.py:34-43).

Two call sites:
  * `mha` — bidirectional/causal attention over full sequences (ViT tiles,
    LLM prefill). Dispatches to the Pallas flash kernel for long sequences
    (ops/flash_attention.py), XLA einsum otherwise (XLA fuses QK^T+softmax+PV
    well at short S; the MXU is saturated either way).
  * `decode_attention` — single-query attention against a KV cache
    (bandwidth-bound; see ops/decode_attention.py for the Pallas path).

All softmax math in fp32 regardless of input dtype.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -2.0 ** 30  # large-but-finite; avoids NaN from (-inf) - (-inf)


def repeat_kv(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """(B, S, K, D) -> (B, S, K*n, D) repeating each kv head n times."""
    if n == 1:
        return x
    b, s, k, d = x.shape
    x = jnp.broadcast_to(x[:, :, :, None, :], (b, s, k, n, d))
    return x.reshape(b, s, k * n, d)


def mha_reference(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Plain XLA attention.

    q: (B, Sq, H, D); k/v: (B, Sk, K, D) with H % K == 0 (GQA).
    segment_ids: (B, Sq) int; tokens attend only within equal segment ids
    (block-diagonal packing mask; replaces the reference's varlen path,
    custom_collect_fn.py:96-106). id 0 may be used for padding — pair with a
    causal mask and padded positions simply attend within the pad block.
    Returns (B, Sq, H, D) in q.dtype.
    """
    b, sq, h, d = q.shape
    _, sk, kh, _ = k.shape
    if scale is None:
        scale = d ** -0.5
    qf = q.astype(jnp.float32) * scale
    kf = repeat_kv(k, h // kh).astype(jnp.float32)
    vf = repeat_kv(v, h // kh).astype(jnp.float32)

    logits = jnp.einsum("bqhd,bkhd->bhqk", qf, kf, precision=jax.lax.Precision.HIGHEST)
    mask = None
    if causal:
        qpos = jnp.arange(sq)[:, None] + (sk - sq)  # right-aligned
        kpos = jnp.arange(sk)[None, :]
        mask = qpos >= kpos  # (Sq, Sk)
        mask = mask[None, None]
    if segment_ids is not None:
        if kv_segment_ids is None:
            kv_segment_ids = segment_ids
        seg = segment_ids[:, None, :, None] == kv_segment_ids[:, None, None, :]
        mask = seg if mask is None else (mask & seg)
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, vf, precision=jax.lax.Precision.HIGHEST)
    return out.astype(q.dtype)


def mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    segment_ids: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    use_flash: Optional[bool] = None,
) -> jnp.ndarray:
    """Dispatching attention entry point.

    use_flash=None auto-selects: Pallas flash kernel on TPU for Sq >= 1024
    (where the O(S^2) logits buffer stops fitting in VMEM/fusion budgets),
    XLA reference otherwise.
    """
    sq = q.shape[1]
    if use_flash is None:
        on_tpu = jax.default_backend() == "tpu"
        use_flash = on_tpu and sq >= 1024 and segment_ids is None
    if use_flash:
        from .flash_attention import flash_attention

        return flash_attention(q, k, v, causal=causal, scale=scale)
    return mha_reference(
        q, k, v, causal=causal, segment_ids=segment_ids, scale=scale
    )


def decode_attention_reference(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    cache_len: jnp.ndarray,
    *,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Single-step attention against a static-size KV cache.

    q: (B, H, D) current-token queries
    k_cache/v_cache: (B, S, K, D); positions >= cache_len are masked out.
    cache_len: (B,) int32 number of valid cache entries (including current).
    """
    b, h, d = q.shape
    _, s, kh, _ = k_cache.shape
    if scale is None:
        scale = d ** -0.5
    g = h // kh
    qf = q.astype(jnp.float32).reshape(b, kh, g, d) * scale
    kf = k_cache.astype(jnp.float32)  # (B, S, K, D)
    vf = v_cache.astype(jnp.float32)
    logits = jnp.einsum("bkgd,bskd->bkgs", qf, kf, precision=jax.lax.Precision.HIGHEST)
    valid = jnp.arange(s)[None, :] < cache_len[:, None]  # (B, S)
    logits = jnp.where(valid[:, None, None, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bkgs,bskd->bkgd", probs, vf, precision=jax.lax.Precision.HIGHEST)
    return out.reshape(b, h, d).astype(q.dtype)
