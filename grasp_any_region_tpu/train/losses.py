"""Training loss: label-masked next-token cross-entropy with a chunked head.

The reference computes loss through HF's lm_head + CE over the full
(B, S, 128k) logits (modeling_perception_lm.py:545-562). At S=16k that is a
>2 GB fp32 buffer; here the head matmul + CE are computed per sequence chunk
inside a scan so peak memory is (B, chunk, V). Labels use -100 as the ignore
index (assistant-span supervision, GraspAnyRegion_Dataset.py:504-530).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.config import TextConfig
from ..ops.norms import rms_norm

IGNORE_INDEX = -100


def shift_labels(labels: jnp.ndarray) -> jnp.ndarray:
    """Align labels so position t supervises token t+1 (HF shift)."""
    b, s = labels.shape
    return jnp.concatenate(
        [labels[:, 1:], jnp.full((b, 1), IGNORE_INDEX, labels.dtype)], axis=1
    )


def ce_sums(
    llm_params: dict,
    cfg: TextConfig,
    hidden: jnp.ndarray,  # (B, S, D) pre-final-norm decoder output
    labels: jnp.ndarray,  # (B, S) already shifted; -100 = ignore
    *,
    chunk_size: int = 1024,
    valid_vocab: Optional[int] = None,
):
    """(sum of NLL over supervised positions, supervised count).

    The unreduced form exists for 1F1B pipelining (parallel/pipeline.py):
    each microbatch's backward runs before later microbatches' forwards, so
    the per-microbatch loss head must emit a SUM whose cotangent can be
    seeded with the global 1/count (computable from labels alone, before
    any forward). chunked_cross_entropy is this divided once at the end.

    llm_params needs only the head leaves ("final_norm" + "lm_head", or
    "embed" when tied) — callers may pass a pruned dict."""
    b, s, d = hidden.shape
    x = rms_norm(hidden, llm_params["final_norm"], cfg.rms_norm_eps)
    head = llm_params.get("lm_head")
    tied = head is None
    if tied:
        head = llm_params["embed"]  # (V, D) — contracted directly, no transpose
    v = head.shape[0] if tied else head.shape[-1]

    chunk_size = min(chunk_size, s)
    pad = (-s) % chunk_size
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        labels = jnp.pad(labels, ((0, 0), (0, pad)), constant_values=IGNORE_INDEX)
    n_chunks = (s + pad) // chunk_size
    x = x.reshape(b, n_chunks, chunk_size, d).transpose(1, 0, 2, 3)
    labels = labels.reshape(b, n_chunks, chunk_size).transpose(1, 0, 2)

    vocab_ok = None
    if valid_vocab is not None and valid_vocab < v:
        vocab_ok = jnp.arange(v) < valid_vocab

    # checkpointed chunk: under grad, a bare scan body saves each chunk's
    # (B, C, V) fp32 logits as residuals and XLA stacks them into ONE
    # n_chunks-deep buffer (4.9 GB at S=4.7k/V=128k — the whole point of
    # chunking, defeated). Remat recomputes the head matmul per chunk in
    # the backward; residuals shrink to the (B, C, D) chunk inputs.
    @jax.checkpoint
    def chunk_nll(head_, xc, lc):
        eq = "bcd,vd->bcv" if tied else "bcd,dv->bcv"
        logits = jnp.einsum(
            eq, xc, head_.astype(xc.dtype),
            preferred_element_type=jnp.float32,
        )
        if vocab_ok is not None:
            logits = jnp.where(vocab_ok, logits, -1e30)
        logz = jax.nn.logsumexp(logits, axis=-1)  # (B, C)
        mask = lc != IGNORE_INDEX
        safe = jnp.where(mask, lc, 0)
        gold = jnp.take_along_axis(logits, safe[..., None], axis=-1)[..., 0]
        nll = jnp.where(mask, logz - gold, 0.0)
        return nll.sum(), mask.sum()

    def body(carry, xs):
        total, count = carry
        xc, lc = xs  # (B, C, D), (B, C)
        nll, n = chunk_nll(head, xc, lc)
        return (total + nll, count + n), None

    # derive the zero carries FROM the data so they inherit its
    # varying-manual-axes type — ce_sums must trace identically outside
    # jit, under jit, and inside a shard_map manual context (the 1F1B
    # pipeline calls it per microbatch on one stage)
    zero_f = (x.reshape(-1)[0] * 0).astype(jnp.float32)
    zero_i = (labels.reshape(-1)[0] * 0).astype(jnp.int32)
    (total, count), _ = jax.lax.scan(body, (zero_f, zero_i), (x, labels))
    return total, count


def chunked_cross_entropy(
    llm_params: dict,
    cfg: TextConfig,
    hidden: jnp.ndarray,  # (B, S, D) pre-final-norm decoder output
    labels: jnp.ndarray,  # (B, S) already shifted; -100 = ignore
    *,
    chunk_size: int = 1024,
    valid_vocab: Optional[int] = None,
) -> jnp.ndarray:
    """Mean CE over supervised positions. Never materializes full logits."""
    total, count = ce_sums(
        llm_params, cfg, hidden, labels,
        chunk_size=chunk_size, valid_vocab=valid_vocab,
    )
    return total / jnp.maximum(count, 1).astype(jnp.float32)
