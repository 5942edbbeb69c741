"""Int8 weight quantization for the decode path.

Decode is HBM-bandwidth-bound: streaming the decoder weights dominates the
per-token cost (docs/PERF_NOTES.md). Symmetric per-output-channel int8
halves that traffic; kernels dequantize in VMEM (w_f = int8 * scale) before
the matmul, so math stays bf16/fp32-accumulated. Prefill keeps the bf16
weights (it is FLOPs-bound and batch-amortized).

`quantize_decode_weights` adds `{name}_q8` / `{name}_scale` entries next to
the bf16 originals; the fused decode step picks them up automatically.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

DECODE_MATMULS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


def quantize_int8(w: jnp.ndarray, axis: int = -2) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(..., Din, Dout) -> int8 values + fp32 scales per output channel.

    axis: the CONTRACTING axis (reduced in the matmul) — scales must be
    constant along it so dequantization commutes with the contraction.
    """
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=axis, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def quantize_decode_weights(
    params: dict,
    targets: Sequence[str] = DECODE_MATMULS,
    drop_bf16: bool = False,
) -> dict:
    """Return params with int8 copies of the decoder matmuls added.

    drop_bf16=False (training/eval): the bf16 originals stay (prefill uses
    them); decode reads only the int8 copies, so resident memory grows
    ~1.2 GB for GAR-1B but per-token traffic halves.

    drop_bf16=True (serving-only): the bf16 decoder matmuls (and, when
    embeddings are tied, the bf16 embed table) are REMOVED — prefill then
    runs on the int8 weights too (_proj/embed_tokens fall back to the q8
    leaves, dequantizing inside the matmul read). Resident decoder weights
    halve vs bf16, which is what lets a 16-slot serving pool fit one 16 GB
    chip (docs/PERF_NOTES.md addendum 8 documented the dual-copy OOM).
    Quality caveat: prefill numerics become int8-weight too, not just
    decode — parity vs real checkpoints must cover this mode
    (cli/parity.py).

    The LM head is quantized too: at 128k vocab it is the single largest
    per-step weight read (~0.5 GB bf16, ~700 µs of the decode step at the
    819 GB/s floor — docs/PERF_NOTES.md round-3 dissection) and it runs
    every token. Per-vocab-row scales keep greedy argmax stable (the scale
    is exact per output logit; only the D-axis rounding perturbs it).
    """
    blocks = dict(params["llm"]["blocks"])
    for name in targets:
        q, s = quantize_int8(blocks[name])  # (L, Din, Dout) int8, (L, 1, Dout)
        blocks[f"{name}_q8"] = q
        blocks[f"{name}_scale"] = s
        if drop_bf16:
            del blocks[name]
    out = dict(params)
    out["llm"] = dict(params["llm"])
    out["llm"]["blocks"] = blocks
    head = params["llm"].get("lm_head")
    if head is None:
        # tied embeddings: lm_logits contracts x against embed (V, D) —
        # contract axis is D (last), so scales are per vocab row. The same
        # per-row (V, 1) scales make the q8 table valid for the embedding
        # LOOKUP as well, so drop_bf16 can remove the bf16 table outright.
        q, s = quantize_int8(params["llm"]["embed"], axis=-1)  # (V, D), (V, 1)
        if drop_bf16:
            del out["llm"]["embed"]
    else:
        q, s = quantize_int8(head, axis=-2)  # (D, V), (1, V)
        if drop_bf16:
            del out["llm"]["lm_head"]
    out["llm"]["lm_head_q8"] = q
    out["llm"]["lm_head_scale"] = s
    return out


def serving_weights(params: dict) -> dict:
    """Quantize-on-load for serving-only deployments: int8 decoder matmuls +
    LM head with NO resident bf16 copies (the vision tower/projector stay
    bf16 — they run once per request and are a small fraction of memory)."""
    return quantize_decode_weights(params, drop_bf16=True)


def dequantize(q: jnp.ndarray, scale: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    return (q.astype(jnp.float32) * scale).astype(dtype)
