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


def quantize_decode_weights(params: dict, targets: Sequence[str] = DECODE_MATMULS) -> dict:
    """Return params with int8 copies of the decoder matmuls added.

    The bf16 originals stay (prefill uses them); decode reads only the int8
    copies, so resident memory grows ~1.2 GB for GAR-1B but per-token traffic
    halves. Drop the bf16 block weights afterwards for serving-only
    deployments if memory is tight.

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
    out = dict(params)
    out["llm"] = dict(params["llm"])
    out["llm"]["blocks"] = blocks
    head = params["llm"].get("lm_head")
    if head is None:
        # tied embeddings: lm_logits contracts x against embed (V, D) —
        # contract axis is D (last), so scales are per vocab row
        q, s = quantize_int8(params["llm"]["embed"], axis=-1)  # (V, D), (V, 1)
    else:
        q, s = quantize_int8(head, axis=-2)  # (D, V), (1, V)
    out["llm"]["lm_head_q8"] = q
    out["llm"]["lm_head_scale"] = s
    return out


def dequantize(q: jnp.ndarray, scale: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    return (q.astype(jnp.float32) * scale).astype(dtype)
