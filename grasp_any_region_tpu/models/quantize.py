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


def init_gar_serving_int8(rng: jax.Array, cfg) -> dict:
    """Random-init GAR params DIRECTLY in the serving-only int8 layout.

    For GAR-8B the bf16 decoder alone is ~16 GB — materializing it just to
    quantize would OOM a single 16 GB chip before `serving_weights` ever ran.
    This initializer builds the exact tree `serving_weights(init_gar_params(
    ...))` would produce, but the decoder matmuls are born int8 (uniform
    random values; scales sized so dequantized weights have the usual ~0.02
    std): bf16 vision/projector/mask-embed + int8 decoder + int8 LM head,
    with NO bf16 decoder copies ever resident. Used by the 8B-on-one-chip
    end-to-end bench (bench.run_gar8b_caption) and the 8B dryrun lowering.

    Tree-shape parity with serving_weights is asserted by
    tests/test_serving_only.py::test_init_serving_int8_tree_matches.
    """
    from ..core.config import GARConfig  # noqa: F401 — cfg: GARConfig
    from .projector import init_projector_params
    from .vision import init_vision_params

    t = cfg.text
    L, d, f = t.num_layers, t.hidden_size, t.intermediate_size
    h, k, dh = t.num_heads, t.num_kv_heads, t.head_dim
    v_rows = cfg.padded_vocab_size
    k_vis, k_proj, k_llm = jax.random.split(rng, 3)
    dtype = jnp.bfloat16

    def q8(key, shape):
        return jax.random.randint(key, shape, -127, 128, jnp.int8)

    def sc(shape):
        # uniform int8 in [-127,127] has std ~73.3; scale for ~0.02 weight std
        return jnp.full(shape, 0.02 / 73.3, jnp.float32)

    keys = jax.random.split(k_llm, 12)
    mats = {"wq": (d, h * dh), "wk": (d, k * dh), "wv": (d, k * dh),
            "wo": (h * dh, d), "w_gate": (d, f), "w_up": (d, f),
            "w_down": (f, d)}
    blocks = {"attn_norm": jnp.ones((L, d), dtype),
              "mlp_norm": jnp.ones((L, d), dtype)}
    for i, (name, shape) in enumerate(mats.items()):
        blocks[f"{name}_q8"] = q8(keys[i], (L,) + shape)
        blocks[f"{name}_scale"] = sc((L, 1, shape[1]))
    llm = {"blocks": blocks, "final_norm": jnp.ones((d,), dtype)}
    if t.tie_word_embeddings:
        # tied: the (V, D) int8 head doubles as the embedding table
        # (per-vocab-row scales — see quantize_decode_weights)
        llm["lm_head_q8"] = q8(keys[8], (v_rows, d))
        llm["lm_head_scale"] = sc((v_rows, 1))
    else:
        llm["embed"] = (
            jax.random.normal(keys[9], (v_rows, d), jnp.float32) * 0.02
        ).astype(dtype)
        llm["lm_head_q8"] = q8(keys[10], (d, v_rows))
        llm["lm_head_scale"] = sc((1, v_rows))

    kh_, kw_ = cfg.mask_patch_kernel
    return {
        "vision": init_vision_params(k_vis, cfg.vision, dtype),
        "projector": init_projector_params(k_proj, cfg, dtype),
        "llm": llm,
        "mask_embed": {
            "kernel": jnp.zeros(
                (kh_ * kw_ * cfg.mask_in_channels, cfg.vision.width), dtype
            )
        },
    }
