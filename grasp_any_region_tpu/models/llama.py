"""Llama-3-family decoder, TPU-native.

Capability parity with the reference's HF Llama text model (the decoder side
of PerceptionLMForConditionalGeneration, modeling_perception_lm.py:429-572),
re-designed for XLA:

  * Layers are stacked and scanned (`lax.scan`) — one compiled block.
  * KV cache is a static-shape (L, B, S_max, Kh, Dh) pair carried through the
    decode loop and written with SCALAR-start `dynamic_update_slice` so XLA
    aliases the update in place (a per-row scatter would copy the whole
    multi-GB cache every step). Prompts are right-padded to a common column
    budget; generated tokens share one write column per step and attention
    masks each row to [0, prompt_len) ∪ [prompt_pad, write_pos].
  * GQA flash attention via ops.attention dispatch; fp32 softmax.
  * Big-vocab cross-entropy is chunked over the sequence so full
    (B, S, 128k) logits are never materialized (see train/losses.py).
  * Embedding table is padded to a multiple of 256 rows (MXU/TP friendly);
    out-of-vocab logits are masked to -inf.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ..core.config import TextConfig
from ..ops.attention import NEG_INF, decode_attention_reference, mha
from ..ops.norms import rms_norm
from ..core.platform import is_tpu
from ..ops.rope import apply_rope, llama_inv_freq, rope_cos_sin


class KVCache(NamedTuple):
    """Decode cache. Columns [0, prompt_pad) hold right-padded prompt K/V
    (garbage at each row's pad tail, masked by prompt_lens); generated tokens
    occupy columns [prompt_pad, write_pos]. write_pos is a shared scalar so
    every cache write is a scalar-start dynamic_update_slice (in-place)."""

    k: jnp.ndarray  # (L, B, Kh, S_max, Dh) — head-major so decode kernels
    v: jnp.ndarray  #   stream contiguous (S, Dh) slabs with no transpose
    prompt_lens: jnp.ndarray  # (B,) int32 true prompt lengths
    write_pos: jnp.ndarray  # () int32 next column to write
    # int8 KV (seed_cache_from_prefill(quantize_kv=True)): k/v are int8 in
    # the PAIRED layout and these hold the static per-(layer, batch,
    # head-pair) dequantization scales, (L, B, K/2, 1, 1) f32. None for
    # bf16 caches. Scales are derived from the prefill KV amax (with
    # headroom for decode-time outliers) so appended columns quantize
    # in-kernel with no scale updates — the decode-attention HBM stream
    # halves again on top of head pairing.
    k_scale: Optional[jnp.ndarray] = None
    v_scale: Optional[jnp.ndarray] = None


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


def _proj(bp: dict, name: str, x: jnp.ndarray, lora_scaling=None) -> jnp.ndarray:
    w = bp.get(name)
    if w is None:
        # serving-only weights (models/quantize.serving_weights): the bf16
        # copy was dropped; dequantize inside the matmul read — XLA fuses
        # the int8->bf16 convert, and the per-output-channel scale commutes
        # with the contraction so it applies to the product
        out = (x @ bp[f"{name}_q8"].astype(x.dtype)) * bp[
            f"{name}_scale"
        ].astype(x.dtype)
    else:
        out = x @ w.astype(x.dtype)
    if lora_scaling is not None and f"{name}_lora_a" in bp:
        from ..train.lora import lora_delta

        out = out + lora_delta(bp, name, x, lora_scaling).astype(out.dtype)
    return out


def _qkv(cfg: TextConfig, bp: dict, x: jnp.ndarray, cos, sin, lora_scaling=None):
    b, s, _ = x.shape
    h, k, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    q = _proj(bp, "wq", x, lora_scaling).reshape(b, s, h, dh)
    kk = _proj(bp, "wk", x, lora_scaling).reshape(b, s, k, dh)
    vv = _proj(bp, "wv", x, lora_scaling).reshape(b, s, k, dh)
    q = apply_rope(q, cos, sin)
    kk = apply_rope(kk, cos, sin)
    return q, kk, vv


def _mlp(bp: dict, x: jnp.ndarray, lora_scaling=None) -> jnp.ndarray:
    gate = _proj(bp, "w_gate", x, lora_scaling)
    up = _proj(bp, "w_up", x, lora_scaling)
    return _proj(bp, "w_down", jax.nn.silu(gate) * up, lora_scaling)


def llama_prefill(
    params: dict,
    cfg: TextConfig,
    inputs_embeds: jnp.ndarray,  # (B, S, D)
    positions: jnp.ndarray,  # (B, S) int32
    *,
    segment_ids: Optional[jnp.ndarray] = None,  # (B, S) packing/padding mask
    remat: bool = False,
    use_flash: Optional[bool] = None,
    right_padded: bool = True,
    mesh=None,  # jax.sharding.Mesh; seq>1 activates sequence parallelism
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Full-sequence forward. Returns (hidden (B,S,D), (k_all, v_all)) where
    k_all/v_all are (L, B, S, K, Dh) for cache seeding.

    right_padded: the GAR data path right-pads (collate mirrors
    custom_collect_fn.py:67-87), so the Pallas flash kernel is exact without
    segment support; pass False for packed multi-document batches.

    mesh: when the active mesh has a 'seq' axis > 1, attention runs
    sequence-parallel — Ulysses head/seq all-to-all (parallel/ulysses.py)
    when the head counts divide the axis, ring attention otherwise (the
    reference's xtuner SP hooks are Ulysses-only and dormant,
    custom_collect_fn.py:89-94). Activations between blocks are constrained
    to seq sharding so qkv/MLP matmuls stay local to each shard."""
    sp = mesh is not None and mesh.shape.get("seq", 1) > 1
    inv = llama_inv_freq(cfg)
    cos, sin = rope_cos_sin(positions, inv)  # (B, S, Dh)
    eps = cfg.rms_norm_eps
    lora_scaling = params.get("lora_scaling")

    if sp:
        from ..parallel.ring import ring_attention
        from ..parallel.sharding import constrain_seq
        from ..parallel.ulysses import ulysses_attention

        p = mesh.shape["seq"]
        assert inputs_embeds.shape[1] % p == 0, (
            f"seq len {inputs_embeds.shape[1]} must divide the seq axis {p} "
            "(collate_samples pads to seq_multiple)"
        )
        ulysses_ok = cfg.num_heads % p == 0 and cfg.num_kv_heads % p == 0
        if not ulysses_ok:
            # ring path is causal-only: packed rows need the segment mask
            assert right_padded or segment_ids is None, (
                "ring attention (kv_heads < seq axis) supports right-padded "
                "causal batches only"
            )
        inputs_embeds = constrain_seq(inputs_embeds, mesh)

    def attend(q, k, v):
        if not sp:
            return mha(q, k, v, causal=True, segment_ids=segment_ids,
                       use_flash=use_flash, right_padded=right_padded,
                       mesh=mesh)
        batch_axes = ("data", "fsdp")
        if ulysses_ok:
            return ulysses_attention(
                q, k, v, mesh, causal=True,
                segment_ids=None if right_padded else segment_ids,
                use_flash=use_flash, right_padded=right_padded,
                batch_axes=batch_axes,
            )
        return ring_attention(q, k, v, mesh, causal=True, batch_axes=batch_axes)

    def body(x, bp):
        y = rms_norm(x, bp["attn_norm"], eps)
        q, k, v = _qkv(cfg, bp, y, cos, sin, lora_scaling)
        a = attend(q, k, v)
        a = _proj(bp, "wo", a.reshape(x.shape[0], x.shape[1], -1), lora_scaling)
        x = x + a
        y = rms_norm(x, bp["mlp_norm"], eps)
        x = x + _mlp(bp, y, lora_scaling)
        if sp:
            x = constrain_seq(x, mesh)
        return x, (k, v)

    body_fn = jax.checkpoint(body) if remat else body
    x, (ks, vs) = jax.lax.scan(body_fn, inputs_embeds, params["blocks"])
    return x, (ks, vs)


def llama_prefill_chunk(
    params: dict,
    cfg: TextConfig,
    embeds: jnp.ndarray,      # (B, C, D) chunk of the prompt
    positions: jnp.ndarray,   # (B, C) absolute positions
    kv_prefix: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    *,
    use_flash: Optional[bool] = None,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Incremental prefill: run one chunk of the prompt against the K/V of
    the chunks processed so far (chunked prefill for serving TTFT — a new
    request's prompt advances one chunk per engine cycle so active decode
    streams are never stalled a whole prefill).

    kv_prefix: (L, B, P, K, Dh) pair from prior chunks (None for the
    first). The chunk's queries attend causally over [prefix ++ chunk] —
    the flash kernel's right-aligned q-suffix offset (q_offset = P) gives
    exact causal semantics without materializing a (C, P+C) mask.
    Returns (hidden (B, C, D), (k_all, v_all) for prefix ++ chunk)."""
    inv = llama_inv_freq(cfg)
    cos, sin = rope_cos_sin(positions, inv)
    eps = cfg.rms_norm_eps

    def body(x, layer):
        bp, prior = layer
        y = rms_norm(x, bp["attn_norm"], eps)
        q, k, v = _qkv(cfg, bp, y, cos, sin)
        if prior is not None:
            kp, vp = prior
            k_full = jnp.concatenate([kp.astype(k.dtype), k], axis=1)
            v_full = jnp.concatenate([vp.astype(v.dtype), v], axis=1)
        else:
            k_full, v_full = k, v
        a = mha(q, k_full, v_full, causal=True, use_flash=use_flash)
        a = _proj(bp, "wo", a.reshape(x.shape[0], x.shape[1], -1))
        x = x + a
        y = rms_norm(x, bp["mlp_norm"], eps)
        x = x + _mlp(bp, y)
        return x, (k_full, v_full)

    if kv_prefix is None:
        x, (ks, vs) = jax.lax.scan(
            lambda c, bp: body(c, (bp, None)), embeds, params["blocks"]
        )
    else:
        x, (ks, vs) = jax.lax.scan(
            body, embeds, (params["blocks"], kv_prefix)
        )
    return x, (ks, vs)


def decode_kernel_choice(cfg: TextConfig) -> Union[bool, str]:
    """Resolve the single-chip decode path: False = plain XLA, "fused" =
    6 layer-indexed Pallas calls/layer, "mega" = 3 megakernel calls.

    The fused/mega qkv kernels hold one layer's whole q/k/v weights in
    VMEM (grid 1): fine for GAR-1B (12 MB) but over the 16 MB scoped
    limit at GAR-8B's hidden 4096 (32 MB for wq alone) unless the weights
    arrive tensor-parallel-sharded. fused (6 calls/layer) measured faster
    e2e than mega in BOTH dtypes: bf16 3611 vs 3861 ms, int8 3290 vs
    3342 ms at B=8 — docs/PERF_NOTES.md round-3 addendum 3. Env
    GAR_DECODE_PATH overrides for A/B benching."""
    d = cfg.hidden_size
    qkv_bytes = 2 * d * (cfg.num_heads + 2 * cfg.num_kv_heads) * cfg.head_dim
    if is_tpu() and qkv_bytes <= 13 * 2 ** 20:
        return os.environ.get("GAR_DECODE_PATH", "fused")
    return False


def paired_cache_wanted(cfg: TextConfig) -> bool:
    """True when the decode path will be the fused Pallas kernels, which
    read the head-PAIRED cache layout ((L, B, K/2, S, 2*Dh) — full
    128-lane tiles instead of half-empty (8, 128) tiles at Dh=64).
    GAR_PAIRED_KV=0 forces the unpaired layout (fallback / A-B)."""
    if os.environ.get("GAR_PAIRED_KV", "1") == "0":
        return False
    return decode_kernel_choice(cfg) == "fused" and cfg.num_kv_heads % 2 == 0


def llama_decode_step(
    params: dict,
    cfg: TextConfig,
    inputs_embeds: jnp.ndarray,  # (B, 1, D)
    cache: KVCache,
    prompt_pad: int,
    *,
    use_kernel: Union[bool, str, None] = None,
) -> Tuple[jnp.ndarray, KVCache]:
    """One token step.

    prompt_pad: static column budget of the prompt block (cache columns
    [0, prompt_pad) are prompt K/V; generated tokens go after).
    The cache is threaded through the layer loop as CARRY and written with
    scalar-start dynamic_update_slice — XLA keeps it in place; a per-row
    scatter (or scan ys) would copy the whole cache every step.
    use_kernel: decode-path selector. False = plain XLA (required under a
    multi-chip mesh); "fused" = 6 layer-indexed Pallas calls/layer;
    "mega" = 3 megakernel calls/layer (ops/decode_megakernel.py);
    True/None = auto: on TPU pick the Pallas path (GAR_DECODE_PATH env
    overrides fused/mega for A/B benching) when the per-layer qkv weights
    fit scoped VMEM.
    """
    b = inputs_embeds.shape[0]
    if cache.k.shape[-1] == 2 * cfg.head_dim:
        # head-PAIRED cache layout (seed_cache_from_prefill(paired=True)):
        # only the fused kernel path reads it (ops/decode_attention.py
        # infers the layout from the cache shape)
        return llama_decode_step_fused(params, cfg, inputs_embeds, cache, prompt_pad)
    if use_kernel is None or use_kernel is True:
        use_kernel = decode_kernel_choice(cfg)
    if use_kernel == "mega":
        return llama_decode_step_mega(params, cfg, inputs_embeds, cache, prompt_pad)
    if use_kernel:
        # fully-fused path: layer-indexed weight streaming + in-kernel cache
        # append; ~1.75x faster per token than the sliced path (PERF_NOTES)
        return llama_decode_step_fused(params, cfg, inputs_embeds, cache, prompt_pad)
    inv = llama_inv_freq(cfg)
    wp = cache.write_pos  # () scalar column for this token
    # rope position of the new token per row: prompt_len + tokens generated
    pos = cache.prompt_lens + (wp - prompt_pad)  # (B,)
    cos, sin = rope_cos_sin(pos[:, None], inv)  # (B, 1, Dh)
    eps = cfg.rms_norm_eps

    def attend(q, k_all, v_all, l):
        # NOTE: the layer slab is dynamic-sliced out of the stacked cache.
        # Passing the full stacked cache into a Pallas kernel (index_map on a
        # scalar-prefetch layer id) was tried and is 2x SLOWER: the kernel
        # read forces XLA to defensively copy the whole cache around the
        # in-place dynamic_update_slice. The slice costs one 2*B*K*S*D read+
        # write per layer; see bench notes in ops/decode_attention.py.
        # (use_kernel=True routes through llama_decode_step_fused above; this
        # sliced path is the XLA reference — the standalone decode_attention
        # Pallas kernel stays covered by tests/test_kernels.py.)
        return decode_attention_reference(
            q, k_all[l], v_all[l],
            prompt_lens=cache.prompt_lens, write_pos=wp, prompt_pad=prompt_pad,
        )

    def body(l, carry):
        x, k_all, v_all = carry
        bp = jax.tree_util.tree_map(lambda p: p[l], params["blocks"])
        y = rms_norm(x, bp["attn_norm"], eps)
        q, k, v = _qkv(cfg, bp, y, cos, sin)  # q: (B,1,H,Dh), k/v: (B,1,K,Dh)
        # scalar-start in-place writes at (l, :, :, wp, :)
        k_new = k[:, 0][:, :, None, :]  # (B, K, 1, Dh)
        v_new = v[:, 0][:, :, None, :]
        k_all = jax.lax.dynamic_update_slice(
            k_all, k_new.astype(k_all.dtype)[None], (l, 0, 0, wp, 0)
        )
        v_all = jax.lax.dynamic_update_slice(
            v_all, v_new.astype(v_all.dtype)[None], (l, 0, 0, wp, 0)
        )
        a = attend(q[:, 0], k_all, v_all, l)  # (B, H, Dh)
        a = _proj(bp, "wo", a.reshape(b, 1, -1))
        x = x + a
        y = rms_norm(x, bp["mlp_norm"], eps)
        x = x + _mlp(bp, y)
        return (x, k_all, v_all)

    x, new_k, new_v = jax.lax.fori_loop(
        0, cfg.num_layers, body, (inputs_embeds, cache.k, cache.v)
    )
    return x, KVCache(
        k=new_k, v=new_v, prompt_lens=cache.prompt_lens, write_pos=wp + 1
    )


def llama_decode_step_fused(
    params: dict,
    cfg: TextConfig,
    inputs_embeds: jnp.ndarray,  # (B, 1, D)
    cache: KVCache,
    prompt_pad: int,
    *,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, KVCache]:
    """Decode step with layer-indexed Pallas kernels end to end: every weight
    matrix and the cache slab stream from HBM exactly once per step — no XLA
    dynamic-slice copies of stacked weights or cache (docs/PERF_NOTES.md).
    """
    from ..ops.decode_attention import decode_attention_fused
    from ..ops.layer_matmul import (
        layer_matmul,
        layer_matmul_q8,
        layer_qkv,
        layer_qkv_q8,
        layer_swiglu,
        layer_swiglu_q8,
    )

    if interpret is None:
        interpret = not is_tpu()  # pallas interpret on CPU
    blocks_probe = params["blocks"]
    q8 = "wq_q8" in blocks_probe  # int8 decode weights present (models/quantize.py)
    kv_q8 = cache.k.dtype == jnp.int8  # int8 KV cache (seed_cache_from_prefill)
    # new K/V enter the kernel in compute dtype even for int8 caches — the
    # kernel quantizes the appended column itself with the static scale
    kv_io_dtype = jnp.bfloat16 if kv_q8 else cache.k.dtype
    b = inputs_embeds.shape[0]
    h, kh, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    inv = llama_inv_freq(cfg)
    wp = cache.write_pos
    pos = cache.prompt_lens + (wp - prompt_pad)
    cos, sin = rope_cos_sin(pos[:, None], inv)  # (B, 1, Dh)
    eps = cfg.rms_norm_eps
    blocks = params["blocks"]

    def body(l, carry):
        x, k_all, v_all = carry  # x: (B, 1, D)
        xr = x[:, 0]
        y = rms_norm(xr, blocks["attn_norm"][l], eps)
        if q8:
            qf, kf, vf = layer_qkv_q8(
                y, blocks["wq_q8"], blocks["wq_scale"],
                blocks["wk_q8"], blocks["wk_scale"],
                blocks["wv_q8"], blocks["wv_scale"], l, interpret=interpret)
        else:
            qf, kf, vf = layer_qkv(y, blocks["wq"], blocks["wk"], blocks["wv"], l,
                                   interpret=interpret)
        q = apply_rope(qf.reshape(b, 1, h, dh), cos, sin)[:, 0]
        k = apply_rope(kf.reshape(b, 1, kh, dh), cos, sin)[:, 0]
        v = vf.reshape(b, kh, dh)
        a, k_all, v_all = decode_attention_fused(
            q.reshape(b, h, dh), k_all, v_all,
            k.astype(kv_io_dtype), v.astype(kv_io_dtype), l,
            prompt_lens=cache.prompt_lens, write_pos=wp, prompt_pad=prompt_pad,
            interpret=interpret,
            k_scale=cache.k_scale, v_scale=cache.v_scale,
        )
        if q8:
            xr = xr + layer_matmul_q8(
                a.reshape(b, h * dh), blocks["wo_q8"], blocks["wo_scale"], l,
                interpret=interpret)
            y = rms_norm(xr, blocks["mlp_norm"][l], eps)
            act = layer_swiglu_q8(
                y, blocks["w_gate_q8"], blocks["w_gate_scale"],
                blocks["w_up_q8"], blocks["w_up_scale"], l, interpret=interpret)
            xr = xr + layer_matmul_q8(
                act, blocks["w_down_q8"], blocks["w_down_scale"], l,
                interpret=interpret)
        else:
            xr = xr + layer_matmul(a.reshape(b, h * dh), blocks["wo"], l,
                                   interpret=interpret)
            y = rms_norm(xr, blocks["mlp_norm"][l], eps)
            act = layer_swiglu(y, blocks["w_gate"], blocks["w_up"], l,
                               interpret=interpret)
            xr = xr + layer_matmul(act, blocks["w_down"], l, interpret=interpret)
        return (xr[:, None], k_all, v_all)

    x, new_k, new_v = jax.lax.fori_loop(
        0, cfg.num_layers, body, (inputs_embeds, cache.k, cache.v)
    )
    return x, cache._replace(k=new_k, v=new_v, write_pos=wp + 1)


def llama_decode_step_mega(
    params: dict,
    cfg: TextConfig,
    inputs_embeds: jnp.ndarray,  # (B, 1, D)
    cache: KVCache,
    prompt_pad: int,
    *,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, KVCache]:
    """Decode step in 3 Pallas calls per layer (ops/decode_megakernel.py):
    norm+qkv+rope / cache-append+attention+wo+residual / norm+mlp+residual.
    Zero XLA ops inside the layer loop — the rope cos/sin tiles are built
    once per token. Same cache contract as llama_decode_step_fused."""
    from ..ops.decode_megakernel import (
        decode_attention_wo,
        layer_mlp_residual,
        layer_mlp_residual_q8,
        layer_qkv_norm_rope,
        layer_qkv_norm_rope_q8,
    )

    if interpret is None:
        interpret = not is_tpu()
    blocks = params["blocks"]
    q8 = "wq_q8" in blocks  # int8 decode weights present (models/quantize.py)
    b = inputs_embeds.shape[0]
    h, kh, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    inv = llama_inv_freq(cfg)
    wp = cache.write_pos
    pos = cache.prompt_lens + (wp - prompt_pad)
    cos, sin = rope_cos_sin(pos[:, None], inv)  # (B, 1, Dh)
    cosq = jnp.tile(cos[:, 0], (1, h))   # (B, H*Dh) — same angles per head
    sinq = jnp.tile(sin[:, 0], (1, h))
    cosk = jnp.tile(cos[:, 0], (1, kh))
    sink = jnp.tile(sin[:, 0], (1, kh))
    eps = cfg.rms_norm_eps

    def body(l, carry):
        x, k_all, v_all = carry  # x: (B, D)
        if q8:
            qf, kf, vf = layer_qkv_norm_rope_q8(
                x, blocks["attn_norm"],
                blocks["wq_q8"], blocks["wq_scale"],
                blocks["wk_q8"], blocks["wk_scale"],
                blocks["wv_q8"], blocks["wv_scale"],
                cosq, sinq, cosk, sink, l, eps=eps, head_dim=dh,
                interpret=interpret,
            )
        else:
            qf, kf, vf = layer_qkv_norm_rope(
                x, blocks["attn_norm"], blocks["wq"], blocks["wk"], blocks["wv"],
                cosq, sinq, cosk, sink, l, eps=eps, head_dim=dh,
                interpret=interpret,
            )
        x, k_all, v_all = decode_attention_wo(
            qf.reshape(b, h, dh), k_all, v_all,
            kf.reshape(b, kh, dh).astype(k_all.dtype),
            vf.reshape(b, kh, dh).astype(v_all.dtype),
            blocks["wo_q8"] if q8 else blocks["wo"], x, l,
            prompt_lens=cache.prompt_lens, write_pos=wp,
            prompt_pad=prompt_pad,
            wo_scale=blocks["wo_scale"] if q8 else None,
            interpret=interpret,
        )
        if q8:
            x = layer_mlp_residual_q8(
                x, blocks["mlp_norm"],
                blocks["w_gate_q8"], blocks["w_gate_scale"],
                blocks["w_up_q8"], blocks["w_up_scale"],
                blocks["w_down_q8"], blocks["w_down_scale"],
                l, eps=eps, interpret=interpret,
            )
        else:
            x = layer_mlp_residual(
                x, blocks["mlp_norm"], blocks["w_gate"], blocks["w_up"],
                blocks["w_down"], l, eps=eps, interpret=interpret,
            )
        return (x, k_all, v_all)

    x, new_k, new_v = jax.lax.fori_loop(
        0, cfg.num_layers, body, (inputs_embeds[:, 0], cache.k, cache.v)
    )
    return x[:, None], KVCache(
        k=new_k, v=new_v, prompt_lens=cache.prompt_lens, write_pos=wp + 1
    )


def llama_decode_step_paged(
    params: dict,
    cfg: TextConfig,
    inputs_embeds: jnp.ndarray,  # (B, 1, D) — B = engine slots
    k_pool: jnp.ndarray,  # (L, K, N, PS, Dh) page pools (serve/paged_cache.py)
    v_pool: jnp.ndarray,
    block_table: jnp.ndarray,  # (B, MP) int32
    seq_lens: jnp.ndarray,     # (B,) int32 cached tokens per slot (pre-step)
    active: jnp.ndarray,       # (B,) bool
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One decode step against the paged KV pool (continuous batching: every
    slot has its own length — no shared write_pos like KVCache).

    The new token's K/V lands at position seq_lens[b] (page
    block_table[b, seq_lens//PS], offset seq_lens%PS); inactive slots write
    the reserved trash page 0. Returns (hidden (B,1,D), k_pool, v_pool) —
    callers thread the pools (donated in the engine's jit) and bump seq_lens
    host-side.

    The layer loop is a STATIC Python unroll (not fori_loop): a traced layer
    index would dynamic-slice a pool slab per layer (whole-pool reads —
    the defensive-copy trap documented in llama_decode_step), whereas static
    layer offsets keep every pool access a scatter/gather of just the
    touched pages.
    """
    b = inputs_embeds.shape[0]
    h, kh, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    ps = k_pool.shape[3]
    inv = llama_inv_freq(cfg)
    cos, sin = rope_cos_sin(seq_lens[:, None], inv)  # new token position
    eps = cfg.rms_norm_eps
    rows = jnp.arange(b)
    pid = jnp.where(active, block_table[rows, seq_lens // ps], 0)
    off = jnp.where(active, seq_lens % ps, 0)
    post_lens = seq_lens + 1  # attention covers the token being written

    def attend(q, kl, vl):
        # the XLA page-gather + fused masked attention is the measured
        # winner on this chip (ops/paged_attention.py module docstring)
        from ..ops.paged_attention import paged_attention_reference

        return paged_attention_reference(q, kl, vl, block_table, post_lens)

    x = inputs_embeds
    for l in range(cfg.num_layers):
        bp = jax.tree_util.tree_map(lambda p: p[l], params["blocks"])
        y = rms_norm(x, bp["attn_norm"], eps)
        q, k, v = _qkv(cfg, bp, y, cos, sin)  # (B,1,H,Dh)/(B,1,K,Dh)
        # NB: integer l + slice + advanced (pid, off) -> numpy moves the
        # advanced (B,) dims to the FRONT: the indexed target is (B, K, Dh)
        k_pool = k_pool.at[l, :, pid, off].set(k[:, 0].astype(k_pool.dtype))
        v_pool = v_pool.at[l, :, pid, off].set(v[:, 0].astype(v_pool.dtype))
        a = attend(q[:, 0], k_pool[l], v_pool[l])  # (B, H, Dh)
        x = x + _proj(bp, "wo", a.reshape(b, 1, -1))
        y = rms_norm(x, bp["mlp_norm"], eps)
        x = x + _mlp(bp, y)
    return x, k_pool, v_pool


def llama_decode_step_paged_fused(
    params: dict,
    cfg: TextConfig,
    inputs_embeds: jnp.ndarray,  # (B, 1, D) — B = engine slots
    k_pool: jnp.ndarray,  # (L, K, N, PS, Dh) page pools
    v_pool: jnp.ndarray,
    block_table: jnp.ndarray,  # (B, MP) int32
    seq_lens: jnp.ndarray,     # (B,) int32 cached tokens per slot (pre-step)
    active: jnp.ndarray,       # (B,) bool
    *,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Paged decode step with layer-indexed weight streaming (+ optional int8).

    Same contract as llama_decode_step_paged, but every weight matrix streams
    from HBM exactly once per step via the scalar-prefetch kernels in
    ops/layer_matmul.py (the round-1 paged step used plain XLA matmuls on
    static per-layer slices — ~3.9x the weight traffic, docs/PERF_NOTES.md
    addendum 2). The layer loop stays a static Python unroll so pool
    scatter/gather touches only live pages; attention remains the XLA gather
    path (page reads fuse into the einsum).

    Activations are row-padded to >= 8 so the Pallas matmul blocks hit full
    sublanes even at small slot counts; pads are sliced off for attention
    and pool writes.
    """
    from ..ops.layer_matmul import (
        layer_matmul,
        layer_matmul_q8,
        layer_qkv,
        layer_qkv_q8,
        layer_swiglu,
        layer_swiglu_q8,
    )
    from ..ops.paged_attention import paged_attention_reference

    if interpret is None:
        interpret = not is_tpu()
    blocks = params["blocks"]
    q8 = "wq_q8" in blocks  # int8 decode weights present (models/quantize.py)
    b = inputs_embeds.shape[0]
    h, kh, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    ps = k_pool.shape[3]
    inv = llama_inv_freq(cfg)
    cos, sin = rope_cos_sin(seq_lens[:, None], inv)  # new token position
    eps = cfg.rms_norm_eps
    rows = jnp.arange(b)
    pid = jnp.where(active, block_table[rows, seq_lens // ps], 0)
    off = jnp.where(active, seq_lens % ps, 0)
    post_lens = seq_lens + 1  # attention covers the token being written

    bp = max(b, 8)
    x = inputs_embeds[:, 0]  # (B, D)
    if bp != b:
        x = jnp.pad(x, ((0, bp - b), (0, 0)))

    def pad_rows(t):
        return t if bp == b else jnp.pad(t, ((0, bp - b), (0, 0)))

    for l in range(cfg.num_layers):
        li = jnp.asarray(l, jnp.int32)
        y = rms_norm(x, blocks["attn_norm"][l], eps)  # (Bp, D)
        if q8:
            qf, kf, vf = layer_qkv_q8(
                y, blocks["wq_q8"], blocks["wq_scale"],
                blocks["wk_q8"], blocks["wk_scale"],
                blocks["wv_q8"], blocks["wv_scale"], li, interpret=interpret)
        else:
            qf, kf, vf = layer_qkv(
                y, blocks["wq"], blocks["wk"], blocks["wv"], li,
                interpret=interpret)
        q = apply_rope(qf[:b].reshape(b, 1, h, dh), cos, sin)[:, 0]  # (B,H,Dh)
        k = apply_rope(kf[:b].reshape(b, 1, kh, dh), cos, sin)[:, 0]
        v = vf[:b].reshape(b, kh, dh)
        # integer l + slice + advanced (pid, off): advanced (B,) dims move to
        # the FRONT -> the indexed target is (B, K, Dh)
        k_pool = k_pool.at[l, :, pid, off].set(k.astype(k_pool.dtype))
        v_pool = v_pool.at[l, :, pid, off].set(v.astype(v_pool.dtype))
        a = paged_attention_reference(q, k_pool[l], v_pool[l],
                                      block_table, post_lens)  # (B, H, Dh)
        ap = pad_rows(a.reshape(b, h * dh))
        if q8:
            x = x + layer_matmul_q8(
                ap, blocks["wo_q8"], blocks["wo_scale"], li, interpret=interpret)
            y = rms_norm(x, blocks["mlp_norm"][l], eps)
            act = layer_swiglu_q8(
                y, blocks["w_gate_q8"], blocks["w_gate_scale"],
                blocks["w_up_q8"], blocks["w_up_scale"], li, interpret=interpret)
            x = x + layer_matmul_q8(
                act, blocks["w_down_q8"], blocks["w_down_scale"], li,
                interpret=interpret)
        else:
            x = x + layer_matmul(ap, blocks["wo"], li, interpret=interpret)
            y = rms_norm(x, blocks["mlp_norm"][l], eps)
            act = layer_swiglu(y, blocks["w_gate"], blocks["w_up"], li,
                               interpret=interpret)
            x = x + layer_matmul(act, blocks["w_down"], li, interpret=interpret)
    return x[:b][:, None], k_pool, v_pool


def embed_tokens(params: dict, input_ids: jnp.ndarray, dtype=jnp.bfloat16,
                 mesh=None) -> jnp.ndarray:
    """Token embedding lookup.

    mesh: when given, the (vocab, D)-sharded table is explicitly constrained
    to replicated BEFORE the gather — the standard fsdp all-gather-before-use
    — and the output to batch sharding. Without this, GSPMD keeps the
    gather's output sharded on the hidden dim (inherited from the table) and
    then pays an 'involuntary full rematerialization' reshard to reach the
    (batch, seq)-sharded activation layout (observed in MULTICHIP_r03.json).
    """
    table = params.get("embed")
    if table is None:
        # serving-only weights with tied embeddings: the bf16 table was
        # dropped; the (V, D) int8 head with per-vocab-row scales doubles as
        # the lookup table (gather int8 rows -> half the HBM read, then
        # scale). quantize_decode_weights only drops 'embed' in the tied
        # case, where lm_head_q8 has exactly this orientation.
        q8 = params["lm_head_q8"]
        # tied layout <=> per-vocab-row scales (V, 1); the untied (1, V)
        # scale shape can never satisfy this (see lm_logits layout note)
        assert params["lm_head_scale"].shape[-1] == 1, (
            "embed fallback needs the tied (V, D) head layout"
        )
        rows = q8[input_ids].astype(dtype)
        return rows * params["lm_head_scale"][input_ids].astype(dtype)
    table = table.astype(dtype)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        table = jax.lax.with_sharding_constraint(
            table, NamedSharding(mesh, P(None, None))
        )
        out = table[input_ids]
        # only the dp axes the mesh actually has (a pipe-only training
        # mesh carries neither)
        dp = tuple(a for a in ("data", "fsdp") if a in mesh.axis_names)
        return jax.lax.with_sharding_constraint(
            out, NamedSharding(mesh, P(dp or None, None, None))
        )
    return table[input_ids]


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
    q8 = params.get("lm_head_q8")
    if q8 is not None:
        # int8 head (models/quantize.py): XLA fuses the int8->bf16 convert
        # into the matmul read, so HBM traffic halves vs the bf16 head —
        # the head is the largest per-decode-step weight read. Per-row
        # scales are constant along the contraction, applied to the f32
        # logits after the dot.
        scale = params["lm_head_scale"]
        # Layout resolution via the SCALE's shape, not the weight's: the
        # tied layout quantizes (V, D) along D -> scale (V, 1); the untied
        # layout quantizes (D, V) along D -> scale (1, V). Inferring from
        # q8.shape[0] != hidden would silently mispick when padded vocab ==
        # hidden size; the scale shapes can never collide (V >= 256 > 1).
        tied_layout = scale.shape[-1] == 1
        if tied_layout:  # tied-embed layout (V, D)
            logits = jnp.einsum(
                "...d,vd->...v", x, q8.astype(x.dtype),
                preferred_element_type=jnp.float32,
            ) * scale.reshape(-1)
        else:  # untied (D, V)
            logits = jnp.einsum(
                "...d,dv->...v", x, q8.astype(x.dtype),
                preferred_element_type=jnp.float32,
            ) * scale.reshape(-1)
    elif head is None:
        # tied embeddings: contract against (V, D) directly — never
        # materialize the 0.5 GB transpose (this runs every decode step)
        logits = jnp.einsum(
            "...d,vd->...v", x, params["embed"].astype(x.dtype),
            preferred_element_type=jnp.float32,
        )
    else:
        logits = jnp.einsum(
            "...d,dv->...v", x, head.astype(x.dtype),
            preferred_element_type=jnp.float32,
        )
    v_rows = logits.shape[-1]
    if valid_vocab is not None and valid_vocab < v_rows:
        mask = jnp.arange(v_rows) < valid_vocab
        logits = jnp.where(mask, logits, NEG_INF)
    return logits
