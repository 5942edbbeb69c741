"""Jitted generation loop (greedy + temperature sampling).

Replaces the reference's HF GenerationMixin python loop
(hf_models/modeling_gar.py:418-427 -> transformers greedy search) with a
single compiled function: multimodal prefill, cache seeding, and a
`lax.while_loop` decode with per-sample early-exit on <|eot_id|>. All
reference evals decode greedily with max_new_tokens=1024
(GAR-Bench/inference.py:158-167).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core.config import EOT_TOKEN_ID, GARConfig
from .gar import GARBatch, gar_decode_step, gar_prefill, seed_cache_from_prefill
from .llama import KVCache, lm_logits


class GenerationResult(NamedTuple):
    tokens: jnp.ndarray  # (B, max_new_tokens) generated ids, pad after eot
    num_generated: jnp.ndarray  # (B,) count including the eot token


def _sample(logits: jnp.ndarray, rng: Optional[jax.Array], temperature: float) -> jnp.ndarray:
    if temperature == 0.0 or rng is None:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return jax.random.categorical(rng, logits / temperature, axis=-1).astype(jnp.int32)


@partial(
    jax.jit,
    static_argnames=(
        "cfg",
        "max_new_tokens",
        "eot_id",
        "pad_id",
        "temperature",
        "mask_compat",
        "double_scale_compat",
        "use_flash",
        "video_mode",
        "mesh",
        "quantize_kv",
    ),
)
def generate(
    params: dict,
    cfg: GARConfig,
    batch: GARBatch,
    prompt_lens: jnp.ndarray,  # (B,) true prompt lengths
    *,
    max_new_tokens: int = 1024,
    eot_id: int = EOT_TOKEN_ID,
    pad_id: int = 0,
    temperature: float = 0.0,
    rng: Optional[jax.Array] = None,
    mask_compat: bool = True,
    double_scale_compat: bool = True,
    use_flash: Optional[bool] = None,
    video_mode: bool = False,
    mesh=None,
    quantize_kv: bool = False,
) -> GenerationResult:
    """mesh (static): multi-chip inference. Weights follow their
    parallel/sharding.py placement (device_put them with shard_params
    before calling); the KV cache is constrained kv-head-sharded on
    'tensor' so every decode step stays partitioned instead of gathering.
    Token-for-token parity with the single-device path is asserted by
    tests/test_tp_inference.py on the virtual CPU mesh."""
    b, s = batch.input_ids.shape
    # non-SP multi-chip prefill keeps the flash kernel: mha wraps the
    # pallas_call in shard_map under a multi-device mesh (ops/attention.py
    # _flash_sharded) — GSPMD alone cannot partition a Mosaic kernel
    hidden, kv = gar_prefill(
        params, cfg, batch,
        mask_compat=mask_compat, double_scale_compat=double_scale_compat,
        use_flash=use_flash, video_mode=video_mode, mesh=mesh,
    )
    last_hidden = hidden[jnp.arange(b), prompt_lens - 1]  # (B, D)
    logits0 = lm_logits(
        params["llm"], cfg.text, last_hidden, valid_vocab=cfg.extended_vocab_size
    )
    rng0 = rng if rng is not None else jax.random.PRNGKey(0)
    tok0 = _sample(logits0, rng0, temperature)

    # cache columns rounded up so the decode kernel's block size divides them
    max_len = ((s + max_new_tokens + 511) // 512) * 512
    from .llama import paired_cache_wanted

    paired = mesh is None and paired_cache_wanted(cfg.text)
    cache = seed_cache_from_prefill(
        cfg, kv, prompt_lens, max_len,
        # head-paired layout for the single-chip fused decode kernels
        # (multi-chip shards kv heads over 'tensor' — keep them unpaired)
        paired=paired,
        # int8 KV (paired layouts only): halves the decode-attention HBM
        # stream; the fused kernel dequantizes per block and quantizes the
        # appended column with the cache's static scales
        quantize_kv=quantize_kv and paired,
    )
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.sharding import sanitize_spec

        # (L, B, K, S, D): batch over data/fsdp, kv heads over tensor
        kv_spec = sanitize_spec(
            P(None, ("data", "fsdp"), "tensor", None, None),
            cache.k.shape, mesh,
        )
        shard = NamedSharding(mesh, kv_spec)
        cache = cache._replace(
            k=jax.lax.with_sharding_constraint(cache.k, shard),
            v=jax.lax.with_sharding_constraint(cache.v, shard),
        )

    class State(NamedTuple):
        cache: KVCache
        cur: jnp.ndarray  # (B,)
        out: jnp.ndarray  # (B, max_new)
        step: jnp.ndarray  # ()
        done: jnp.ndarray  # (B,)
        rng: jax.Array

    out0 = jnp.full((b, max_new_tokens), pad_id, jnp.int32)
    out0 = out0.at[:, 0].set(tok0)
    init = State(
        cache=cache,
        cur=tok0,
        out=out0,
        step=jnp.asarray(1, jnp.int32),
        done=tok0 == eot_id,
        rng=rng0,
    )

    def cond(st: State):
        return (st.step < max_new_tokens) & (~jnp.all(st.done))

    def body(st: State):
        logits, cache = gar_decode_step(
            params, cfg, st.cur, st.cache, s,
            # Pallas megakernels are single-chip; GSPMD partitions the XLA
            # step across the mesh instead
            use_kernel=False if mesh is not None else None,
        )
        key, sub = jax.random.split(st.rng)
        nxt = _sample(logits, sub, temperature)
        nxt = jnp.where(st.done, pad_id, nxt)
        out = st.out.at[:, st.step].set(nxt)
        done = st.done | (nxt == eot_id)
        return State(cache=cache, cur=nxt, out=out, step=st.step + 1, done=done, rng=key)

    final = jax.lax.while_loop(cond, body, init)
    toks = final.out
    # count tokens up to and including first eot (or max_new)
    is_eot = toks == eot_id
    any_eot = jnp.any(is_eot, axis=-1)
    first_eot = jnp.argmax(is_eot, axis=-1)
    num = jnp.where(any_eot, first_eot + 1, max_new_tokens)
    return GenerationResult(tokens=toks, num_generated=num.astype(jnp.int32))
