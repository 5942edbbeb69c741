"""Self-speculative greedy decoding: shallow-prefix draft + batched verify.

Decode on one chip is HBM-bandwidth-bound — every generated token streams
all decoder weights once (docs/PERF_NOTES.md round-3 addendum 4). A
multi-token VERIFY step streams those same weights ONCE for gamma+1
positions, so if a cheap draft can guess the next gamma greedy tokens with
accept rate a, tokens/step rises from 1 to ~(1 + a*gamma) at roughly
(1 + gamma*k/L) times the bandwidth of a single step — net win whenever
the draft is predictive (VERDICT r3 next #9).

The draft here is the model's own first `draft_layers` decoder layers +
the shared final-norm/LM-head (self-speculative: no second model, no extra
weights, the shallow layers' K/V live in the same cache and are simply
overwritten by the verify pass, which recomputes identical values for
those columns). Output is EXACTLY the base model's greedy trajectory by
construction: a draft token is kept only when it equals the full model's
argmax at that position, and the first mismatch is replaced by it.

Single-request only (B=1): per-row variable acceptance breaks the shared
scalar write_pos the cache design relies on (models/llama.py:35-44);
batched serving keeps the dense-window engine (serve/engine.py) and this
path targets latency-bound single-stream decode.

No reference counterpart (HF generate decodes one token at a time,
hf_models/modeling_gar.py:418-427); the technique follows the
self-speculative / early-exit drafting literature (Draft&Verify,
LayerSkip) re-built on the two-interval TPU cache.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import EOT_TOKEN_ID, GARConfig, TextConfig
from ..ops.attention import NEG_INF
from ..ops.norms import rms_norm
from ..ops.rope import llama_inv_freq, rope_cos_sin
from .gar import GARBatch, gar_prefill, seed_cache_from_prefill
from .llama import _mlp, _proj, _qkv, embed_tokens, lm_logits


class SpecStats(NamedTuple):
    rounds: jnp.ndarray          # () rounds executed
    drafted: jnp.ndarray         # () draft tokens proposed (gamma per round)
    accepted: jnp.ndarray        # () draft tokens accepted AND committed —
    #   eot-truncated rounds count only the drafts emitted before the eot,
    #   so accepted/drafted is the realized (speedup-relevant) accept rate


class SpecResult(NamedTuple):
    tokens: jnp.ndarray          # (1, max_new_tokens)
    num_generated: jnp.ndarray   # (1,)
    stats: SpecStats


def _chunk_attention(
    q: jnp.ndarray,        # (B, C, H, Dh) rope'd queries
    k_cache: jnp.ndarray,  # (B, K, S, Dh) one layer, chunk already written
    v_cache: jnp.ndarray,
    *,
    prompt_lens: jnp.ndarray,
    write_pos: jnp.ndarray,  # () column of chunk row 0
    prompt_pad: int,
) -> jnp.ndarray:
    """Multi-token decode attention: chunk row c attends the two-interval
    cache [0, prompt_lens) u [prompt_pad, write_pos + c]. The (C, S)
    logits block is tiny (C = gamma+1)."""
    b, c, h, d = q.shape
    kh, s = k_cache.shape[1], k_cache.shape[2]
    g = h // kh
    qf = (q * jnp.asarray(d ** -0.5, q.dtype)).reshape(b, c, kh, g, d)
    logits = jnp.einsum(
        "bckgd,bksd->bckgs", qf, k_cache, preferred_element_type=jnp.float32
    )
    ids = jnp.arange(s)[None, None, :]                       # (1, 1, S)
    row_end = write_pos + jnp.arange(c)[None, :, None]       # (1, C, 1)
    valid = (ids < prompt_lens[:, None, None]) | (
        (ids >= prompt_pad) & (ids <= row_end)
    )                                                        # (B, C, S)
    logits = jnp.where(valid[:, :, None, None, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bckgs,bksd->bckgd", probs.astype(v_cache.dtype), v_cache,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, c, h, d).astype(q.dtype)


def _layer_step(
    cfg: TextConfig,
    bp: dict,
    x: jnp.ndarray,          # (B, C, D)
    k_all: jnp.ndarray,      # (L, B, K, S, Dh)
    v_all: jnp.ndarray,
    layer: jnp.ndarray,      # () layer index
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    *,
    prompt_lens: jnp.ndarray,
    write_pos: jnp.ndarray,
    prompt_pad: int,
):
    """One decoder layer over a C-token chunk with in-place cache append."""
    b, c, _ = x.shape
    eps = cfg.rms_norm_eps
    y = rms_norm(x, bp["attn_norm"], eps)
    q, k, v = _qkv(cfg, bp, y, cos, sin)     # (B,C,H,Dh), (B,C,K,Dh)
    k_all = jax.lax.dynamic_update_slice(
        k_all, k.transpose(0, 2, 1, 3).astype(k_all.dtype)[None],
        (layer, 0, 0, write_pos, 0),
    )
    v_all = jax.lax.dynamic_update_slice(
        v_all, v.transpose(0, 2, 1, 3).astype(v_all.dtype)[None],
        (layer, 0, 0, write_pos, 0),
    )
    a = _chunk_attention(
        q, k_all[layer], v_all[layer],
        prompt_lens=prompt_lens, write_pos=write_pos, prompt_pad=prompt_pad,
    )
    x = x + _proj(bp, "wo", a.reshape(b, c, -1))
    y = rms_norm(x, bp["mlp_norm"], eps)
    x = x + _mlp(bp, y)
    return x, k_all, v_all


def _forward_chunk(
    llm: dict,
    cfg: TextConfig,
    tokens: jnp.ndarray,     # (B, C)
    cache_k: jnp.ndarray,
    cache_v: jnp.ndarray,
    *,
    prompt_lens: jnp.ndarray,
    write_pos: jnp.ndarray,
    prompt_pad: int,
    num_layers: int,
    compute_dtype=jnp.bfloat16,
):
    """Run `num_layers` decoder layers over a token chunk, appending K/V at
    [write_pos, write_pos + C). num_layers < L is the shallow draft;
    num_layers == L is the verify pass."""
    c = tokens.shape[1]
    x = embed_tokens(llm, tokens, compute_dtype)
    inv = llama_inv_freq(cfg)
    pos = (prompt_lens[:, None] - prompt_pad + write_pos) + jnp.arange(c)[None]
    cos, sin = rope_cos_sin(pos, inv)

    def body(l, carry):
        x, k_all, v_all = carry
        bp = jax.tree_util.tree_map(lambda p: p[l], llm["blocks"])
        x, k_all, v_all = _layer_step(
            cfg, bp, x, k_all, v_all, l, cos, sin,
            prompt_lens=prompt_lens, write_pos=write_pos,
            prompt_pad=prompt_pad,
        )
        return (x, k_all, v_all)

    x, cache_k, cache_v = jax.lax.fori_loop(
        0, num_layers, body, (x, cache_k, cache_v)
    )
    return x, cache_k, cache_v


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "max_new_tokens", "gamma", "draft_layers", "eot_id", "pad_id",
        "mask_compat", "use_flash",
    ),
)
def generate_speculative(
    params: dict,
    cfg: GARConfig,
    batch: GARBatch,
    prompt_lens: jnp.ndarray,   # (1,)
    *,
    max_new_tokens: int = 1024,
    gamma: int = 4,
    draft_layers: int = 4,
    eot_id: int = EOT_TOKEN_ID,
    pad_id: int = 0,
    mask_compat: bool = True,
    use_flash: Optional[bool] = None,
) -> SpecResult:
    """Greedy generation with self-speculative draft/verify. Token output
    is bit-identical to models/generate.generate(temperature=0) — asserted
    by tests/test_speculative.py."""
    b, s = batch.input_ids.shape
    assert b == 1, "speculative decode is single-stream (shared write_pos)"
    t = cfg.text
    assert 0 < draft_layers <= t.num_layers

    hidden, kv = gar_prefill(
        params, cfg, batch, mask_compat=mask_compat, use_flash=use_flash
    )
    last_hidden = hidden[jnp.arange(b), prompt_lens - 1]
    tok0 = jnp.argmax(
        lm_logits(params["llm"], t, last_hidden,
                  valid_vocab=cfg.extended_vocab_size),
        axis=-1,
    ).astype(jnp.int32)

    max_len = ((s + max_new_tokens + gamma + 511) // 512) * 512
    cache = seed_cache_from_prefill(cfg, kv, prompt_lens, max_len, paired=False)
    llm = params["llm"]
    out_w = max_new_tokens + gamma + 1  # a round may overshoot; trimmed below

    class State(NamedTuple):
        k: jnp.ndarray
        v: jnp.ndarray
        wp: jnp.ndarray
        cur: jnp.ndarray
        out: jnp.ndarray
        step: jnp.ndarray
        done: jnp.ndarray
        rounds: jnp.ndarray
        accepted: jnp.ndarray

    out0 = jnp.full((1, out_w), pad_id, jnp.int32)
    out0 = out0.at[:, 0].set(tok0)
    init = State(
        k=cache.k, v=cache.v, wp=cache.write_pos, cur=tok0, out=out0,
        step=jnp.asarray(1, jnp.int32), done=jnp.all(tok0 == eot_id),
        rounds=jnp.asarray(0, jnp.int32), accepted=jnp.asarray(0, jnp.int32),
    )

    def cond(st: State):
        return (st.step < max_new_tokens) & ~st.done

    def round_body(st: State):
        # ---- draft: gamma single-token steps through the first k layers
        def draft_step(carry, j):
            tok, k_all, v_all = carry
            h, k_all, v_all = _forward_chunk(
                llm, t, tok[:, None], k_all, v_all,
                prompt_lens=cache.prompt_lens, write_pos=st.wp + j,
                prompt_pad=s, num_layers=draft_layers,
            )
            logits = lm_logits(llm, t, h[:, 0],
                               valid_vocab=cfg.extended_vocab_size)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (nxt, k_all, v_all), nxt

        (_, k1, v1), drafts = jax.lax.scan(
            draft_step, (st.cur, st.k, st.v), jnp.arange(gamma)
        )  # drafts: (gamma, 1)
        drafts = drafts.T  # (1, gamma)

        # ---- verify: one full-depth step over [cur, d_1..d_gamma];
        # overwrites the draft layers' K/V with identical values
        chunk = jnp.concatenate([st.cur[:, None], drafts], axis=1)
        h, k2, v2 = _forward_chunk(
            llm, t, chunk, k1, v1,
            prompt_lens=cache.prompt_lens, write_pos=st.wp,
            prompt_pad=s, num_layers=t.num_layers,
        )
        targets = jnp.argmax(
            lm_logits(llm, t, h, valid_vocab=cfg.extended_vocab_size), axis=-1
        ).astype(jnp.int32)  # (1, gamma+1): full-model greedy continuations

        match = drafts == targets[:, :gamma]
        n_acc = jnp.cumprod(match.astype(jnp.int32), axis=1).sum()  # ()
        m = n_acc + 1  # tokens emitted this round (accepted + correction)

        # eot: emit only up to (and including) the first eot
        emit_ids = jnp.arange(gamma + 1)
        is_eot = (targets[0] == eot_id) & (emit_ids < m)
        first_eot = jnp.argmax(is_eot)
        hit_eot = jnp.any(is_eot)
        m = jnp.where(hit_eot, first_eot + 1, m).astype(jnp.int32)

        emit = jnp.where(emit_ids < m, targets[0], pad_id)[None]
        out = jax.lax.dynamic_update_slice(st.out, emit, (0, st.step))
        new_cur = targets[0, m - 1][None]  # (1,) next input token
        return State(
            k=k2, v=v2, wp=st.wp + m, cur=new_cur, out=out,
            step=st.step + m, done=st.done | hit_eot,
            # m - 1 = drafts actually committed (== n_acc unless the round
            # was eot-truncated, in which case only m - 1 of them shipped)
            rounds=st.rounds + 1, accepted=st.accepted + m - 1,
        )

    fin = jax.lax.while_loop(cond, round_body, init)

    toks = fin.out[:, :max_new_tokens]
    is_eot = toks == eot_id
    any_eot = jnp.any(is_eot, axis=-1)
    first = jnp.argmax(is_eot, axis=-1)
    num = jnp.where(any_eot, first + 1, jnp.minimum(fin.step, max_new_tokens))
    # pad everything after the first eot (overshoot rounds may have written
    # past it before `done` stopped the loop)
    keep = jnp.arange(max_new_tokens)[None] < num[:, None]
    toks = jnp.where(keep, toks, pad_id)
    return SpecResult(
        tokens=toks,
        num_generated=num.astype(jnp.int32),
        stats=SpecStats(
            rounds=fin.rounds,
            drafted=fin.rounds * gamma,
            accepted=fin.accepted,
        ),
    )
