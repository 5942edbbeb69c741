"""Paged attention for continuous-batching decode.

The reference serves GAR through HF `generate` with one contiguous KV cache
per request batch (hf_models/modeling_gar.py:418-427) — no paging, batch
size 1 in every demo/eval. Paging (vLLM-style block tables; the reference
only ever meets it in its *judge* server, serve_judge.sh) is what lets a
serving engine admit/retire requests continuously without reshaping the
cache: KV lives in fixed (page_size)-token pages in a global pool, and each
sequence owns an ordered list of page ids (its block table).

Two implementations, same semantics:
  * `paged_attention_reference` — pure-XLA gather of the sequence's pages
    followed by masked attention. The gather touches only the sequence's own
    pages (B * max_pages * page_size tokens), which XLA fuses with the
    attention einsum; this is the engine's default decode path.
  * `paged_attention` — Pallas kernel: grid (B*K, max_pages), block table in
    scalar-prefetch SMEM, one page DMA'd per grid step, online-softmax
    accumulation in VMEM scratch across the sequential page axis. Avoids
    materializing the gathered copy.

Layout: pages are (page_size, D) slabs per kv head — head-major like
models/llama.KVCache — so each grid step streams contiguous memory.

Query convention: q is the current token for each slot; `seq_lens[b]` counts
ALL cached tokens including the current one (its K/V must be appended before
calling). Positions >= seq_lens are masked; causality is implicit (nothing
newer than the query exists in the cache).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import NEG_INF


def paged_attention_reference(
    q: jnp.ndarray,        # (B, H, D)
    k_pages: jnp.ndarray,  # (K, N, page_size, D) — one layer's pool, head-major
    v_pages: jnp.ndarray,
    block_table: jnp.ndarray,  # (B, max_pages) int32 page ids (0 = null page)
    seq_lens: jnp.ndarray,     # (B,) int32 tokens cached incl. current
    *,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    b, h, d = q.shape
    kh, n, ps, _ = k_pages.shape
    mp = block_table.shape[1]
    g = h // kh
    if scale is None:
        scale = d ** -0.5

    k = k_pages[:, block_table]  # (K, B, MP, PS, D) — gather, no transpose
    v = v_pages[:, block_table]
    k = k.reshape(kh, b, mp * ps, d)
    v = v.reshape(kh, b, mp * ps, d)

    qf = (q * jnp.asarray(scale, q.dtype)).reshape(b, kh, g, d)
    logits = jnp.einsum(
        "bkgd,kbsd->bkgs", qf, k, preferred_element_type=jnp.float32
    )
    valid = jnp.arange(mp * ps)[None, :] < seq_lens[:, None]  # (B, MP*PS)
    logits = jnp.where(valid[:, None, None, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bkgs,kbsd->bkgd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, h, d).astype(q.dtype)


def _paged_kernel(
    bt_ref,   # (B, MP) int32 scalar-prefetch
    sl_ref,   # (B,) int32 scalar-prefetch
    q_ref,    # (G, D)
    k_ref,    # (PS, D) — the page mapped for this grid step
    v_ref,    # (PS, D)
    o_ref,    # (G, D)
    acc_ref,  # (G, D) f32
    m_ref,    # (G, 128) f32
    l_ref,    # (G, 128) f32
    *,
    scale: float,
    page_size: int,
    max_pages: int,
    kv_heads: int,
):
    p = pl.program_id(1)
    bk = pl.program_id(0)
    b = bk // kv_heads
    seq_len = sl_ref[b]

    @pl.when(p == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # live pages: ceil(seq_len / page_size); later grid steps only pass through
    n_used = (seq_len + page_size - 1) // page_size

    @pl.when(p < n_used)
    def _compute():
        q = q_ref[:].astype(jnp.float32) * scale
        s = jax.lax.dot_general(
            q, k_ref[:].astype(jnp.float32),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (G, PS)
        pos = p * page_size + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1
        )
        ok = pos < seq_len
        s = jnp.where(ok, s, NEG_INF)
        m_prev = m_ref[:, :1]
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        prob = jnp.exp(s - m_cur)
        prob = jnp.where(ok, prob, 0.0)  # guard fully-masked tail rows
        alpha = jnp.exp(m_prev - m_cur)
        l_ref[:, :1] = l_ref[:, :1] * alpha + jnp.sum(prob, -1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            prob.astype(v_ref.dtype), v_ref[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:, :1] = m_cur

    @pl.when(p == max_pages - 1)
    def _finish():
        o_ref[:] = (
            acc_ref[:] / jnp.maximum(l_ref[:, :1], 1e-30)
        ).astype(o_ref.dtype)


def paged_attention(
    q: jnp.ndarray,        # (B, H, D)
    k_pages: jnp.ndarray,  # (K, N, page_size, D) head-major pool
    v_pages: jnp.ndarray,
    block_table: jnp.ndarray,  # (B, max_pages) int32
    seq_lens: jnp.ndarray,     # (B,) int32
    *,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    b, h, d = q.shape
    kh, n, ps, _ = k_pages.shape
    mp = block_table.shape[1]
    g = h // kh
    if scale is None:
        scale = d ** -0.5

    kp, vp = k_pages, v_pages
    qh = q.reshape(b, kh, g, d)

    kernel = functools.partial(
        _paged_kernel,
        scale=scale, page_size=ps, max_pages=mp, kv_heads=kh,
    )

    def page_map(bk, p, bt, sl, k=kh):
        # clamp dead pages to the page actually listed (0 = null page);
        # the kernel skips compute for p >= n_used
        return (bk % k, bt[bk // k, p], 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b * kh, mp),
        in_specs=[
            pl.BlockSpec((None, None, g, d), lambda bk, p, bt, sl, k=kh: (bk // k, bk % k, 0, 0)),
            pl.BlockSpec((None, None, ps, d), page_map),
            pl.BlockSpec((None, None, ps, d), page_map),
        ],
        out_specs=pl.BlockSpec(
            (None, None, g, d), lambda bk, p, bt, sl, k=kh: (bk // k, bk % k, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((g, d), jnp.float32),
            pltpu.VMEM((g, 128), jnp.float32),
            pltpu.VMEM((g, 128), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kh, g, d), q.dtype),
        interpret=interpret,
    )(block_table.astype(jnp.int32), seq_lens.astype(jnp.int32), qh, kp, vp)
    return out.reshape(b, h, d)
