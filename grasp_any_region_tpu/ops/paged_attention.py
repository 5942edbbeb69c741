"""Paged attention for continuous-batching decode.

The reference serves GAR through HF `generate` with one contiguous KV cache
per request batch (hf_models/modeling_gar.py:418-427) — no paging, batch
size 1 in every demo/eval. Paging (vLLM-style block tables; the reference
only ever meets it in its *judge* server, serve_judge.sh) is what lets a
serving engine admit/retire requests continuously without reshaping the
cache: KV lives in fixed (page_size)-token pages in a global pool, and each
sequence owns an ordered list of page ids (its block table).

`paged_attention_reference` — a pure-XLA gather of the sequence's pages
followed by masked attention — IS the production path, on measurement, not
as a fallback. The gather touches only the sequence's own pages
(B * max_pages * page_size tokens) and XLA fuses it with the attention
einsum. A Pallas paged-attention kernel was built twice and lost twice on
this chip (in-jit 256-call loop, ONE fetch, serving shapes B=8, 80-page
tables, ~5k tokens):

  * round 2: 1 page (8 KB) per grid program — 24 ms vs 12.5 ms/step
    (DMA-latency bound);
  * round 3: 8 pages DMA'd concurrently per program as independent block
    operands — 2194 us vs 228 us/call (the per-(slot, kv-head) grid
    re-streams page operands and Mosaic cannot coalesce the 16 separate
    8 KB operand DMAs into the long contiguous bursts the XLA gather
    gets).

The XLA gather sits ~2.2x from the 84 MB/call bandwidth floor (102 us) —
a custom kernel could in principle win, but per docs/PERF_NOTES.md the
windowed serving path (serve/engine.py) gathers pages into a DENSE cache
once per window and decodes with the fused dense kernels, so the
per-token paged path only serves latency-critical decode_chunk=1 mode.
The kernel was deleted rather than shipped disabled.

Layout: pages are (page_size, D) slabs per kv head — head-major like
models/llama.KVCache — so each gather streams contiguous memory.

Query convention: q is the current token for each slot; `seq_lens[b]` counts
ALL cached tokens including the current one (its K/V must be appended before
calling). Positions >= seq_lens are masked; causality is implicit (nothing
newer than the query exists in the cache).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

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
