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
  * `paged_attention` — Pallas kernel: grid (B*K, max_pages/PB), block table
    in scalar-prefetch SMEM, PB pages DMA'd CONCURRENTLY per grid step as
    independent block operands (a single 8 KB page per step is DMA-latency
    bound), online-softmax accumulation in VMEM scratch across the
    sequential page axis. Avoids materializing the gathered copy.

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
    *refs,    # PB x (k page, v page) (PS, D) blocks, then o/acc/m/l refs
    scale: float,
    page_size: int,
    num_blocks: int,
    pages_per_block: int,
    kv_heads: int,
):
    pb = pages_per_block
    kv_refs, (o_ref, acc_ref, m_ref, l_ref) = refs[: 2 * pb], refs[2 * pb:]
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
    # bf16 operands (MXU-native); scale the f32 logits after the dot
    q = q_ref[:]

    # one grid step streams `pb` pages as independent block operands — their
    # DMAs overlap instead of paying one tiny-transfer latency per grid step
    # (the round-2 single-page kernel measured 24 ms vs 12.5 for the XLA
    # gather at 8 KB/step — docs/PERF_NOTES.md addendum 2)
    for j in range(pb):
        page_idx = p * pb + j

        @pl.when(page_idx < n_used)
        def _compute(j=j, page_idx=page_idx):
            k_ref, v_ref = kv_refs[2 * j], kv_refs[2 * j + 1]
            s = jax.lax.dot_general(
                q, k_ref[:],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # (G, PS)
            pos = page_idx * page_size + jax.lax.broadcasted_iota(
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

    @pl.when(p == num_blocks - 1)
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
    pages_per_block: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    b, h, d = q.shape
    kh, n, ps, _ = k_pages.shape
    mp = block_table.shape[1]
    g = h // kh
    if scale is None:
        scale = d ** -0.5
    pb = min(pages_per_block, mp)
    while mp % pb:
        pb -= 1
    nblk = mp // pb

    qh = q.reshape(b, kh, g, d)

    kernel = functools.partial(
        _paged_kernel,
        scale=scale, page_size=ps, num_blocks=nblk,
        pages_per_block=pb, kv_heads=kh,
    )

    def page_map(j, k=kh):
        def f(bk, p, bt, sl):
            # dead entries map to null page 0 (block tables are zero-filled
            # past the allocation); the kernel masks them out
            return (bk % k, bt[bk // k, p * pb + j], 0, 0)
        return f

    page_specs = []
    for j in range(pb):
        page_specs += [
            pl.BlockSpec((None, None, ps, d), page_map(j)),
            pl.BlockSpec((None, None, ps, d), page_map(j)),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b * kh, nblk),
        in_specs=[
            pl.BlockSpec((None, None, g, d), lambda bk, p, bt, sl, k=kh: (bk // k, bk % k, 0, 0)),
            *page_specs,
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
    operands = [block_table.astype(jnp.int32), seq_lens.astype(jnp.int32), qh]
    for _ in range(pb):
        operands += [k_pages, v_pages]
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kh, g, d), q.dtype),
        interpret=interpret,
    )(*operands)
    return out.reshape(b, h, d)
