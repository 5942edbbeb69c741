"""Paged KV cache: global page pool + block tables + host-side allocator.

Replaces the per-request contiguous KV cache the reference inherits from HF
generate (hf_models/modeling_gar.py:418-427, one fresh cache per call) with a
vLLM-style pool so a serving engine can admit and retire requests without
reallocating or reshaping device memory:

  * `PagedKV` — device state: k/v pools (L, K, N, page_size, D) — head-major
    like models/llama.KVCache so attention streams contiguous (PS, D) slabs
    with no transposes — block tables (slots, max_pages), per-slot seq_lens.
    Page 0 is a reserved trash page: unused block-table entries point at it,
    and masked/inactive writes land there, so no conditional writes are
    needed inside jit.
  * `PageAllocator` — host-side free list (the data plane never touches the
    device; page ids are just ints in block tables).
  * jitted `write_prompt_pages` / `append_token_pages` — scatter prefill K/V
    and per-step decode K/V into the pools. Donated in the engine's step
    function so XLA updates the pools in place.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class PagedKV(NamedTuple):
    k: jnp.ndarray            # (L, K, N, page_size, D)
    v: jnp.ndarray            # (L, K, N, page_size, D)
    block_table: jnp.ndarray  # (slots, max_pages) int32; 0 = null page
    seq_lens: jnp.ndarray     # (slots,) int32 cached tokens per slot

    @property
    def page_size(self) -> int:
        return self.k.shape[3]

    @property
    def max_pages(self) -> int:
        return self.block_table.shape[1]


def init_paged_kv(
    num_layers: int,
    num_pages: int,
    page_size: int,
    kv_heads: int,
    head_dim: int,
    *,
    slots: int,
    max_pages_per_slot: int,
    dtype=jnp.bfloat16,
) -> PagedKV:
    shape = (num_layers, kv_heads, num_pages, page_size, head_dim)
    return PagedKV(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        block_table=jnp.zeros((slots, max_pages_per_slot), jnp.int32),
        seq_lens=jnp.zeros((slots,), jnp.int32),
    )


class PageAllocator:
    """Host-side free list over page ids 1..N-1 (0 is the trash page)."""

    def __init__(self, num_pages: int):
        assert num_pages >= 2
        self.num_pages = num_pages
        self._free: List[int] = list(range(num_pages - 1, 0, -1))

    @property
    def free_pages(self) -> int:
        return len(self._free)

    def alloc(self, n: int) -> Optional[List[int]]:
        if n > len(self._free):
            return None
        return [self._free.pop() for _ in range(n)]

    def release(self, pages: Sequence[int]) -> None:
        for p in pages:
            assert 0 < p < self.num_pages, p
            self._free.append(int(p))


def pages_needed(tokens: int, page_size: int) -> int:
    return max(1, -(-tokens // page_size))


def write_prompt_pages(
    k_pool: jnp.ndarray,    # (L, K, N, PS, D)
    v_pool: jnp.ndarray,
    k_new: jnp.ndarray,     # (L, S, K, D) one sequence's prefill K
    v_new: jnp.ndarray,
    page_ids: jnp.ndarray,  # (MP,) int32 — unused tail entries must be 0
    seq_len: jnp.ndarray,   # () int32 true prompt length (<= S)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scatter one sequence's prompt K/V into its assigned pages.

    Pads S up to MP*PS and writes every listed page; tail pages beyond
    ceil(seq_len/PS) are id 0 (trash) so the extra writes are harmless.
    """
    l, s, kh, d = k_new.shape
    mp = page_ids.shape[0]
    ps = k_pool.shape[3]
    pad = mp * ps - s
    assert pad >= 0, f"prompt {s} exceeds page budget {mp}x{ps}"
    # (L, S, K, D) -> head-major (L, K, MP, PS, D)
    kp = jnp.pad(k_new, ((0, 0), (0, pad), (0, 0), (0, 0)))
    vp = jnp.pad(v_new, ((0, 0), (0, pad), (0, 0), (0, 0)))
    kp = kp.transpose(0, 2, 1, 3).reshape(l, kh, mp, ps, d).astype(k_pool.dtype)
    vp = vp.transpose(0, 2, 1, 3).reshape(l, kh, mp, ps, d).astype(v_pool.dtype)
    # ONE scatter for all pages (a fori of per-page .at[].set ops risks a
    # pool copy per iteration; trash-page duplicates at id 0 are harmless)
    k_pool = k_pool.at[:, :, page_ids].set(kp)
    v_pool = v_pool.at[:, :, page_ids].set(vp)
    return k_pool, v_pool


def gather_pages_dense(
    k_pool: jnp.ndarray,   # (L, K, N, PS, D)
    v_pool: jnp.ndarray,
    block_table: jnp.ndarray,  # (B, MP)
    s_base: int,           # static column budget to gather (multiple of PS)
    window: int,           # extra zero columns appended for decode writes
    paired: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather each slot's pages into a dense (L, B, K, s_base+window, D)
    cache — the two-interval KVCache layout (models/llama.KVCache) with the
    cached tokens in [0, seq_len_b) and the decode window at [s_base, ...).

    Rationale: a decode window on the dense cache runs at the in-place
    dynamic_update_slice speed of the static generate path (6.4 ms/step at
    B=8) instead of the paged scatter/gather loop cost (14-26 ms/step; see
    docs/PERF_NOTES.md round-2). One gather per window amortizes to ~0.01
    ms/step.

    paired: emit the head-PAIRED (L, B, K/2, s_base+window, 2D) layout the
    fused decode kernel streams at full 128-lane tile width (the pools
    themselves stay unpaired — the pair interleave costs one transpose per
    window, amortized like the gather itself).
    """
    ps = k_pool.shape[3]
    assert s_base % ps == 0
    n_pages = s_base // ps
    bt = block_table[:, :n_pages]
    l, kh = k_pool.shape[0], k_pool.shape[1]
    b = bt.shape[0]
    d = k_pool.shape[4]
    # total columns rounded up to 512 so the fused decode-attention kernel's
    # block size always divides (ops/decode_attention.py)
    total = ((s_base + window + 511) // 512) * 512
    pad = total - s_base

    def gather(pool):
        g = pool[:, :, bt]  # (L, K, B, n, PS, D)
        g = g.reshape(l, kh, b, s_base, d)
        if paired:
            g = g.reshape(l, kh // 2, 2, b, s_base, d)
            g = g.transpose(0, 3, 1, 4, 2, 5)  # (L, B, K/2, S, 2, D)
            g = g.reshape(l, b, kh // 2, s_base, 2 * d)
        else:
            g = g.transpose(0, 2, 1, 3, 4)
        return jnp.pad(g, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))

    return gather(k_pool), gather(v_pool)


def flush_window_pages(
    k_pool: jnp.ndarray,   # (L, K, N, PS, D)
    v_pool: jnp.ndarray,
    k_dense: jnp.ndarray,  # (L, B, K, s_base+window, D) — window cols filled
    v_dense: jnp.ndarray,
    block_table: jnp.ndarray,  # (B, MP)
    start_lens: jnp.ndarray,   # (B,) tokens cached before the window
    counts: jnp.ndarray,       # (B,) tokens decoded this window
    s_base: int,
    window: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scatter the window's new K/V (dense columns [s_base, s_base+counts_b))
    back into each slot's pages at token positions start_lens_b + j, as ONE
    vectorized scatter (a per-step fori of pool-sized .at[].set ops risks a
    pool copy per iteration); columns beyond a slot's count go to the trash
    page."""
    ps = k_pool.shape[3]
    b = block_table.shape[0]
    d = k_pool.shape[4]
    l = k_pool.shape[0]
    rows = jnp.arange(b)[:, None]            # (B, 1)
    ts = jnp.arange(window)[None, :]         # (1, T)
    mask = ts < counts[:, None]              # (B, T)
    pos = start_lens[:, None] + ts           # (B, T)
    pid = jnp.where(mask, block_table[rows, pos // ps], 0)
    off = jnp.where(mask, pos % ps, 0)

    def unpair(x):
        # head-PAIRED window slabs (L, B, K/2, T, 2D) -> (L, K, B, T, D)
        kp = x.shape[2]
        x = x.reshape(l, b, kp, window, 2, d)
        return x.transpose(0, 2, 4, 1, 3, 5).reshape(l, 2 * kp, b, window, d)

    kw = k_dense[:, :, :, s_base : s_base + window]
    vw = v_dense[:, :, :, s_base : s_base + window]
    if kw.shape[-1] == 2 * d:  # paired dense layout (gather_pages_dense)
        kn, vn = unpair(kw), unpair(vw)
    else:
        # dense window cols -> (L, K, B, T, D) to match the advanced-index
        # target
        kn, vn = kw.swapaxes(1, 2), vw.swapaxes(1, 2)
    k_pool = k_pool.at[:, :, pid, off].set(kn.astype(k_pool.dtype))
    v_pool = v_pool.at[:, :, pid, off].set(vn.astype(v_pool.dtype))
    return k_pool, v_pool


def append_token_pages(
    k_pool: jnp.ndarray,   # (L, K, N, PS, D)
    v_pool: jnp.ndarray,
    k_new: jnp.ndarray,    # (L, B, K, D) this step's K per slot
    v_new: jnp.ndarray,
    block_table: jnp.ndarray,  # (B, MP)
    write_pos: jnp.ndarray,    # (B,) int32 position the token lands at
    active: jnp.ndarray,       # (B,) bool — inactive rows write the trash page
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    ps = k_pool.shape[3]
    b = k_new.shape[1]
    page_idx = write_pos // ps
    offset = write_pos % ps
    rows = jnp.arange(b)
    pid = jnp.where(active, block_table[rows, page_idx], 0)
    offset = jnp.where(active, offset, 0)
    # advanced indices (pid, offset) are adjacent -> result dims (L, K, B, D)
    kh_new = k_new.swapaxes(1, 2)  # (L, K, B, D)
    vh_new = v_new.swapaxes(1, 2)
    k_pool = k_pool.at[:, :, pid, offset].set(kh_new.astype(k_pool.dtype))
    v_pool = v_pool.at[:, :, pid, offset].set(vh_new.astype(v_pool.dtype))
    return k_pool, v_pool
