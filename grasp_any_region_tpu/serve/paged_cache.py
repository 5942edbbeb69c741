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

    def body(j, pools):
        kq, vq = pools
        pid = page_ids[j]
        kq = kq.at[:, :, pid].set(kp[:, :, j])
        vq = vq.at[:, :, pid].set(vp[:, :, j])
        return kq, vq

    return jax.lax.fori_loop(0, mp, body, (k_pool, v_pool))


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
