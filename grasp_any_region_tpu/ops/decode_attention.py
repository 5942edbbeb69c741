"""Pallas TPU decode attention: one query token against a static KV cache.

The decode step is HBM-bandwidth-bound (it must stream the whole cache per
token); this kernel reads each (S, D) KV head slice exactly once into VMEM,
computes the online softmax in fp32, and never materializes repeated GQA
heads (the XLA reference path broadcasts K/V to all query heads).

Cache layout (see models/llama.KVCache): columns [0, prompt_lens[b]) hold
the row's prompt K/V (right-padded region [prompt_lens[b], prompt_pad) is
masked); generated tokens occupy [prompt_pad, write_pos]. The loop upper
bound is write_pos+1 so the dead tail past the write column is never read.

grid = (B, K): one program per (batch row, kv head); the G = H/K query heads
that share the kv head are processed together as a (G, D) block. prompt_lens
and write_pos arrive via scalar prefetch.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -2.0 ** 30


def _decode_kernel(
    plen_ref,  # scalar prefetch: (B,) int32 prompt lengths
    wpos_ref,  # scalar prefetch: (1,) int32 write position
    q_ref,  # (G, D)
    k_ref,  # (S, D)
    v_ref,  # (S, D)
    o_ref,  # (G, D)
    *,
    scale: float,
    block_s: int,
    prompt_pad: int,
):
    b = pl.program_id(0)
    plen = plen_ref[b]
    wpos = wpos_ref[0]
    g, d = q_ref.shape
    q = q_ref[:].astype(jnp.float32) * scale

    num_s = (wpos + block_s) // block_s  # cover up to and incl. write column

    def body(si, carry):
        m_prev, l_prev, acc = carry
        k_blk = k_ref[pl.ds(si * block_s, block_s), :]
        v_blk = v_ref[pl.ds(si * block_s, block_s), :]
        s = jax.lax.dot_general(
            q, k_blk.astype(jnp.float32),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (G, BS)
        ids = si * block_s + jax.lax.broadcasted_iota(jnp.int32, (g, block_s), 1)
        ok = (ids < plen) | ((ids >= prompt_pad) & (ids <= wpos))
        s = jnp.where(ok, s, NEG_INF)
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_cur)
        alpha = jnp.exp(m_prev - m_cur)
        l_cur = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_cur, l_cur, acc

    init = (
        jnp.full((g, 1), NEG_INF, jnp.float32),
        jnp.zeros((g, 1), jnp.float32),
        jnp.zeros((g, d), jnp.float32),
    )
    m, l, acc = jax.lax.fori_loop(0, num_s, body, init)
    o_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def decode_attention(
    q: jnp.ndarray,  # (B, H, D)
    k_cache: jnp.ndarray,  # (B, K, S, D) head-major (see models/llama.KVCache)
    v_cache: jnp.ndarray,  # (B, K, S, D)
    *,
    prompt_lens: jnp.ndarray,  # (B,) int32
    write_pos: jnp.ndarray,  # () int32
    prompt_pad: int,
    scale: Optional[float] = None,
    block_s: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    b, h, d = q.shape
    _, kh, s, _ = k_cache.shape
    assert h % kh == 0
    g = h // kh
    if scale is None:
        scale = d ** -0.5
    block_s = min(block_s, s)
    assert s % block_s == 0, (
        f"cache columns {s} must be a multiple of block_s {block_s}; "
        "allocate the cache padded (padding would copy it every step)"
    )
    s_p = s

    qg = q.reshape(b, kh, g, d)
    kt = k_cache
    vt = v_cache

    kernel = functools.partial(
        _decode_kernel, scale=scale, block_s=block_s, prompt_pad=prompt_pad
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, kh),
        in_specs=[
            pl.BlockSpec((None, None, g, d), lambda bi, ki, *_: (bi, ki, 0, 0)),
            pl.BlockSpec((None, None, s_p, d), lambda bi, ki, *_: (bi, ki, 0, 0)),
            pl.BlockSpec((None, None, s_p, d), lambda bi, ki, *_: (bi, ki, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, None, g, d), lambda bi, ki, *_: (bi, ki, 0, 0)),
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kh, g, d), q.dtype),
        interpret=interpret,
    )(
        prompt_lens.astype(jnp.int32),
        write_pos.reshape(1).astype(jnp.int32),
        qg,
        kt,
        vt,
    )

    return out.reshape(b, h, d)
