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
    lay_ref,  # scalar prefetch: (1,) int32 layer index (used by index_map)
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
    # bf16 operands (MXU-native); scale the f32 logits after the dot
    q = q_ref[:]

    num_s = (wpos + block_s) // block_s  # cover up to and incl. write column

    def body(si, carry):
        m_prev, l_prev, acc = carry
        k_blk = k_ref[pl.ds(si * block_s, block_s), :]
        v_blk = v_ref[pl.ds(si * block_s, block_s), :]
        s = jax.lax.dot_general(
            q, k_blk,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (G, BS)
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


def _fused_kernel(
    plen_ref, wpos_ref, lay_ref,  # scalar prefetch
    q_ref,  # (G, D)
    knew_ref,  # (1, D) — (B, K, 1, D) block with B/K squeezed
    vnew_ref,  # (1, D)
    k_ref,  # (S, D) layer slab (pre-write state)
    v_ref,  # (S, D)
    o_ref,  # (G, D)
    kcol_ref,  # (8, D) aliased 8-row window of k_all containing column wpos
    vcol_ref,  # (8, D)
    *,
    scale: float,
    block_s: int,
    prompt_pad: int,
):
    b = pl.program_id(0)
    plen = plen_ref[b]
    wpos = wpos_ref[0]
    g, d = q_ref.shape
    # bf16 operands (MXU-native); scale the f32 logits after the dot
    q = q_ref[:]
    k_new = knew_ref[:].reshape(1, d)  # (1, D)
    v_new = vnew_ref[:].reshape(1, d)

    # in-place write: TPU needs >=8-row output blocks, so rewrite the aligned
    # 8-row window around wpos with only row wpos%8 replaced (old rows come
    # from the pre-write slab input, which aliases the same buffer)
    align = (wpos // 8) * 8
    old_k = k_ref[pl.ds(align, 8), :]
    old_v = v_ref[pl.ds(align, 8), :]
    row = jax.lax.broadcasted_iota(jnp.int32, (8, d), 0)
    sel = row == (wpos - align)
    kcol_ref[:] = jnp.where(sel, k_new.astype(old_k.dtype), old_k)
    vcol_ref[:] = jnp.where(sel, v_new.astype(old_v.dtype), old_v)

    num_s = (wpos + block_s - 1) // block_s  # history strictly before wpos

    def body(si, carry):
        m_prev, l_prev, acc = carry
        k_blk = k_ref[pl.ds(si * block_s, block_s), :]
        v_blk = v_ref[pl.ds(si * block_s, block_s), :]
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        ids = si * block_s + jax.lax.broadcasted_iota(jnp.int32, (g, block_s), 1)
        ok = (ids < plen) | ((ids >= prompt_pad) & (ids < wpos))
        s = jnp.where(ok, s, NEG_INF)
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_cur)
        alpha = jnp.exp(m_prev - m_cur)
        l_cur = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_cur, l_cur, acc

    init = (
        jnp.full((g, 1), NEG_INF, jnp.float32),
        jnp.zeros((g, 1), jnp.float32),
        jnp.zeros((g, d), jnp.float32),
    )
    m, l, acc = jax.lax.fori_loop(0, num_s, body, init)

    # fold in the current token (its K/V never round-trips through HBM);
    # a (G, D) x (1, D) dot trips Mosaic's vector.broadcast verifier, so
    # this single column is a VPU multiply-reduce instead of an MXU dot
    s_cur = jnp.sum(
        q.astype(jnp.float32) * k_new.astype(jnp.float32),
        axis=1, keepdims=True,
    ) * scale  # (G, 1)
    m_f = jnp.maximum(m, s_cur)
    alpha = jnp.exp(m - m_f)
    p_cur = jnp.exp(s_cur - m_f)
    l_f = l * alpha + p_cur
    acc = acc * alpha + p_cur * v_new.astype(jnp.float32)
    o_ref[:] = (acc / jnp.maximum(l_f, 1e-30)).astype(o_ref.dtype)


def _fused_kernel_paired(
    plen_ref, wpos_ref, lay_ref,  # scalar prefetch
    *refs,
    # refs (in pallas operand order):
    #   q_ref     (2G, 2D) — BLOCK-DIAGONAL embedding of kv pair p's query
    #             heads (heads 2p*G .. 2p*G+2G): head a's queries occupy
    #             rows [0, G) lanes [0, D), head b's rows [G, 2G) lanes
    #             [D, 2D); zero blocks elsewhere. Built OUTSIDE the kernel —
    #             Mosaic cannot concatenate lane-offset slices (the
    #             in-kernel build hit "result/input offset mismatch on
    #             non-concat dimension" on real TPU), and q is tiny so
    #             XLA-side construction is free.
    #   knew_ref  (1, 2D) — pair p's two new K heads packed into lanes
    #             (always bf16/f32, even for int8 caches)
    #   vnew_ref  (1, 2D)
    #   k_ref     (S, 2D) paired layer slab (pre-write state); int8 when
    #             kv_q8 (dequantized per block with the static pair scale)
    #   v_ref     (S, 2D)
    #   [kscale_ref, vscale_ref]  (1, 1) f32 — only when kv_q8
    #   o_ref     (2G, 2D) — diagonal quadrants hold the two heads'
    #             outputs; the caller extracts them (again: lane-offset
    #             slice + row concat is XLA work, not Mosaic work)
    #   kcol_ref  (win, 2D) aliased row window containing column wpos
    #   vcol_ref  (win, 2D)
    scale: float,
    block_s: int,
    prompt_pad: int,
    kv_q8: bool = False,
    win: int = 8,
):
    """Head-PAIRED fused decode attention: the cache packs two kv heads
    into the 128-lane axis ((S, 2*64) slabs) so DMA and VMEM stream full
    (8, 128) tiles — the unpaired (S, 64) layout wastes half of every tile
    and measured 2.4x its bandwidth floor (docs/PERF_NOTES.md round-3).

    The two heads share one MXU dot via a block-diagonal trick: q is
    embedded into (2G, 2D) with head a's queries in lanes [0, D) rows
    [0, G) and head b's in lanes [D, 2D) rows [G, 2G); the zero blocks
    kill the cross-head terms, so q_big @ k_blk^T yields both heads'
    logits in one (2G, BS) result. The p @ v dot computes a (2G, 2D)
    block whose diagonal (G, D) quadrants are the two heads' outputs."""
    if kv_q8:
        (q_ref, knew_ref, vnew_ref, k_ref, v_ref,
         kscale_ref, vscale_ref, o_ref, kcol_ref, vcol_ref) = refs
    else:
        (q_ref, knew_ref, vnew_ref, k_ref, v_ref,
         o_ref, kcol_ref, vcol_ref) = refs
    b = pl.program_id(0)
    plen = plen_ref[b]
    wpos = wpos_ref[0]
    g2, d2 = q_ref.shape  # g2 = 2G, d2 = 2 * head_dim
    d = d2 // 2
    q_big = q_ref[:]
    k_new = knew_ref[:].reshape(1, 2 * d)
    v_new = vnew_ref[:].reshape(1, 2 * d)
    if kv_q8:
        ks = kscale_ref[0, 0]
        vs = vscale_ref[0, 0]
        # quantize the appended column with the static pair scale; all
        # downstream math uses the DEQUANTIZED value so this step sees
        # exactly what future steps will read back from the cache
        knq = jnp.clip(jnp.round(k_new.astype(jnp.float32) / ks), -127, 127)
        vnq = jnp.clip(jnp.round(v_new.astype(jnp.float32) / vs), -127, 127)
        k_new = knq * ks
        v_new = vnq * vs
        k_wr, v_wr = knq, vnq

    align = (wpos // win) * win
    old_k = k_ref[pl.ds(align, win), :]
    old_v = v_ref[pl.ds(align, win), :]
    row = jax.lax.broadcasted_iota(jnp.int32, (win, 2 * d), 0)
    sel = row == (wpos - align)
    if kv_q8:
        kcol_ref[:] = jnp.where(sel, k_wr.astype(old_k.dtype), old_k)
        vcol_ref[:] = jnp.where(sel, v_wr.astype(old_v.dtype), old_v)
    else:
        kcol_ref[:] = jnp.where(sel, k_new.astype(old_k.dtype), old_k)
        vcol_ref[:] = jnp.where(sel, v_new.astype(old_v.dtype), old_v)

    num_s = (wpos + block_s - 1) // block_s  # history strictly before wpos

    def body(si, carry):
        m_prev, l_prev, acc = carry
        k_blk = k_ref[pl.ds(si * block_s, block_s), :]  # (BS, 2D)
        v_blk = v_ref[pl.ds(si * block_s, block_s), :]
        if kv_q8:
            # dequantize in VMEM (VPU multiply) — the HBM stream stays
            # int8, which is the whole point; bf16 holds int8 * scale to
            # ~0.4% which is below the int8 rounding already accepted
            k_blk = (k_blk.astype(jnp.float32) * ks).astype(jnp.bfloat16)
            v_blk = (v_blk.astype(jnp.float32) * vs).astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            q_big, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (2G, BS), rows :G = head a, rows G: = head b
        ids = si * block_s + jax.lax.broadcasted_iota(
            jnp.int32, (g2, block_s), 1
        )
        ok = (ids < plen) | ((ids >= prompt_pad) & (ids < wpos))
        s = jnp.where(ok, s, NEG_INF)
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_cur)
        alpha = jnp.exp(m_prev - m_cur)
        l_cur = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (2G, 2D); only the diagonal quadrants are wanted
        return m_cur, l_cur, acc

    init = (
        jnp.full((g2, 1), NEG_INF, jnp.float32),
        jnp.zeros((g2, 1), jnp.float32),
        jnp.zeros((g2, 2 * d), jnp.float32),
    )
    m, l, acc = jax.lax.fori_loop(0, num_s, body, init)

    # fold in the current token (see _fused_kernel): q_big's zero blocks
    # keep the cross-head products out of the row sums
    s_cur = jnp.sum(
        q_big.astype(jnp.float32) * k_new.astype(jnp.float32),
        axis=1, keepdims=True,
    ) * scale  # (2G, 1)
    m_f = jnp.maximum(m, s_cur)
    alpha = jnp.exp(m - m_f)
    p_cur = jnp.exp(s_cur - m_f)
    l_f = l * alpha + p_cur
    acc = acc * alpha + p_cur * v_new.astype(jnp.float32)
    out = acc / jnp.maximum(l_f, 1e-30)  # (2G, 2D)
    o_ref[:] = out.astype(o_ref.dtype)


def decode_attention_fused(
    q: jnp.ndarray,  # (B, H, D)
    k_all: jnp.ndarray,  # (L, B, K, S, D) stacked cache — or the PAIRED
    #                      (L, B, K/2, S, 2D) layout (inferred from shape)
    v_all: jnp.ndarray,
    k_new: jnp.ndarray,  # (B, K, D) current token
    v_new: jnp.ndarray,
    layer: jnp.ndarray,  # () int32
    *,
    prompt_lens: jnp.ndarray,
    write_pos: jnp.ndarray,
    prompt_pad: int,
    scale: Optional[float] = None,
    block_s: int = 512,
    interpret: bool = False,
    k_scale: Optional[jnp.ndarray] = None,  # int8 caches: (L, B, K/2, 1, 1)
    v_scale: Optional[jnp.ndarray] = None,  #   f32 static dequant scales
):
    """Attention + cache append in ONE kernel.

    The stacked cache is aliased input->output; the kernel writes only the
    (lay, b, k, wpos) column and reads the history slab — no XLA-level
    dynamic-slice copy, no dynamic_update_slice, no defensive cache copy.
    Returns (out (B, H, D), k_all', v_all') where the primed caches are the
    same buffers updated in place.
    """
    b, h, d = q.shape
    L, _, kslots, s, dlast = k_all.shape
    paired = dlast == 2 * d
    if scale is None:
        scale = d ** -0.5
    block_s = min(block_s, s)
    assert s % block_s == 0
    if paired:
        return _decode_fused_paired_call(
            q, k_all, v_all, k_new, v_new, layer,
            prompt_lens=prompt_lens, write_pos=write_pos,
            prompt_pad=prompt_pad, scale=scale, block_s=block_s,
            interpret=interpret, k_scale=k_scale, v_scale=v_scale,
        )
    assert k_all.dtype != jnp.int8, "int8 KV caches require the paired layout"
    kh = kslots
    g = h // kh

    kernel = functools.partial(
        _fused_kernel, scale=scale, block_s=block_s, prompt_pad=prompt_pad
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, kh),
        in_specs=[
            pl.BlockSpec((None, None, g, d), lambda bi, ki, p, w, lay: (bi, ki, 0, 0)),
            pl.BlockSpec((None, None, 1, d), lambda bi, ki, p, w, lay: (bi, ki, 0, 0)),
            pl.BlockSpec((None, None, 1, d), lambda bi, ki, p, w, lay: (bi, ki, 0, 0)),
            pl.BlockSpec(
                (None, None, None, s, d),
                lambda bi, ki, p, w, lay: (lay[0], bi, ki, 0, 0),
            ),
            pl.BlockSpec(
                (None, None, None, s, d),
                lambda bi, ki, p, w, lay: (lay[0], bi, ki, 0, 0),
            ),
        ],
        out_specs=[
            pl.BlockSpec((None, None, g, d), lambda bi, ki, p, w, lay: (bi, ki, 0, 0)),
            pl.BlockSpec(
                (None, None, None, 8, d),
                lambda bi, ki, p, w, lay: (lay[0], bi, ki, w[0] // 8, 0),
            ),
            pl.BlockSpec(
                (None, None, None, 8, d),
                lambda bi, ki, p, w, lay: (lay[0], bi, ki, w[0] // 8, 0),
            ),
        ],
    )
    qg = q.reshape(b, kh, g, d)
    out, k2, v2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, kh, g, d), q.dtype),
            jax.ShapeDtypeStruct(k_all.shape, k_all.dtype),
            jax.ShapeDtypeStruct(v_all.shape, v_all.dtype),
        ],
        # operand indices INCLUDE the scalar-prefetch args:
        # 0..2 scalars, 3=q, 4=k_new, 5=v_new, 6=k_all, 7=v_all -> outputs 1, 2
        input_output_aliases={6: 1, 7: 2},
        interpret=interpret,
    )(
        prompt_lens.astype(jnp.int32),
        write_pos.reshape(1).astype(jnp.int32),
        layer.reshape(1).astype(jnp.int32),
        qg,
        k_new.reshape(b, kh, 1, d),
        v_new.reshape(b, kh, 1, d),
        k_all,
        v_all,
    )
    return out.reshape(b, h, d), k2, v2


def _decode_fused_paired_call(
    q, k_all, v_all, k_new, v_new, layer, *,
    prompt_lens, write_pos, prompt_pad, scale, block_s, interpret,
    k_scale=None, v_scale=None,
):
    """pallas_call plumbing for the head-paired cache layout
    ((L, B, K/2, S, 2D) — see _fused_kernel_paired). k_new/v_new arrive
    unpaired (B, K, D); consecutive kv heads are lane-adjacent, so pairing
    is a pure reshape. int8 caches (k_all.dtype == int8) additionally take
    the static (L, B, K/2, 1, 1) f32 dequantization scales."""
    b, h, d = q.shape
    L, _, kp, s, d2 = k_all.shape
    g2 = h // kp
    g = g2 // 2
    kv_q8 = k_all.dtype == jnp.int8
    # int8 arrays tile as (32, 128) in VMEM: the aliased append window must
    # be 32-row aligned (bf16 tiles as (16, 128); the 8-row window there
    # predates this and is fine)
    win = 32 if kv_q8 else 8
    if kv_q8:
        assert k_scale is not None and v_scale is not None
        assert s % win == 0

    kernel = functools.partial(
        _fused_kernel_paired, scale=scale, block_s=block_s,
        prompt_pad=prompt_pad, kv_q8=kv_q8, win=win,
    )
    in_specs = [
        pl.BlockSpec((None, None, g2, d2), lambda bi, ki, p, w, lay: (bi, ki, 0, 0)),
        pl.BlockSpec((None, None, 1, d2), lambda bi, ki, p, w, lay: (bi, ki, 0, 0)),
        pl.BlockSpec((None, None, 1, d2), lambda bi, ki, p, w, lay: (bi, ki, 0, 0)),
        pl.BlockSpec(
            (None, None, None, s, d2),
            lambda bi, ki, p, w, lay: (lay[0], bi, ki, 0, 0),
        ),
        pl.BlockSpec(
            (None, None, None, s, d2),
            lambda bi, ki, p, w, lay: (lay[0], bi, ki, 0, 0),
        ),
    ]
    if kv_q8:
        in_specs += [
            pl.BlockSpec(
                (None, None, None, 1, 1),
                lambda bi, ki, p, w, lay: (lay[0], bi, ki, 0, 0),
            ),
            pl.BlockSpec(
                (None, None, None, 1, 1),
                lambda bi, ki, p, w, lay: (lay[0], bi, ki, 0, 0),
            ),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, kp),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((None, None, g2, d2), lambda bi, ki, p, w, lay: (bi, ki, 0, 0)),
            pl.BlockSpec(
                (None, None, None, win, d2),
                lambda bi, ki, p, w, lay: (lay[0], bi, ki, w[0] // win, 0),
            ),
            pl.BlockSpec(
                (None, None, None, win, d2),
                lambda bi, ki, p, w, lay: (lay[0], bi, ki, w[0] // win, 0),
            ),
        ],
    )
    qg = q.reshape(b, kp, g2, d)
    # block-diagonal q embedding (see _fused_kernel_paired): head a's G
    # query rows in lanes [0, D), head b's in lanes [D, 2D). XLA-side pad +
    # concat — negligible (q is (B, H, D)) and keeps lane-offset layout
    # surgery out of Mosaic.
    q_big = jnp.concatenate(
        [
            jnp.pad(qg[:, :, :g], ((0, 0), (0, 0), (0, 0), (0, d))),
            jnp.pad(qg[:, :, g:], ((0, 0), (0, 0), (0, 0), (d, 0))),
        ],
        axis=2,
    )  # (b, kp, 2G, 2D)
    out, k2, v2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, kp, g2, d2), q.dtype),
            jax.ShapeDtypeStruct(k_all.shape, k_all.dtype),
            jax.ShapeDtypeStruct(v_all.shape, v_all.dtype),
        ],
        # 0..2 scalars, 3=q, 4=k_new, 5=v_new, 6=k_all, 7=v_all -> out 1, 2
        # (int8 scales, when present, ride as trailing operands 8, 9 so the
        # alias indices never move)
        input_output_aliases={6: 1, 7: 2},
        interpret=interpret,
    )(
        prompt_lens.astype(jnp.int32),
        write_pos.reshape(1).astype(jnp.int32),
        layer.reshape(1).astype(jnp.int32),
        q_big,
        k_new.reshape(b, kp, 1, d2),
        v_new.reshape(b, kp, 1, d2),
        k_all,
        v_all,
        *([k_scale, v_scale] if kv_q8 else []),
    )
    # diagonal quadrants of the (2G, 2D) block result are the two heads'
    # outputs, in the original row order
    out = jnp.concatenate(
        [out[:, :, :g, :d], out[:, :, g:, d:]], axis=2
    )
    return out.reshape(b, h, d), k2, v2


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
    return _decode_call(
        q.reshape(b, kh, h // kh, d), k_cache[None], v_cache[None],
        jnp.zeros((), jnp.int32), prompt_lens, write_pos,
        prompt_pad=prompt_pad, scale=scale, block_s=block_s,
        interpret=interpret,
    ).reshape(b, h, d)


def decode_attention_stacked(
    q: jnp.ndarray,  # (B, H, D)
    k_all: jnp.ndarray,  # (L, B, K, S, D) — FULL stacked cache
    v_all: jnp.ndarray,
    layer: jnp.ndarray,  # () int32
    *,
    prompt_lens: jnp.ndarray,
    write_pos: jnp.ndarray,
    prompt_pad: int,
    scale: Optional[float] = None,
    block_s: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Layer-indexed decode attention: the kernel's index_map picks layer
    `layer` straight out of the stacked cache in HBM, so the per-layer
    (B, K, S, D) slice is DMA'd once into VMEM and never materialized as an
    XLA copy (a traced-index dynamic-slice would write it back to HBM —
    ~2x cache traffic per decode step)."""
    b, h, d = q.shape
    _, _, kh, s, _ = k_all.shape
    return _decode_call(
        q.reshape(b, kh, h // kh, d), k_all, v_all, layer, prompt_lens,
        write_pos, prompt_pad=prompt_pad, scale=scale, block_s=block_s,
        interpret=interpret,
    ).reshape(b, h, d)


def _decode_call(
    qg, k_all, v_all, layer, prompt_lens, write_pos, *,
    prompt_pad, scale, block_s, interpret,
):
    b, kh, g, d = qg.shape
    L, _, _, s, _ = k_all.shape
    if scale is None:
        scale = d ** -0.5
    block_s = min(block_s, s)
    assert s % block_s == 0, (
        f"cache columns {s} must be a multiple of block_s {block_s}; "
        "allocate the cache padded (padding would copy it every step)"
    )

    kernel = functools.partial(
        _decode_kernel, scale=scale, block_s=block_s, prompt_pad=prompt_pad
    )

    # scalar prefetch: (prompt_lens, write_pos, layer); layer drives index_map
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, kh),
        in_specs=[
            pl.BlockSpec(
                (None, None, g, d), lambda bi, ki, plen, wpos, lay: (bi, ki, 0, 0)
            ),
            pl.BlockSpec(
                (None, None, None, s, d),
                lambda bi, ki, plen, wpos, lay: (lay[0], bi, ki, 0, 0),
            ),
            pl.BlockSpec(
                (None, None, None, s, d),
                lambda bi, ki, plen, wpos, lay: (lay[0], bi, ki, 0, 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (None, None, g, d), lambda bi, ki, plen, wpos, lay: (bi, ki, 0, 0)
        ),
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kh, g, d), qg.dtype),
        interpret=interpret,
    )(
        prompt_lens.astype(jnp.int32),
        write_pos.reshape(1).astype(jnp.int32),
        layer.reshape(1).astype(jnp.int32),
        qg,
        k_all,
        v_all,
    )
