"""Pallas TPU flash attention (causal + GQA) for prefill / full-sequence
attention.

Replaces the reference's flash-attn 2.7.4 CUDA kernels
(configs/gar_1b.py:78). Written from the FlashAttention-2 algorithm spec:
online softmax over K blocks with running (max, sum, acc) in VMEM scratch,
fp32 accumulation, bf16 MXU matmuls.

Design notes (TPU):
  * grid = (B*H, Sq/BQ); each program holds one q block and streams k/v
    blocks of the mapped KV head via an inner fori_loop. K/V for one head sit
    fully in VMEM ((S<=16k) x 128 x bf16 = <=4 MB each).
  * GQA is pure index mapping — kv block index = h // (H/K); no repeat/
    broadcast materialization like repeat_kv in the XLA path.
  * causal masking prunes whole k blocks: the loop upper bound for q block i
    is ceil((q_end+1)/BK); the diagonal block gets an element mask.
  * right-padded batches need no segment mask under causal attention (pad
    tokens sit after real tokens); packed multi-doc rows should use
    mha_reference with segment_ids instead.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .vma import pallas_struct

NEG_INF = -2.0 ** 30


def _is_tpu_target() -> bool:
    from ..core.platform import is_tpu

    return is_tpu()


def _flash_kernel(
    q_ref,  # (BQ, D)
    k_ref,  # (Sk, D)
    v_ref,  # (Sk, D)
    # with segments=True two extra inputs precede the output:
    #   qseg_ref (BQ, 1), kseg_ref (1, Sk) int32 (layouts chosen to satisfy
    #   Mosaic's (8, 128)-divisible-or-full block constraint)
    *refs,
    scale: float,
    causal: bool,
    block_q: int,
    block_k: int,
    sk: int,
    kv_valid: int,
    q_offset: int,
    segments: bool,
    with_lse: bool,
):
    refs = list(refs)
    if segments:
        qseg_ref, kseg_ref = refs[:2]
        refs = refs[2:]
    o_ref = refs[0]
    lse_ref = refs[1] if with_lse else None
    acc_ref, m_ref, l_ref = refs[-3:]
    qi = pl.program_id(1)
    # keep q in the input dtype: MXU consumes bf16 natively (f32 operands
    # cost ~8x); scale applies to the f32 logits after the dot
    q = q_ref[:]

    m_ref[:] = jnp.full_like(m_ref, NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)
    acc_ref[:] = jnp.zeros_like(acc_ref)

    q_start = qi * block_q + q_offset  # global position of first q row
    if causal:
        # last k block that any row of this q block can see
        num_k = (q_start + block_q - 1) // block_k + 1
        num_k = jnp.minimum(num_k, pl.cdiv(sk, block_k))
    else:
        num_k = pl.cdiv(sk, block_k)

    q_ids = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    mask_kv_tail = kv_valid < sk  # static: padded keys need masking
    masked = causal or mask_kv_tail or segments

    def body(ki, _):
        k_blk = k_ref[pl.ds(ki * block_k, block_k), :]
        v_blk = v_ref[pl.ds(ki * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k_blk,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (BQ, BK) f32
        if masked:
            k_ids = ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            ok = k_ids < kv_valid
            if causal:
                ok = ok & (q_ids >= k_ids)
            if segments:
                qseg = qseg_ref[:]  # (BQ, 1)
                kseg = kseg_ref[:, pl.ds(ki * block_k, block_k)]  # (1, BK)
                ok = ok & (qseg == kseg)
            s = jnp.where(ok, s, NEG_INF)

        m_prev = m_ref[:, :1]  # (BQ, 1)
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_cur)  # (BQ, BK)
        if segments:
            # a block fully masked for some q row leaves s == m_cur == NEG_INF
            # there -> exp(0) == 1; zero those probs explicitly (can't happen
            # with causal/tail masks alone: block 0 / the last partial block
            # always has a visible key)
            p = jnp.where(ok, p, 0.0)
        alpha = jnp.exp(m_prev - m_cur)  # (BQ, 1)
        l_ref[:, :1] = l_ref[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:, :1] = m_cur
        return 0

    jax.lax.fori_loop(0, num_k, body, 0)
    o_ref[:] = (acc_ref[:] / jnp.maximum(l_ref[:, :1], 1e-30)).astype(o_ref.dtype)
    if with_lse:
        # log-sum-exp of the SCALED logits per q row — the residual the
        # FA-2 backward recomputes p from (ops/flash_backward.py). Stored
        # (1, BQ): Mosaic requires the last two block dims be (8,128)-
        # divisible or equal to the array dims, so rows ride a size-1 axis.
        lse_ref[:] = (
            m_ref[:, 0] + jnp.log(jnp.maximum(l_ref[:, 0], 1e-30))
        ).reshape(1, -1)


def flash_attention(
    q: jnp.ndarray,  # (B, Sq, H, D)
    k: jnp.ndarray,  # (B, Sk, K, D)
    v: jnp.ndarray,
    *,
    causal: bool = True,
    segment_ids: Optional[jnp.ndarray] = None,  # (B, S) int; 0 = padding
    scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
    return_lse: bool = False,
):
    """segment_ids enables packed multi-document rows (block-diagonal mask,
    the reference's unused varlen path, custom_collect_fn.py:96-106):
    self-attention only (Sq == Sk), token i attends token j iff causal AND
    segment_ids[b,i] == segment_ids[b,j]. Padding (id 0) attends only padding.

    return_lse=True additionally returns the per-row log-sum-exp of the
    scaled logits, shape (B, H, Sq) fp32 — the residual for the Pallas
    FA-2 backward (ops/flash_backward.py)."""
    b, sq, h, d = q.shape
    _, sk, kh, _ = k.shape
    assert h % kh == 0
    group = h // kh
    if interpret is None:
        # auto: Mosaic on TPU, interpreter elsewhere — lets mha(use_flash=True)
        # (and its shard_map wrapper) run unchanged on the CPU test mesh
        interpret = not _is_tpu_target()
    if segment_ids is not None:
        assert sq == sk, "segment_ids requires self-attention (Sq == Sk)"
        assert segment_ids.shape == (b, sq), segment_ids.shape
    if scale is None:
        scale = d ** -0.5
    # d=128 kernels blow up Mosaic compile time with big blocks; keep the
    # working set small there
    if block_q is None:
        block_q = 256 if d < 128 else 128
    if block_k is None:
        block_k = 512 if d < 128 else 256

    block_q = min(block_q, sq)
    block_k = min(block_k, sk)
    # pad to block multiples (q padded rows are discarded; k pad is masked by
    # causality only if causal — for non-causal we must mask pad keys, so we
    # require divisibility there)
    pq = (-sq) % block_q
    pk = (-sk) % block_k
    if pq:
        q = jnp.pad(q, ((0, 0), (0, pq), (0, 0), (0, 0)))
    if pk:
        k = jnp.pad(k, ((0, 0), (0, pk), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pk), (0, 0), (0, 0)))
    sq_p, sk_p = sq + pq, sk + pk
    if segment_ids is not None:
        qseg = jnp.pad(segment_ids.astype(jnp.int32), ((0, 0), (0, pq)))[:, :, None]
        kseg = jnp.pad(segment_ids.astype(jnp.int32), ((0, 0), (0, pk)))[:, None, :]

    qh = q.transpose(0, 2, 1, 3).reshape(b * h, sq_p, d)
    khh = k.transpose(0, 2, 1, 3).reshape(b * kh, sk_p, d)
    vhh = v.transpose(0, 2, 1, 3).reshape(b * kh, sk_p, d)

    # right-aligned causal offset (q may be a suffix of the kv sequence)
    q_offset = sk - sq

    kernel = functools.partial(
        _flash_kernel,
        scale=scale,
        causal=causal,
        block_q=block_q,
        block_k=block_k,
        sk=sk_p,
        kv_valid=sk,
        q_offset=q_offset,
        segments=segment_ids is not None,
        with_lse=return_lse,
    )

    grid = (b * h, sq_p // block_q)

    in_specs = [
        pl.BlockSpec((None, block_q, d), lambda bh, qi: (bh, qi, 0)),
        pl.BlockSpec((None, sk_p, d), lambda bh, qi, g=group: (bh // g, 0, 0)),
        pl.BlockSpec((None, sk_p, d), lambda bh, qi, g=group: (bh // g, 0, 0)),
    ]
    operands = [qh, khh, vhh]
    if segment_ids is not None:
        in_specs += [
            pl.BlockSpec((None, block_q, 1), lambda bh, qi, h=h: (bh // h, qi, 0)),
            pl.BlockSpec((None, 1, sk_p), lambda bh, qi, h=h: (bh // h, 0, 0)),
        ]
        operands += [qseg, kseg]

    out_specs = [pl.BlockSpec((None, block_q, d), lambda bh, qi: (bh, qi, 0))]
    # vma-propagating structs: required when this kernel is traced inside a
    # check_vma shard_map body (the pipeline stages, parallel/pipeline.py)
    out_shapes = [pallas_struct((b * h, sq_p, d), q.dtype, qh, khh, vhh)]
    if return_lse:
        out_specs.append(
            pl.BlockSpec((None, 1, block_q), lambda bh, qi: (bh, 0, qi))
        )
        out_shapes.append(
            pallas_struct((b * h, 1, sq_p), jnp.float32, qh, khh, vhh)
        )

    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs if return_lse else out_specs[0],
        out_shape=out_shapes if return_lse else out_shapes[0],
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)

    out = res[0] if return_lse else res
    out = out.reshape(b, h, sq_p, d).transpose(0, 2, 1, 3)[:, :sq]
    if return_lse:
        lse = res[1].reshape(b, h, sq_p)[:, :, :sq]
        return out, lse
    return out


# backward implementation selector: "pallas" = FA-2 backward kernels
# (ops/flash_backward.py, O(S) memory — required for the reference's 16k
# training context, configs/gar_1b.py:28); "xla" = differentiate the XLA
# reference (materializes (B, H, Sq, Sk) logits; kept for validation)
BACKWARD_IMPL = "pallas"


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 5))
def flash_attention_df(q, k, v, causal, segment_ids, scale):
    """Differentiable flash attention: Pallas forward + Pallas FA-2 backward
    (pallas_call has no automatic VJP — training paths that hit the kernel
    otherwise die with 'Linearization failed'; caught by the round-2 on-chip
    train smoke).

    segment_ids rides as a DIFFERENTIABLE-slot arg (it's int — tangent is
    symbolically zero) so it can stay a traced array; causal/scale are
    static."""
    return flash_attention(q, k, v, causal=causal, segment_ids=segment_ids,
                           scale=scale)


def _flash_df_fwd(q, k, v, causal, segment_ids, scale):
    out, lse = flash_attention(q, k, v, causal=causal,
                               segment_ids=segment_ids, scale=scale,
                               return_lse=True)
    return out, (q, k, v, out, lse, segment_ids)


def _flash_df_bwd(causal, scale, res, g):
    q, k, v, out, lse, segment_ids = res
    if BACKWARD_IMPL == "pallas":
        from .flash_backward import flash_attention_bwd

        dq, dk, dv = flash_attention_bwd(
            q, k, v, out, lse, g,
            causal=causal, segment_ids=segment_ids, scale=scale,
            interpret=not _is_tpu_target(),
        )
        return dq, dk, dv, None

    from .attention import mha_reference

    _, vjp = jax.vjp(
        lambda q, k, v: mha_reference(
            q, k, v, causal=causal, segment_ids=segment_ids, scale=scale
        ),
        q, k, v,
    )
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


flash_attention_df.defvjp(_flash_df_fwd, _flash_df_bwd)
