"""Pallas TPU FlashAttention-2 BACKWARD (causal + GQA + segment ids).

Completes the replacement of the reference's flash-attn 2.7.4 CUDA
dependency (requirements.txt:2): the reference TRAINS with flash attention
at max_length=16384 (projects/grasp_any_region/configs/gar_1b.py:28), which
requires a backward that never materializes the (B, H, Sq, Sk) logits.
Until round 3 our custom_vjp backward was the XLA reference — exact but
O(S^2) memory per remat block, capping trainable context well below 16k.

Algorithm (FA-2 backward, written from the paper's recurrences):
  forward saves per-row LSE = logsumexp(scale * q k^T) (flash_attention
  return_lse=True). Backward precomputes delta = rowsum(dO * O) in XLA
  (elementwise, cheap), then two kernels recompute the probability blocks
  p = exp(s - lse) on the fly:

    dq kernel   grid (B*H, Sq/BQ, Sk/BK): dq_acc += ds @ K per k block,
                ds = p * (dO V^T - delta); written at the last k block
    dk/dv kernel grid (B*H, Sk/BK, Sq/BQ): dv_acc += p^T dO,
                dk_acc += ds^T (scale * Q) per q block; written at the last

  GQA: both kernels run per Q head (kv blocks index-mapped h -> h//group,
  like the forward); dk/dv come out per q-head (B, H, Sk, D) fp32 and are
  group-summed in XLA — 3 lines instead of in-kernel cross-program
  accumulation, and the transient is small relative to activations.

TPU notes:
  * Everything streams in (block_q, D)/(block_k, D) blocks: VMEM use is
    INDEPENDENT of S. (The first cut kept whole (S, D) heads resident —
    with D=64 lane-padded to 128 that is 4 MB per array at S=16k, x2
    pipeline buffers, and blew the 16 MB scoped-vmem limit: S=16384
    training was uncompilable.)
  * The accumulator output block is revisited across the fastest grid axis
    (its index map ignores it), zeroed on the first step and written from
    f32 scratch on the last — the standard Mosaic accumulation pattern.
  * Causal pruning without wasted DMA: out-of-band programs clamp their
    streamed-block index maps to the last relevant block (same index as
    the previous step => Pallas issues no new copy) and skip compute via
    pl.when.
  * LSE/delta/segment ids all ride as lane-major (1, S) rows — a (S, 1)
    column block would be lane-padded 128x.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .vma import pallas_struct


def _mask_block(
    qi_start: int | jnp.ndarray,
    ki_start: jnp.ndarray,
    block_q: int,
    block_k: int,
    *,
    causal: bool,
    kv_valid: int,
    sk_pad: int,
    q_offset: int,
    qseg=None,
    kseg=None,
):
    """(BQ, BK) bool validity mask for one logits block; None if all-valid."""
    need_tail = kv_valid < sk_pad
    if not (causal or need_tail or qseg is not None):
        return None
    k_ids = ki_start + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 1
    )
    ok = k_ids < kv_valid
    if causal:
        q_ids = (
            qi_start
            + q_offset
            + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        )
        ok = ok & (q_ids >= k_ids)
    if qseg is not None:
        ok = ok & (qseg == kseg)
    return ok


def _dq_kernel(
    q_ref,      # (BQ, D)
    k_ref,      # (BK, D)
    v_ref,      # (BK, D)
    do_ref,     # (BQ, D)
    lse_ref,    # (1, BQ)
    delta_ref,  # (1, BQ)
    *refs,
    scale: float,
    causal: bool,
    block_q: int,
    block_k: int,
    num_k: int,
    sk_pad: int,
    kv_valid: int,
    q_offset: int,
    segments: bool,
):
    if segments:
        qseg_ref, kseg_ref, dq_ref, acc_ref = refs
    else:
        dq_ref, acc_ref = refs
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    q_start = qi * block_q
    k_start = ki * block_k

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def compute():
        # operands stay in the input dtype for every dot (MXU-native bf16
        # with f32 accumulation; f32 operands cost ~8x). scale moves onto
        # the f32 logits; computed f32 tensors (p, ds) round to the input
        # dtype before their dots — the standard FA-2 TPU practice.
        q = q_ref[:]
        do = do_ref[:]
        lse = lse_ref[0, :].reshape(block_q, 1)
        delta = delta_ref[0, :].reshape(block_q, 1)
        k_blk = k_ref[:]
        v_blk = v_ref[:]
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        p = jnp.exp(s - lse)
        ok = _mask_block(
            q_start, k_start, block_q, block_k,
            causal=causal, kv_valid=kv_valid, sk_pad=sk_pad,
            q_offset=q_offset,
            qseg=qseg_ref[0, :].reshape(block_q, 1) if segments else None,
            kseg=kseg_ref[:] if segments else None,
        )
        if ok is not None:
            p = jnp.where(ok, p, 0.0)
        dp = jax.lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - delta)).astype(q.dtype)
        acc_ref[:] += jax.lax.dot_general(
            ds, k_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if causal:
        # k blocks strictly above the causal band contribute nothing
        @pl.when(k_start <= q_start + q_offset + block_q - 1)
        def _():
            compute()
    else:
        compute()

    @pl.when(ki == num_k - 1)
    def _():
        dq_ref[:] = acc_ref[:] * scale


def _dkv_kernel(
    q_ref,      # (BQ, D)
    do_ref,     # (BQ, D)
    k_ref,      # (BK, D)
    v_ref,      # (BK, D)
    lse_ref,    # (1, BQ)
    delta_ref,  # (1, BQ)
    *refs,
    scale: float,
    causal: bool,
    block_q: int,
    block_k: int,
    num_q: int,
    sk_pad: int,
    kv_valid: int,
    q_offset: int,
    segments: bool,
):
    if segments:
        qseg_ref, kseg_ref, dk_ref, dv_ref, dk_acc, dv_acc = refs
    else:
        dk_ref, dv_ref, dk_acc, dv_acc = refs
    ki = pl.program_id(1)
    qi = pl.program_id(2)
    k_start = ki * block_k
    q_start = qi * block_q

    @pl.when(qi == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    def compute():
        # bf16 operands for every dot (see _dq_kernel note); scale moves
        # onto the f32 logits and onto dk at the final write
        k_blk = k_ref[:]
        v_blk = v_ref[:]
        q_blk = q_ref[:]
        do_blk = do_ref[:]
        lse = lse_ref[0, :].reshape(block_q, 1)
        delta = delta_ref[0, :].reshape(block_q, 1)
        s = jax.lax.dot_general(
            q_blk, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (BQ, BK)
        p = jnp.exp(s - lse)
        ok = _mask_block(
            q_start, k_start, block_q, block_k,
            causal=causal, kv_valid=kv_valid, sk_pad=sk_pad,
            q_offset=q_offset,
            qseg=qseg_ref[0, :].reshape(block_q, 1) if segments else None,
            kseg=kseg_ref[:] if segments else None,
        )
        if ok is not None:
            p = jnp.where(ok, p, 0.0)
        dv_acc[:] += jax.lax.dot_general(
            p.astype(do_blk.dtype), do_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BK, D)
        dp = jax.lax.dot_general(
            do_blk, v_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - delta)).astype(q_blk.dtype)
        dk_acc[:] += jax.lax.dot_general(
            ds, q_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BK, D); unscaled q => scale applies at the final write

    if causal:
        # q blocks whose last row still precedes k_start see none of it
        @pl.when(q_start + q_offset + block_q - 1 >= k_start)
        def _():
            compute()
    else:
        compute()

    @pl.when(qi == num_q - 1)
    def _():
        dk_ref[:] = dk_acc[:] * scale
        dv_ref[:] = dv_acc[:]


def flash_attention_bwd(
    q: jnp.ndarray,    # (B, Sq, H, D)
    k: jnp.ndarray,    # (B, Sk, K, D)
    v: jnp.ndarray,
    out: jnp.ndarray,  # (B, Sq, H, D) forward output
    lse: jnp.ndarray,  # (B, H, Sq) fp32 from flash_attention(return_lse=True)
    g: jnp.ndarray,    # (B, Sq, H, D) output cotangent
    *,
    causal: bool = True,
    segment_ids: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (dq, dk, dv) in the input dtypes. Conventions (masking,
    right-aligned causal offset, packed segment ids) match flash_attention
    exactly — the two are a custom_vjp pair."""
    b, sq, h, d = q.shape
    _, sk, kh, _ = k.shape
    assert h % kh == 0
    group = h // kh
    if scale is None:
        scale = d ** -0.5
    if block_q is None:
        block_q = 256 if d < 128 else 128
    if block_k is None:
        block_k = 512 if d < 128 else 256
    block_q = min(block_q, sq)
    block_k = min(block_k, sk)

    # delta = rowsum(dO * O): elementwise, XLA fuses it into the pad below
    delta = jnp.einsum(
        "bshd,bshd->bhs",
        g.astype(jnp.float32),
        out.astype(jnp.float32),
    )

    pq = (-sq) % block_q
    pk = (-sk) % block_k
    if pq:
        padq = ((0, 0), (0, pq), (0, 0), (0, 0))
        q = jnp.pad(q, padq)
        g = jnp.pad(g, padq)
        # pad rows: q == dO == 0 -> s == 0, and lse = 0 makes p finite (=1
        # on unmasked keys); every contribution multiplies dO == 0 or flows
        # to the discarded dq rows
        lse = jnp.pad(lse, ((0, 0), (0, 0), (0, pq)))
        delta = jnp.pad(delta, ((0, 0), (0, 0), (0, pq)))
    if pk:
        padk = ((0, 0), (0, pk), (0, 0), (0, 0))
        k = jnp.pad(k, padk)
        v = jnp.pad(v, padk)
    sq_p, sk_p = sq + pq, sk + pk
    nq, nk = sq_p // block_q, sk_p // block_k
    if segment_ids is not None:
        assert sq == sk, "segment_ids requires self-attention (Sq == Sk)"
        qseg = jnp.pad(segment_ids.astype(jnp.int32), ((0, 0), (0, pq)))[:, None, :]
        kseg = jnp.pad(segment_ids.astype(jnp.int32), ((0, 0), (0, pk)))[:, None, :]

    qh = q.transpose(0, 2, 1, 3).reshape(b * h, sq_p, d)
    gh = g.transpose(0, 2, 1, 3).reshape(b * h, sq_p, d)
    khh = k.transpose(0, 2, 1, 3).reshape(b * kh, sk_p, d)
    vhh = v.transpose(0, 2, 1, 3).reshape(b * kh, sk_p, d)
    # per-row fp32 vectors ride a size-1 middle axis so their blocks satisfy
    # Mosaic's last-two-dims (8,128)-or-full rule
    lseh = lse.reshape(b * h, 1, sq_p)
    deltah = delta.reshape(b * h, 1, sq_p)

    q_offset = sk - sq
    segments = segment_ids is not None
    common = dict(
        scale=scale, causal=causal, block_q=block_q, block_k=block_k,
        sk_pad=sk_p, kv_valid=sk, q_offset=q_offset, segments=segments,
    )

    def clamp_ki(qi, ki):
        """Last k block the causal band reaches for q block qi; programs
        beyond it reuse it (no DMA) and skip compute."""
        if not causal:
            return ki
        hi = jnp.maximum(qi * block_q + q_offset + block_q - 1, 0) // block_k
        return jnp.minimum(ki, jnp.minimum(hi, nk - 1))

    def clamp_qi(ki, qi):
        """First q block that can see k block ki (trunc-div is exact here:
        max(0, .) absorbs any negative numerator)."""
        if not causal:
            return qi
        lo = jnp.maximum((ki * block_k - q_offset) // block_q, 0)
        return jnp.maximum(qi, jnp.minimum(lo, nq - 1))

    # ---- dq ----------------------------------------------------------------
    dq_in_specs = [
        pl.BlockSpec((None, block_q, d), lambda bh, qi, ki: (bh, qi, 0)),
        pl.BlockSpec(
            (None, block_k, d),
            lambda bh, qi, ki, gr=group: (bh // gr, clamp_ki(qi, ki), 0),
        ),
        pl.BlockSpec(
            (None, block_k, d),
            lambda bh, qi, ki, gr=group: (bh // gr, clamp_ki(qi, ki), 0),
        ),
        pl.BlockSpec((None, block_q, d), lambda bh, qi, ki: (bh, qi, 0)),
        pl.BlockSpec((None, 1, block_q), lambda bh, qi, ki: (bh, 0, qi)),
        pl.BlockSpec((None, 1, block_q), lambda bh, qi, ki: (bh, 0, qi)),
    ]
    dq_operands = [qh, khh, vhh, gh, lseh, deltah]
    if segments:
        dq_in_specs += [
            pl.BlockSpec((None, 1, block_q), lambda bh, qi, ki, h_=h: (bh // h_, 0, qi)),
            pl.BlockSpec(
                (None, 1, block_k),
                lambda bh, qi, ki, h_=h: (bh // h_, 0, clamp_ki(qi, ki)),
            ),
        ]
        dq_operands += [qseg, kseg]

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, num_k=nk, **common),
        grid=(b * h, nq, nk),
        in_specs=dq_in_specs,
        out_specs=pl.BlockSpec((None, block_q, d), lambda bh, qi, ki: (bh, qi, 0)),
        out_shape=pallas_struct((b * h, sq_p, d), jnp.float32, qh, khh, vhh, gh),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        interpret=interpret,
    )(*dq_operands)

    # ---- dk / dv (per q head; group-summed below) --------------------------
    dkv_in_specs = [
        pl.BlockSpec((None, block_q, d), lambda bh, ki, qi: (bh, clamp_qi(ki, qi), 0)),
        pl.BlockSpec((None, block_q, d), lambda bh, ki, qi: (bh, clamp_qi(ki, qi), 0)),
        pl.BlockSpec(
            (None, block_k, d), lambda bh, ki, qi, gr=group: (bh // gr, ki, 0)
        ),
        pl.BlockSpec(
            (None, block_k, d), lambda bh, ki, qi, gr=group: (bh // gr, ki, 0)
        ),
        pl.BlockSpec((None, 1, block_q), lambda bh, ki, qi: (bh, 0, clamp_qi(ki, qi))),
        pl.BlockSpec((None, 1, block_q), lambda bh, ki, qi: (bh, 0, clamp_qi(ki, qi))),
    ]
    dkv_operands = [qh, gh, khh, vhh, lseh, deltah]
    if segments:
        dkv_in_specs += [
            pl.BlockSpec(
                (None, 1, block_q),
                lambda bh, ki, qi, h_=h: (bh // h_, 0, clamp_qi(ki, qi)),
            ),
            pl.BlockSpec((None, 1, block_k), lambda bh, ki, qi, h_=h: (bh // h_, 0, ki)),
        ]
        dkv_operands += [qseg, kseg]

    dk_h, dv_h = pl.pallas_call(
        functools.partial(_dkv_kernel, num_q=nq, **common),
        grid=(b * h, nk, nq),
        in_specs=dkv_in_specs,
        out_specs=[
            pl.BlockSpec((None, block_k, d), lambda bh, ki, qi: (bh, ki, 0)),
            pl.BlockSpec((None, block_k, d), lambda bh, ki, qi: (bh, ki, 0)),
        ],
        out_shape=[
            pallas_struct((b * h, sk_p, d), jnp.float32, qh, khh, vhh, gh),
            pallas_struct((b * h, sk_p, d), jnp.float32, qh, khh, vhh, gh),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        interpret=interpret,
    )(*dkv_operands)

    dq = dq.reshape(b, h, sq_p, d).transpose(0, 2, 1, 3)[:, :sq].astype(q.dtype)
    dk = (
        dk_h.reshape(b, kh, group, sk_p, d).sum(2)
        .transpose(0, 2, 1, 3)[:, :sk].astype(k.dtype)
    )
    dv = (
        dv_h.reshape(b, kh, group, sk_p, d).sum(2)
        .transpose(0, 2, 1, 3)[:, :sk].astype(v.dtype)
    )
    return dq, dk, dv
