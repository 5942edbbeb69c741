"""Attention ops — XLA reference path + dispatch to Pallas flash kernels.

Replaces the reference's flash-attn 2.7.4 CUDA dependency
(configs/gar_1b.py:78, `attn_implementation="flash_attention_2"`; vision
tower forced eager in hf_models/modeling_gar.py:34-43).

Two call sites:
  * `mha` — bidirectional/causal attention over full sequences (ViT tiles,
    LLM prefill). Dispatches to the Pallas flash kernel for long sequences
    (ops/flash_attention.py), XLA einsum otherwise (XLA fuses QK^T+softmax+PV
    well at short S; the MXU is saturated either way).
  * `decode_attention` — single-query attention against a KV cache
    (bandwidth-bound; see ops/decode_attention.py for the Pallas path).

All softmax math in fp32 regardless of input dtype.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -2.0 ** 30  # large-but-finite; avoids NaN from (-inf) - (-inf)


def repeat_kv(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """(B, S, K, D) -> (B, S, K*n, D) repeating each kv head n times."""
    if n == 1:
        return x
    b, s, k, d = x.shape
    x = jnp.broadcast_to(x[:, :, :, None, :], (b, s, k, n, d))
    return x.reshape(b, s, k * n, d)


def mha_reference(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Plain XLA attention.

    q: (B, Sq, H, D); k/v: (B, Sk, K, D) with H % K == 0 (GQA).
    segment_ids: (B, Sq) int; tokens attend only within equal segment ids
    (block-diagonal packing mask; replaces the reference's varlen path,
    custom_collect_fn.py:96-106). id 0 may be used for padding — pair with a
    causal mask and padded positions simply attend within the pad block.
    Returns (B, Sq, H, D) in q.dtype.
    """
    b, sq, h, d = q.shape
    _, sk, kh, _ = k.shape
    if scale is None:
        scale = d ** -0.5
    # keep matmuls in the input dtype (bf16 on TPU = native MXU; fp32 inputs
    # in tests accumulate exactly via preferred_element_type)
    qf = q * jnp.asarray(scale, q.dtype)
    kf = repeat_kv(k, h // kh)
    vf = repeat_kv(v, h // kh)

    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", qf, kf, preferred_element_type=jnp.float32
    )
    mask = None
    if causal:
        qpos = jnp.arange(sq)[:, None] + (sk - sq)  # right-aligned
        kpos = jnp.arange(sk)[None, :]
        mask = qpos >= kpos  # (Sq, Sk)
        mask = mask[None, None]
    if segment_ids is not None:
        if kv_segment_ids is None:
            kv_segment_ids = segment_ids
        seg = segment_ids[:, None, :, None] == kv_segment_ids[:, None, None, :]
        mask = seg if mask is None else (mask & seg)
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), vf,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def _compile_target() -> str:
    from ..core.platform import compile_target

    return compile_target()


def _flash_sharded(q, k, v, causal, segment_ids, scale, mesh):
    """Run the flash kernel per-shard under `mesh` via shard_map.

    GSPMD cannot partition a pallas_call ("Mosaic kernels cannot be
    automatically partitioned") — so under a multi-device mesh the kernel
    must be explicitly placed. Attention is embarrassingly parallel over
    batch and heads: shard batch over ('data','fsdp'), q/kv heads over
    'tensor' (matching parallel/sharding.py's activation layout, so the
    in_specs are a no-op reshard in the sharded train/prefill paths), and
    degrade any non-dividing dim to replicated — identical math, duplicated
    work on that axis only. The custom_vjp (flash_attention_df) applies
    per-shard, so training differentiates through this wrapper unchanged.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from .flash_attention import flash_attention_df

    names = mesh.axis_names
    b, sq, h, _ = q.shape
    kh = k.shape[2]
    live = tuple(
        a for a in ("data", "fsdp") if a in names and mesh.shape[a] > 1
    )
    # Shard the batch over the LARGEST dividing subgroup of the dp axes —
    # falling straight to full replication (the r4 behavior) duplicated all
    # ViT attention work across the data axis whenever B (= tiles, often 17)
    # didn't divide data*fsdp. Candidates in decreasing size order.
    candidates = [live]
    if len(live) == 2:
        a0, a1 = live
        pair = sorted(live, key=lambda a: -mesh.shape[a])
        candidates += [(pair[0],), (pair[1],)]
    elif len(live) == 1:
        pass
    candidates.append(())
    bt = ()
    for cand in candidates:
        bsz = 1
        for a in cand:
            bsz *= mesh.shape[a]
        if b % bsz == 0:
            bt = cand
            break
    if live and bt != live:
        import logging

        logging.getLogger(__name__).warning(
            "_flash_sharded: batch %d does not divide dp axes %s (sizes %s);"
            " degrading batch sharding to %s — attention work is duplicated"
            " on the dropped axes. Pad B to a multiple of the dp size to"
            " avoid this.",
            b, live, tuple(mesh.shape[a] for a in live), bt or "replicated",
        )
    tensor = None
    if "tensor" in names and mesh.shape["tensor"] > 1:
        t = mesh.shape["tensor"]
        if h % t == 0 and kh % t == 0:
            tensor = "tensor"
    bspec = bt if bt else None
    qspec = P(bspec, None, tensor, None)
    sspec = P(bspec, None)

    # check_vma stays ON for real TPU lowerings: the kernels' pallas_call
    # out_shapes propagate the union of their operands' varying-manual-axes
    # (ops/vma.pallas_struct), so the VMA check types the per-shard program
    # end to end. On non-TPU meshes the kernel runs in the Pallas
    # INTERPRETER, which inlines the kernel body (ref-carrying fori_loop)
    # into the shard_map trace where the carry loses its vma — a known JAX
    # limitation whose sanctioned workaround is check_vma=False.
    vma_ok = mesh.devices.flat[0].platform == "tpu"
    if segment_ids is not None:

        def local4(qq, kk, vv, seg):
            return flash_attention_df(qq, kk, vv, causal, seg, scale)

        fn = shard_map(
            local4, mesh=mesh,
            in_specs=(qspec, qspec, qspec, sspec),
            out_specs=qspec,
            check_vma=vma_ok,
        )
        return fn(q, k, v, segment_ids)

    # common unsegmented case: 3-input wrapping — no dead (B, Sq) zeros
    # buffer threaded through just to keep the in_specs arity fixed
    def local3(qq, kk, vv):
        return flash_attention_df(qq, kk, vv, causal, None, scale)

    fn = shard_map(
        local3, mesh=mesh,
        in_specs=(qspec, qspec, qspec),
        out_specs=qspec,
        check_vma=vma_ok,
    )
    return fn(q, k, v)


def mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    segment_ids: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    use_flash: Optional[bool] = None,
    right_padded: bool = False,
    mesh=None,
) -> jnp.ndarray:
    """Dispatching attention entry point.

    use_flash=None auto-selects: Pallas flash kernel on TPU for Sq >= 1024
    (where the O(S^2) logits buffer stops fitting in VMEM/fusion budgets),
    XLA reference otherwise.

    right_padded=True asserts that segment_ids encodes nothing but trailing
    padding; under a causal mask real tokens can never attend to trailing
    pads, so the flash kernel can drop the segment mask and stay exact.
    Packed multi-document rows keep right_padded=False and use the kernel's
    block-diagonal segment masking (self-attention only, Sq == Sk).

    mesh: pass the active multi-device Mesh to keep the flash kernel on the
    sharded path — the pallas_call runs per-shard inside shard_map
    (_flash_sharded); without it GSPMD cannot partition the kernel and
    multi-chip jits fail to compile. The TPU-vs-not decision then follows
    the MESH's device platform (an AOT lowering for a v5e topology must pick
    the kernel even when the host process defaults to CPU).
    """
    sq = q.shape[1]
    # the kernel ignores segments when causality already covers them
    # (right-padded), and applies them in-kernel for packed self-attention
    flash_safe = (
        segment_ids is None
        or (causal and right_padded)
        or (causal and sq == k.shape[1])
    )
    multi = mesh is not None and mesh.size > 1
    if use_flash is None:
        platform = (
            mesh.devices.flat[0].platform if multi else _compile_target()
        )
        use_flash = platform == "tpu" and sq >= 1024 and flash_safe
    if use_flash and flash_safe:
        flash_segs = None
        if segment_ids is not None and not (causal and right_padded):
            flash_segs = segment_ids
        if multi:
            return _flash_sharded(q, k, v, causal, flash_segs, scale, mesh)
        # the _df wrapper adds a reference-backward custom_vjp so training
        # paths can differentiate through the Pallas kernel; identical to
        # flash_attention when no gradients flow
        from .flash_attention import flash_attention_df

        return flash_attention_df(q, k, v, causal, flash_segs, scale)
    return mha_reference(
        q, k, v, causal=causal, segment_ids=segment_ids, scale=scale
    )


def decode_attention_reference(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    *,
    prompt_lens: jnp.ndarray,
    write_pos: jnp.ndarray,
    prompt_pad: int,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Single-step attention against the two-region KV cache.

    q: (B, H, D) current-token queries
    k_cache/v_cache: (B, K, S, D) head-major. Valid columns per row b:
    [0, prompt_lens[b]) ∪ [prompt_pad, write_pos] (decoded tokens share one
    scalar write column per step; the current token sits at write_pos).
    """
    b, h, d = q.shape
    _, kh, s, _ = k_cache.shape
    if scale is None:
        scale = d ** -0.5
    g = h // kh
    qf = (q * jnp.asarray(scale, q.dtype)).reshape(b, kh, g, d)
    logits = jnp.einsum(
        "bkgd,bksd->bkgs", qf, k_cache, preferred_element_type=jnp.float32
    )
    ids = jnp.arange(s)[None, :]
    valid = (ids < prompt_lens[:, None]) | (
        (ids >= prompt_pad) & (ids <= write_pos)
    )  # (B, S)
    logits = jnp.where(valid[:, None, None, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bkgs,bksd->bkgd", probs.astype(v_cache.dtype), v_cache,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, h, d).astype(q.dtype)
