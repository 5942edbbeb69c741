"""Decode megakernels: one token step in 3 Pallas calls per layer.

The round-2 fused decode step (models/llama.llama_decode_step_fused) issues
6 pallas_calls per layer with XLA glue (rms_norm, rope, residual adds)
between them — ~200 kernel boundaries per token at 16 layers, each costing
a DMA pipeline drain. These kernels merge a whole decode layer into 3:

  1. layer_qkv_norm_rope : rms_norm + q/k/v projections + rotary embedding
  2. decode_attention_wo : KV-cache append + flash attention + output
                           projection + residual  (extends
                           ops/decode_attention._fused_kernel)
  3. layer_mlp_residual  : rms_norm + swiglu + down projection + residual

No XLA ops remain between calls (the per-step rope cos/sin tiles are
computed ONCE per token outside the layer loop). Weight matrices stream
from HBM via scalar-prefetch layer indexing exactly as in
ops/layer_matmul.py; per-step HBM traffic is unchanged — the win is purely
fewer kernel boundaries and no elementwise round-trips through HBM.

Replaces the CUDA reference's decode path (HF generate loop over
flash-attn 2.7.4 + separate GEMM dispatches, hf_models/modeling_gar.py:418).

Rope in flat lane layout: activations stay (B, H*Dh); rotate_half within
each Dh-lane group is two pltpu.roll's + a lane-parity select (the
wrap-around lanes of the global roll land in the discarded half of the
select, so cyclic wrap across head boundaries is harmless).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -2.0 ** 30


def _rms_norm_f32(x_f32: jnp.ndarray, w: jnp.ndarray, eps: float) -> jnp.ndarray:
    var = jnp.mean(x_f32 * x_f32, axis=-1, keepdims=True)
    return x_f32 * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)


def _rope_flat(z: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray,
               dh: int, interpret: bool) -> jnp.ndarray:
    """Llama rotate-half rope on a flat (B, n_heads*dh) f32 tile.

    cos/sin are pre-tiled (B, n_heads*dh). rotate_half(x)=cat(-x2, x1) per
    dh-group == select(lane%dh < dh/2, -z[lane+dh/2], z[lane-dh/2]).
    """
    n = z.shape[-1]
    half = dh // 2
    if interpret:
        fwd = jnp.roll(z, n - half, axis=-1)
        bwd = jnp.roll(z, half, axis=-1)
    else:
        fwd = pltpu.roll(z, n - half, 1)  # out[i] = z[i + half (mod n)]
        bwd = pltpu.roll(z, half, 1)      # out[i] = z[i - half (mod n)]
    lane = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
    rh = jnp.where(lane % dh < half, -fwd, bwd)
    return z * cos + rh * sin


def _qkv_kernel(lay_ref, x_ref, nrm_ref, wq_ref, wk_ref, wv_ref,
                cosq_ref, sinq_ref, cosk_ref, sink_ref,
                q_ref, k_ref, v_ref, *, eps: float, dh: int, interpret: bool):
    xn = _rms_norm_f32(x_ref[:].astype(jnp.float32), nrm_ref[0], eps)
    xn = xn.astype(x_ref.dtype)
    q = jnp.dot(xn, wq_ref[:], preferred_element_type=jnp.float32)
    k = jnp.dot(xn, wk_ref[:], preferred_element_type=jnp.float32)
    v = jnp.dot(xn, wv_ref[:], preferred_element_type=jnp.float32)
    q_ref[:] = _rope_flat(q, cosq_ref[:], sinq_ref[:], dh, interpret).astype(q_ref.dtype)
    k_ref[:] = _rope_flat(k, cosk_ref[:], sink_ref[:], dh, interpret).astype(k_ref.dtype)
    v_ref[:] = v.astype(v_ref.dtype)


def layer_qkv_norm_rope(
    x: jnp.ndarray,        # (B, D)
    norm_all: jnp.ndarray,  # (L, D)
    wq_all: jnp.ndarray,   # (L, D, Hq)
    wk_all: jnp.ndarray,   # (L, D, Hk)
    wv_all: jnp.ndarray,   # (L, D, Hk)
    cosq: jnp.ndarray,     # (B, Hq) rope cos tiled across q heads
    sinq: jnp.ndarray,
    cosk: jnp.ndarray,     # (B, Hk)
    sink: jnp.ndarray,
    layer: jnp.ndarray,    # () int32
    *,
    eps: float,
    head_dim: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """rms_norm(x) @ {wq,wk,wv}[layer] with rope applied in-kernel.

    Whole weights live in VMEM (Hq + 2 Hk columns; 12 MB for GAR-1B — the
    same budget as ops/layer_matmul.layer_qkv). Returns flat (B, Hq) q and
    (B, Hk) k/v; q.reshape(B, H, dh) is layout-preserving.
    """
    b, d = x.shape
    L, _, hq = wq_all.shape
    hk = wk_all.shape[-1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((b, d), lambda j, lay: (0, 0)),
            pl.BlockSpec((None, 1, d), lambda j, lay: (lay[0], 0, 0)),
            pl.BlockSpec((None, d, hq), lambda j, lay: (lay[0], 0, 0)),
            pl.BlockSpec((None, d, hk), lambda j, lay: (lay[0], 0, 0)),
            pl.BlockSpec((None, d, hk), lambda j, lay: (lay[0], 0, 0)),
            pl.BlockSpec((b, hq), lambda j, lay: (0, 0)),
            pl.BlockSpec((b, hq), lambda j, lay: (0, 0)),
            pl.BlockSpec((b, hk), lambda j, lay: (0, 0)),
            pl.BlockSpec((b, hk), lambda j, lay: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((b, hq), lambda j, lay: (0, 0)),
            pl.BlockSpec((b, hk), lambda j, lay: (0, 0)),
            pl.BlockSpec((b, hk), lambda j, lay: (0, 0)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_qkv_kernel, eps=eps, dh=head_dim, interpret=interpret),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hq), x.dtype),
            jax.ShapeDtypeStruct((b, hk), x.dtype),
            jax.ShapeDtypeStruct((b, hk), x.dtype),
        ],
        interpret=interpret,
    )(layer.reshape(1).astype(jnp.int32), x, norm_all.reshape(L, 1, -1),
      wq_all, wk_all, wv_all, cosq, sinq, cosk, sink)


def _qkv_q8_kernel(lay_ref, x_ref, nrm_ref, wq_ref, sq_ref, wk_ref, sk_ref,
                   wv_ref, sv_ref, cosq_ref, sinq_ref, cosk_ref, sink_ref,
                   q_ref, k_ref, v_ref, *, eps: float, dh: int, interpret: bool):
    xn = _rms_norm_f32(x_ref[:].astype(jnp.float32), nrm_ref[0], eps)
    q = jnp.dot(xn, wq_ref[:].astype(jnp.float32) * sq_ref[:],
                preferred_element_type=jnp.float32)
    k = jnp.dot(xn, wk_ref[:].astype(jnp.float32) * sk_ref[:],
                preferred_element_type=jnp.float32)
    v = jnp.dot(xn, wv_ref[:].astype(jnp.float32) * sv_ref[:],
                preferred_element_type=jnp.float32)
    q_ref[:] = _rope_flat(q, cosq_ref[:], sinq_ref[:], dh, interpret).astype(q_ref.dtype)
    k_ref[:] = _rope_flat(k, cosk_ref[:], sink_ref[:], dh, interpret).astype(k_ref.dtype)
    v_ref[:] = v.astype(v_ref.dtype)


def layer_qkv_norm_rope_q8(
    x: jnp.ndarray,
    norm_all: jnp.ndarray,
    wq_q8, sq, wk_q8, sk, wv_q8, sv,  # (L, D, H*) int8 + (L, 1, H*) fp32
    cosq, sinq, cosk, sink,
    layer: jnp.ndarray,
    *,
    eps: float,
    head_dim: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """int8 weights dequantized in VMEM (models/quantize.py layout)."""
    b, d = x.shape
    L, _, hq = wq_q8.shape
    hk = wk_q8.shape[-1]

    def wspec(h_):
        return [
            pl.BlockSpec((None, d, h_), lambda j, lay: (lay[0], 0, 0)),
            pl.BlockSpec((None, 1, h_), lambda j, lay: (lay[0], 0, 0)),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((b, d), lambda j, lay: (0, 0)),
            pl.BlockSpec((None, 1, d), lambda j, lay: (lay[0], 0, 0)),
            *wspec(hq), *wspec(hk), *wspec(hk),
            pl.BlockSpec((b, hq), lambda j, lay: (0, 0)),
            pl.BlockSpec((b, hq), lambda j, lay: (0, 0)),
            pl.BlockSpec((b, hk), lambda j, lay: (0, 0)),
            pl.BlockSpec((b, hk), lambda j, lay: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((b, hq), lambda j, lay: (0, 0)),
            pl.BlockSpec((b, hk), lambda j, lay: (0, 0)),
            pl.BlockSpec((b, hk), lambda j, lay: (0, 0)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_qkv_q8_kernel, eps=eps, dh=head_dim, interpret=interpret),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hq), x.dtype),
            jax.ShapeDtypeStruct((b, hk), x.dtype),
            jax.ShapeDtypeStruct((b, hk), x.dtype),
        ],
        interpret=interpret,
    )(layer.reshape(1).astype(jnp.int32), x, norm_all.reshape(L, 1, -1),
      wq_q8, sq, wk_q8, sk, wv_q8, sv, cosq, sinq, cosk, sink)


def _mlp_q8_kernel(lay_ref, x_ref, nrm_ref, wg_ref, sg_ref, wu_ref, su_ref,
                   wd_ref, sd_ref, xo_ref, xn_ref, acc_ref,
                   *, eps: float, num_blocks: int):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        xn_ref[:] = _rms_norm_f32(
            x_ref[:].astype(jnp.float32), nrm_ref[0], eps
        ).astype(xn_ref.dtype)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xn = xn_ref[:].astype(jnp.float32)
    gate = jnp.dot(xn, wg_ref[:].astype(jnp.float32) * sg_ref[:],
                   preferred_element_type=jnp.float32)
    up = jnp.dot(xn, wu_ref[:].astype(jnp.float32) * su_ref[:],
                 preferred_element_type=jnp.float32)
    act = jax.nn.silu(gate) * up
    # w_down is quantized per OUTPUT column (L, 1, D) — the scale commutes
    # out of the contraction, so dequant applies to the (B, D) partial
    acc_ref[:] += jnp.dot(act, wd_ref[:].astype(jnp.float32),
                          preferred_element_type=jnp.float32) * sd_ref[:]

    @pl.when(j == num_blocks - 1)
    def _():
        xo_ref[:] = (x_ref[:].astype(jnp.float32) + acc_ref[:]).astype(xo_ref.dtype)


def layer_mlp_residual_q8(
    x: jnp.ndarray,
    norm_all: jnp.ndarray,
    wg_q8, sg, wu_q8, su,  # (L, D, M) int8 + (L, 1, M)
    wd_q8, sd,             # (L, M, D) int8 + (L, 1, D)
    layer: jnp.ndarray,
    *,
    eps: float,
    block_n: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    b, d = x.shape
    L, _, m = wg_q8.shape
    vmem_cap = (6 * 1024 * 1024) // (3 * d) // 128 * 128  # int8: 1 B/elem
    block_n = min(block_n, m, max(128, vmem_cap))
    assert m % block_n == 0
    nb = m // block_n

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((b, d), lambda j, lay: (0, 0)),
            pl.BlockSpec((None, 1, d), lambda j, lay: (lay[0], 0, 0)),
            pl.BlockSpec((None, d, block_n), lambda j, lay: (lay[0], 0, j)),
            pl.BlockSpec((None, 1, block_n), lambda j, lay: (lay[0], 0, j)),
            pl.BlockSpec((None, d, block_n), lambda j, lay: (lay[0], 0, j)),
            pl.BlockSpec((None, 1, block_n), lambda j, lay: (lay[0], 0, j)),
            pl.BlockSpec((None, block_n, d), lambda j, lay: (lay[0], j, 0)),
            pl.BlockSpec((None, 1, d), lambda j, lay: (lay[0], 0, 0)),
        ],
        out_specs=pl.BlockSpec((b, d), lambda j, lay: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((b, d), x.dtype),
            pltpu.VMEM((b, d), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_mlp_q8_kernel, eps=eps, num_blocks=nb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, d), x.dtype),
        interpret=interpret,
    )(layer.reshape(1).astype(jnp.int32), x, norm_all.reshape(L, 1, -1),
      wg_q8, sg, wu_q8, su, wd_q8, sd)


def _attn_wo_kernel(
    plen_ref, wpos_ref, lay_ref,  # scalar prefetch
    q_ref,     # (G, D) q heads sharing this kv head
    knew_ref,  # (1, D)
    vnew_ref,  # (1, D)
    k_ref,     # (S, D) layer cache slab (pre-write)
    v_ref,     # (S, D)
    wo_ref,    # (G*D, Dm) this kv-head group's rows of wo[layer]
    *refs,     # [ws_ref (1, Dm) if q8], x_ref, xo_ref, kcol, vcol, acc
    scale: float,
    block_s: int,
    prompt_pad: int,
    num_kv: int,
    q8: bool = False,
):
    if q8:
        ws_ref, x_ref, xo_ref, kcol_ref, vcol_ref, acc_ref = refs
    else:
        x_ref, xo_ref, kcol_ref, vcol_ref, acc_ref = refs
    bi = pl.program_id(0)
    ki = pl.program_id(1)
    plen = plen_ref[bi]
    wpos = wpos_ref[0]
    g, d = q_ref.shape
    # bf16 operands (MXU-native); scale the f32 logits after the dot
    q = q_ref[:]
    k_new = knew_ref[:].reshape(1, d)
    v_new = vnew_ref[:].reshape(1, d)

    # in-place cache append (see ops/decode_attention._fused_kernel): rewrite
    # the aligned 8-row window around wpos with only row wpos%8 replaced
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

    # fold in the current token; a (G, D) x (1, D) dot trips Mosaic's
    # vector.broadcast verifier, so this single column is a VPU
    # multiply-reduce instead of an MXU dot
    s_cur = jnp.sum(
        q.astype(jnp.float32) * k_new.astype(jnp.float32),
        axis=1, keepdims=True,
    ) * scale
    m_f = jnp.maximum(m, s_cur)
    alpha = jnp.exp(m - m_f)
    p_cur = jnp.exp(s_cur - m_f)
    l_f = l * alpha + p_cur
    a = (acc * alpha + p_cur * v_new.astype(jnp.float32)) / jnp.maximum(l_f, 1e-30)
    a = a.astype(x_ref.dtype)  # (G, D)

    # output projection for this kv group's G q heads: rows [gi*d, (gi+1)*d)
    # of the wo block (a (G, D) -> (1, G*D) reshape would be a sublane->lane
    # move Mosaic can't do; G small static loop instead)
    partial = jnp.zeros((1, xo_ref.shape[-1]), jnp.float32)
    for gi in range(g):
        w_blk = wo_ref[gi * d:(gi + 1) * d, :]
        a_blk = a[gi:gi + 1, :]
        if q8:
            w_blk = w_blk.astype(jnp.float32)
            a_blk = a_blk.astype(jnp.float32)
        partial += jax.lax.dot_general(
            a_blk, w_blk,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
    if q8:
        # per-output-column scale commutes out of the contraction
        partial = partial * ws_ref[:]

    # whole-(B, Dm) blocks with masked row updates: a dynamic-row store
    # (acc_ref[pl.ds(bi, 1)]) is a sublane offset Mosaic cannot statically
    # align, and (1, Dm) per-row blocks violate the 8-sublane block rule —
    # select on a row iota instead (B is small; the masking is free next
    # to the dots above)
    rows = jax.lax.broadcasted_iota(jnp.int32, acc_ref.shape, 0)
    sel = rows == bi
    partial_b = jnp.broadcast_to(partial, acc_ref.shape)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.where(sel, partial_b, acc_ref[:])

    @pl.when(ki > 0)
    def _():
        acc_ref[:] = jnp.where(sel, acc_ref[:] + partial_b, acc_ref[:])

    @pl.when(ki == num_kv - 1)
    def _():
        xo_ref[:] = jnp.where(
            sel,
            (x_ref[:].astype(jnp.float32) + acc_ref[:]).astype(xo_ref.dtype),
            xo_ref[:],
        )


def decode_attention_wo(
    q: jnp.ndarray,      # (B, H, D) roped query heads
    k_all: jnp.ndarray,  # (L, B, K, S, D) stacked cache
    v_all: jnp.ndarray,
    k_new: jnp.ndarray,  # (B, K, D) current token (roped)
    v_new: jnp.ndarray,
    wo_all: jnp.ndarray,  # (L, H*D, Dm) bf16, or int8 with wo_scale set
    x: jnp.ndarray,       # (B, Dm) residual stream
    layer: jnp.ndarray,
    *,
    prompt_lens: jnp.ndarray,
    write_pos: jnp.ndarray,
    prompt_pad: int,
    wo_scale: Optional[jnp.ndarray] = None,  # (L, 1, Dm) fp32 (int8 wo)
    scale: Optional[float] = None,
    block_s: int = 512,
    interpret: bool = False,
):
    """Cache append + attention + output projection + residual in ONE kernel.

    Returns (x + attn @ wo[layer], k_all', v_all') with the caches updated
    in place (aliased input->output)."""
    b, h, d = q.shape
    L, _, kh, s, _ = k_all.shape
    g = h // kh
    dm = x.shape[-1]
    q8 = wo_scale is not None
    if scale is None:
        scale = d ** -0.5
    block_s = min(block_s, s)
    assert s % block_s == 0

    kernel = functools.partial(
        _attn_wo_kernel, scale=scale, block_s=block_s,
        prompt_pad=prompt_pad, num_kv=kh, q8=q8,
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
            pl.BlockSpec((None, g * d, dm), lambda bi, ki, p, w, lay: (lay[0], ki, 0)),
            *([pl.BlockSpec((None, 1, dm), lambda bi, ki, p, w, lay: (lay[0], 0, 0))]
              if q8 else []),
            pl.BlockSpec((b, dm), lambda bi, ki, p, w, lay: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((b, dm), lambda bi, ki, p, w, lay: (0, 0)),
            pl.BlockSpec(
                (None, None, None, 8, d),
                lambda bi, ki, p, w, lay: (lay[0], bi, ki, w[0] // 8, 0),
            ),
            pl.BlockSpec(
                (None, None, None, 8, d),
                lambda bi, ki, p, w, lay: (lay[0], bi, ki, w[0] // 8, 0),
            ),
        ],
        scratch_shapes=[pltpu.VMEM((b, dm), jnp.float32)],
    )
    qg = q.reshape(b, kh, g, d)
    xo, k2, v2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, dm), x.dtype),
            jax.ShapeDtypeStruct(k_all.shape, k_all.dtype),
            jax.ShapeDtypeStruct(v_all.shape, v_all.dtype),
        ],
        # operand indices count scalar-prefetch args: 0..2 scalars, 3=q,
        # 4=k_new, 5=v_new, 6=k_all, 7=v_all, 8=wo, 9=x -> outputs 1, 2
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
        wo_all,
        *([wo_scale] if q8 else []),
        x,
    )
    return xo, k2, v2


def _mlp_kernel(lay_ref, x_ref, nrm_ref, wg_ref, wu_ref, wd_ref, xo_ref,
                xn_ref, acc_ref, *, eps: float, num_blocks: int):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        xn_ref[:] = _rms_norm_f32(
            x_ref[:].astype(jnp.float32), nrm_ref[0], eps
        ).astype(xn_ref.dtype)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xn = xn_ref[:]
    gate = jnp.dot(xn, wg_ref[:], preferred_element_type=jnp.float32)
    up = jnp.dot(xn, wu_ref[:], preferred_element_type=jnp.float32)
    act = (jax.nn.silu(gate) * up).astype(xn.dtype)
    acc_ref[:] += jnp.dot(act, wd_ref[:], preferred_element_type=jnp.float32)

    @pl.when(j == num_blocks - 1)
    def _():
        xo_ref[:] = (x_ref[:].astype(jnp.float32) + acc_ref[:]).astype(xo_ref.dtype)


def layer_mlp_residual(
    x: jnp.ndarray,        # (B, D)
    norm_all: jnp.ndarray,  # (L, D)
    wg_all: jnp.ndarray,   # (L, D, M)
    wu_all: jnp.ndarray,   # (L, D, M)
    wd_all: jnp.ndarray,   # (L, M, D)
    layer: jnp.ndarray,
    *,
    eps: float,
    block_n: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """x + swiglu(rms_norm(x)) @ w_down, layer-indexed, one kernel.

    Grid streams M in block_n columns; the down-projection partials
    accumulate in f32 scratch and the residual lands on the last block.
    """
    b, d = x.shape
    L, _, m = wg_all.shape
    # three bf16 weight blocks live double-buffered; stay under ~12 MB
    vmem_cap = (6 * 1024 * 1024) // (2 * 3 * d) // 128 * 128
    block_n = min(block_n, m, max(128, vmem_cap))
    assert m % block_n == 0
    nb = m // block_n

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((b, d), lambda j, lay: (0, 0)),
            pl.BlockSpec((None, 1, d), lambda j, lay: (lay[0], 0, 0)),
            pl.BlockSpec((None, d, block_n), lambda j, lay: (lay[0], 0, j)),
            pl.BlockSpec((None, d, block_n), lambda j, lay: (lay[0], 0, j)),
            pl.BlockSpec((None, block_n, d), lambda j, lay: (lay[0], j, 0)),
        ],
        out_specs=pl.BlockSpec((b, d), lambda j, lay: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((b, d), x.dtype),
            pltpu.VMEM((b, d), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_mlp_kernel, eps=eps, num_blocks=nb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, d), x.dtype),
        interpret=interpret,
    )(layer.reshape(1).astype(jnp.int32), x, norm_all.reshape(L, 1, -1),
      wg_all, wu_all, wd_all)
