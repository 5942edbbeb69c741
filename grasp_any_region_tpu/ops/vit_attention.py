"""Fused non-causal attention for the ViT (moderate sequence lengths).

The vision tower attends bidirectionally over S ≈ 1k tokens per tile. XLA's
einsum path materializes (T, H, S, S) fp32 logits in HBM (~1.1 GB/layer for
17 tiles — 3+ GB of traffic per layer); the generic flash kernel pays online-
softmax and KV-reload overhead that small S doesn't need. Here one program
per (tile, head) holds the entire (S_pad, S_pad) logits block in VMEM
(1280^2 fp32 = 6.5 MB), does one matmul + row softmax + one matmul, and never
touches HBM for intermediates.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -2.0 ** 30


def _is_tpu_target() -> bool:
    from ..core.platform import is_tpu

    return is_tpu()


def _vit_attn_kernel(q_ref, k_ref, v_ref, o_ref, *lse_ref,
                     scale: float, kv_valid: int, s_pad: int):
    # operands stay in the input dtype: the MXU consumes bf16 natively with
    # f32 accumulation, while f32 x f32 dots cost ~8x (measured 28 ms/layer
    # of the 57 ms ViT block — the single largest vision cost). Upcasting
    # bf16 inputs adds no information; scale applies to the f32 logits.
    s = jax.lax.dot_general(
        q_ref[:], k_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (S, S) f32
    if kv_valid < s_pad:
        ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(ids < kv_valid, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = p / l
    o_ref[:] = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)
    if lse_ref:
        # (1, S) layout: Mosaic's last-two-dims block rule (see
        # ops/flash_attention.py with_lse)
        lse_ref[0][:] = (m + jnp.log(jnp.maximum(l, 1e-30)))[:, 0].reshape(1, -1)


@jax.custom_vjp
def vit_attention_df(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Differentiable wrapper: Pallas forward + Pallas FA-2 backward
    (ops/flash_backward.py, non-causal single-head-group configuration).

    pallas_call has no automatic VJP — without this, any training path that
    reaches the fused kernel on TPU dies with 'Linearization failed'
    (caught by the round-2 on-chip train-CLI smoke; the CPU suite never
    sees it because CPU dispatches to mha)."""
    return vit_attention(q, k, v)


def _vit_attn_fwd(q, k, v):
    out, lse = vit_attention(q, k, v, return_lse=True)
    return out, (q, k, v, out, lse)


def _vit_attn_bwd(res, g):
    q, k, v, out, lse = res
    return vit_attention_bwd_onepass(
        q, k, v, out, lse, g,
        interpret=not _is_tpu_target(),
    )


vit_attention_df.defvjp(_vit_attn_fwd, _vit_attn_bwd)


def _vit_bwd_kernel(q_ref, do_ref, k_ref, v_ref, lse_ref, delta_ref,
                    dq_ref, dk_ref, dv_ref, dk_acc, dv_acc, *,
                    scale: float, kv_valid: int, s_pad: int,
                    block_q: int, num_q: int):
    """One-pass backward for one (tile, head): K/V stay VMEM-resident, the
    probability block is computed ONCE and feeds dv, ds, dq and dk — vs the
    generic FA-2 pair (ops/flash_backward.py) which recomputes p in both
    its dq and dk/dv kernels and streams K in 128-row blocks (poor MXU
    shapes at Dh=64 and lots of grid overhead at S~1k). Measured train-path
    motivation: docs/PERF_NOTES.md round-4 addendum 2 (ViT bwd at 57 TF/s
    was the widest-from-ceiling span of the train step)."""
    qi = pl.program_id(1)
    q_start = qi * block_q

    @pl.when(qi == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[:]          # (BQ, D) input dtype
    do = do_ref[:]
    k = k_ref[:]          # (S, D)
    v = v_ref[:]
    lse = lse_ref[0, :].reshape(block_q, 1)
    delta = delta_ref[0, :].reshape(block_q, 1)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (BQ, S) f32
    if kv_valid < s_pad:
        ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(ids < kv_valid, s, NEG_INF)
    p = jnp.exp(s - lse)  # (BQ, S); pad query rows are finite (zeroed dO)
    p_lo = p.astype(q.dtype)
    dv_acc[:] += jax.lax.dot_general(
        p_lo, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (S, D)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BQ, S)
    ds = (p * (dp - delta)).astype(q.dtype)
    dq_ref[:] = (jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale).astype(dq_ref.dtype)
    dk_acc[:] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (S, D)

    @pl.when(qi == num_q - 1)
    def _():
        dk_ref[:] = (dk_acc[:] * scale).astype(dk_ref.dtype)
        dv_ref[:] = dv_acc[:].astype(dv_ref.dtype)


def vit_attention_bwd_onepass(
    q: jnp.ndarray,    # (T, S, H, D)
    k: jnp.ndarray,
    v: jnp.ndarray,
    out: jnp.ndarray,  # (T, S, H, D) forward output
    lse: jnp.ndarray,  # (T, H, S) forward row logsumexp
    g: jnp.ndarray,    # (T, S, H, D) cotangent
    *,
    scale: Optional[float] = None,
    block_q: Optional[int] = None,
    interpret: bool = False,
):
    """dq/dk/dv for the fused ViT attention. block_q defaults to the whole
    padded row range (one program per tile-head; two (S,S) f32 blocks +
    operands ≈ 12 MB VMEM at S=1025) — pass a divisor of S_pad to shrink
    VMEM if a bigger ViT config overflows the scoped limit."""
    t, s, h, d = q.shape
    if scale is None:
        scale = d ** -0.5
    pad = (-s) % 128
    if pad:
        cfgpad = ((0, 0), (0, pad), (0, 0), (0, 0))
        q, k, v, out, g = (jnp.pad(x, cfgpad) for x in (q, k, v, out, g))
        lse = jnp.pad(lse, ((0, 0), (0, 0), (0, pad)))
    s_pad = s + pad
    if block_q is None:
        block_q = s_pad
    assert s_pad % block_q == 0
    num_q = s_pad // block_q

    def heads(x):
        return x.transpose(0, 2, 1, 3).reshape(t * h, s_pad, d)

    qh, kh, vh, doh = heads(q), heads(k), heads(v), heads(g)
    # delta = rowsum(dO * O) — cheap elementwise, precomputed in XLA like
    # the generic backward
    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    ).transpose(0, 2, 1).reshape(t * h, 1, s_pad)
    lse_r = lse.reshape(t * h, 1, s_pad)

    kernel = functools.partial(
        _vit_bwd_kernel, scale=scale, kv_valid=s, s_pad=s_pad,
        block_q=block_q, num_q=num_q,
    )
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(t * h, num_q),
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda i, qi: (i, qi, 0)),
            pl.BlockSpec((None, block_q, d), lambda i, qi: (i, qi, 0)),
            pl.BlockSpec((None, s_pad, d), lambda i, qi: (i, 0, 0)),
            pl.BlockSpec((None, s_pad, d), lambda i, qi: (i, 0, 0)),
            pl.BlockSpec((None, 1, block_q), lambda i, qi: (i, 0, qi)),
            pl.BlockSpec((None, 1, block_q), lambda i, qi: (i, 0, qi)),
        ],
        out_specs=[
            pl.BlockSpec((None, block_q, d), lambda i, qi: (i, qi, 0)),
            pl.BlockSpec((None, s_pad, d), lambda i, qi: (i, 0, 0)),
            pl.BlockSpec((None, s_pad, d), lambda i, qi: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t * h, s_pad, d), q.dtype),
            jax.ShapeDtypeStruct((t * h, s_pad, d), q.dtype),
            jax.ShapeDtypeStruct((t * h, s_pad, d), q.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((s_pad, d), jnp.float32),
            pltpu.VMEM((s_pad, d), jnp.float32),
        ],
        interpret=interpret,
    )(qh, doh, kh, vh, lse_r, delta)

    def unheads(x):
        return x.reshape(t, h, s_pad, d).transpose(0, 2, 1, 3)[:, :s]

    return unheads(dq), unheads(dk), unheads(dv)


def _fused_qkv_kernel(q_ref, k_ref, v_ref, cos_ref, sin_ref, o_ref, *,
                      scale: float, kv_valid: int, head_dim: int,
                      interpret: bool):
    """One program = one (head pair, tile): q/k/v are 128-lane slices read
    straight from the fused (T, S, 3D) qkv buffer; rope applied in-kernel."""
    s_pad = q_ref.shape[0]
    d = head_dim
    cos = cos_ref[:]
    sin = sin_ref[:]

    def rope(z):
        # rotate_half within each 64-lane head group on the 128-lane pair:
        # rh[i] = -z[i+32] for lane%64 < 32 else z[i-32]; the global roll's
        # wrap-around lands in the discarded half of the select
        n = z.shape[-1]
        half = d // 2
        if interpret:
            fwd = jnp.roll(z, n - half, axis=-1)
            bwd = jnp.roll(z, half, axis=-1)
        else:
            fwd = pltpu.roll(z, n - half, 1)
            bwd = pltpu.roll(z, half, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
        rh = jnp.where(lane % d < half, -fwd, bwd)
        return z * cos + rh * sin

    # rope in f32 on the VPU, then back to the input dtype: the MXU runs
    # bf16 x bf16 -> f32 natively; f32 operands would cost ~8x
    q = rope(q_ref[:].astype(jnp.float32)).astype(q_ref.dtype)
    k = rope(k_ref[:].astype(jnp.float32)).astype(k_ref.dtype)
    v = v_ref[:]
    outs = []
    for i in range(2):
        qi = q[:, i * d:(i + 1) * d]
        ki = k[:, i * d:(i + 1) * d]
        vi = v[:, i * d:(i + 1) * d]
        s = jax.lax.dot_general(
            qi, ki, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (S, S) f32
        if kv_valid < s_pad:
            ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(ids < kv_valid, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outs.append(jax.lax.dot_general(
            p.astype(vi.dtype), vi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
    o_ref[:] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def vit_attention_fused_qkv(
    qkv: jnp.ndarray,   # (T, S_pad, 3D) from ops/vit_block.vit_ln_qkv
    cos2: jnp.ndarray,  # (H/2, S_pad, 128) rope pair tables (ops/rope.py)
    sin2: jnp.ndarray,
    num_heads: int,
    head_dim: int,
    *,
    kv_valid: int,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Transpose-free ViT attention: head PAIRS (2 x 64 lanes = one aligned
    128-lane block) are sliced straight out of the fused qkv buffer, rope is
    applied inside the kernel, and the output lands token-major (T, S, D) —
    no head-major round trips (two ~280 MB copies each way at 136 tiles).
    kv_valid masks both the pad tail and nothing else (non-causal)."""
    t, s_pad, n3 = qkv.shape
    h, d = num_heads, head_dim
    dm = h * d
    assert n3 == 3 * dm and h % 2 == 0 and 2 * d == 128, (n3, h, d)
    hp = h // 2
    if scale is None:
        scale = d ** -0.5

    kernel = functools.partial(
        _fused_qkv_kernel, scale=scale, kv_valid=kv_valid, head_dim=d,
        interpret=interpret,
    )
    # q pairs are 128-lane blocks 0..hp-1, k pairs hp..2hp-1, v 2hp..3hp-1
    out = pl.pallas_call(
        kernel,
        grid=(hp, t),  # t fastest: the pair's rope table loads once per j
        in_specs=[
            pl.BlockSpec((None, s_pad, 2 * d), lambda j, ti: (ti, 0, j)),
            pl.BlockSpec((None, s_pad, 2 * d), lambda j, ti, hp=hp: (ti, 0, hp + j)),
            pl.BlockSpec((None, s_pad, 2 * d), lambda j, ti, hp=hp: (ti, 0, 2 * hp + j)),
            pl.BlockSpec((None, s_pad, 2 * d), lambda j, ti: (j, 0, 0)),
            pl.BlockSpec((None, s_pad, 2 * d), lambda j, ti: (j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, s_pad, 2 * d), lambda j, ti: (ti, 0, j)),
        out_shape=jax.ShapeDtypeStruct((t, s_pad, dm), qkv.dtype),
        interpret=interpret,
    )(qkv, qkv, qkv, cos2, sin2)
    return out


def vit_attention(
    q: jnp.ndarray,  # (T, S, H, D)
    k: jnp.ndarray,  # (T, S, H, D)  (no GQA in the vision tower)
    v: jnp.ndarray,
    *,
    scale: Optional[float] = None,
    return_lse: bool = False,
    interpret: bool = False,
):
    t, s, h, d = q.shape
    if scale is None:
        scale = d ** -0.5
    pad = (-s) % 128
    if pad:
        cfgpad = ((0, 0), (0, pad), (0, 0), (0, 0))
        q = jnp.pad(q, cfgpad)
        k = jnp.pad(k, cfgpad)
        v = jnp.pad(v, cfgpad)
    s_pad = s + pad

    qh = q.transpose(0, 2, 1, 3).reshape(t * h, s_pad, d)
    kh = k.transpose(0, 2, 1, 3).reshape(t * h, s_pad, d)
    vh = v.transpose(0, 2, 1, 3).reshape(t * h, s_pad, d)

    kernel = functools.partial(
        _vit_attn_kernel, scale=scale, kv_valid=s, s_pad=s_pad
    )
    out_specs = [pl.BlockSpec((None, s_pad, d), lambda i: (i, 0, 0))]
    out_shapes = [jax.ShapeDtypeStruct((t * h, s_pad, d), q.dtype)]
    if return_lse:
        out_specs.append(pl.BlockSpec((None, 1, s_pad), lambda i: (i, 0, 0)))
        out_shapes.append(jax.ShapeDtypeStruct((t * h, 1, s_pad), jnp.float32))
    res = pl.pallas_call(
        kernel,
        grid=(t * h,),
        in_specs=[
            pl.BlockSpec((None, s_pad, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, s_pad, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, s_pad, d), lambda i: (i, 0, 0)),
        ],
        out_specs=out_specs if return_lse else out_specs[0],
        out_shape=out_shapes if return_lse else out_shapes[0],
        interpret=interpret,
    )(qh, kh, vh)
    out = res[0] if return_lse else res
    out = out.reshape(t, h, s_pad, d).transpose(0, 2, 1, 3)[:, :s]
    if return_lse:
        # flash_attention_bwd takes lse shaped (B, H, Sq)
        return out, res[1].reshape(t, h, s_pad)[:, :, :s]
    return out
