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

NEG_INF = -2.0 ** 30


def _vit_attn_kernel(q_ref, k_ref, v_ref, o_ref, *lse_ref,
                     scale: float, kv_valid: int, s_pad: int):
    q = q_ref[:].astype(jnp.float32) * scale  # (S, D)
    k = k_ref[:]
    s = jax.lax.dot_general(
        q, k.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (S, S)
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
    from .flash_backward import flash_attention_bwd

    q, k, v, out, lse = res
    return flash_attention_bwd(
        q, k, v, out, lse, g, causal=False,
        interpret=jax.default_backend() != "tpu",
    )


vit_attention_df.defvjp(_vit_attn_fwd, _vit_attn_bwd)


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
