"""Normalization ops.

RMSNorm (Llama decoder) and LayerNorm (PE ViT). The jnp forms are the
reference semantics (fp32 math, cast back). On TPU the ViT's LayerNorm is a
measured hot spot — XLA lowers the mean/var/normalize chain as multiple HBM
passes over the (17, 1025, 1024) activations (~98 ms of the 23-layer
forward) — so `layer_norm` dispatches to a single-pass Pallas kernel on TPU
(one read + one write per tile-row block), keeping the jnp form for CPU and
for gradients (the kernel is forward-only; training uses the jnp path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .vma import pallas_struct


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * (var + eps) ** -0.5
    return (xf * weight.astype(jnp.float32)).astype(x.dtype)


def layer_norm_reference(
    x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-6
) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    xf = (xf - mean) * (var + eps) ** -0.5
    return (xf * weight.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def _ln_kernel(x_ref, w_ref, b_ref, o_ref, *, eps: float):
    xf = x_ref[:].astype(jnp.float32)  # (rows, D)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    o_ref[:] = (
        xf * w_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    ).astype(o_ref.dtype)


def layer_norm_fused(
    x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-6,
    *, block_rows: int = 256, interpret: bool = False,
) -> jnp.ndarray:
    """Single-pass Pallas LayerNorm over the trailing dim (rows blocked)."""
    from jax.experimental import pallas as pl

    shape = x.shape
    d = shape[-1]
    rows = 1
    for s in shape[:-1]:
        rows *= s
    x2 = x.reshape(rows, d)
    pad = (-rows) % block_rows
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    n_blocks = x2.shape[0] // block_rows
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block_rows, d), lambda i: (i, 0)),
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((d,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((block_rows, d), lambda i: (i, 0)),
        out_shape=pallas_struct(x2.shape, x.dtype, x2, weight, bias),
        interpret=interpret,
    )(x2, weight, bias)
    if pad:
        out = out[:rows]
    return out.reshape(shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _layer_norm_tpu(x, weight, bias, eps):
    return layer_norm_fused(x, weight, bias, eps)


def _ln_fwd(x, weight, bias, eps):
    return layer_norm_fused(x, weight, bias, eps), (x, weight, bias)


def _ln_bwd(eps, res, g):
    # gradients via the reference form (the Pallas kernel is forward-only)
    x, weight, bias = res
    _, vjp = jax.vjp(
        lambda x, w, b: layer_norm_reference(x, w, b, eps), x, weight, bias
    )
    return vjp(g)


_layer_norm_tpu.defvjp(_ln_fwd, _ln_bwd)


def layer_norm(
    x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-6
) -> jnp.ndarray:
    # NOTE: the Pallas kernel above measured NEUTRAL-to-negative end-to-end
    # (B=8 caption batch 4247 -> 4366 ms with it dispatched on TPU): pulling
    # LN out of XLA's fusion with the adjacent qkv/MLP matmuls costs about
    # what the single-pass kernel saves. Kept (with grads) for future block-
    # level fusion work; the reference form is the production path.
    return layer_norm_reference(x, weight, bias, eps)
