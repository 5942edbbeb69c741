"""Fused ViT-block kernels: a Perception-Encoder layer in 4 Pallas calls.

The round-2 vision tower ran each block as ~9 XLA ops + one attention
kernel: LayerNorm (multi-pass over HBM), the qkv matmul, a separate rope
pass, head-major transposes into/out of the attention kernel, the wo
matmul, another LayerNorm, fc1 + gelu + fc2. At 136 tiles (B=8) the
(T, S, D) activation tensor is ~285 MB bf16 — every extra elementwise pass
is ~0.7 ms of HBM traffic, and the transposes copy 3x that. These kernels
cover the whole layer with no XLA ops in between:

  1. vit_ln_qkv      : LayerNorm + qkv projection (+bias) -> (T, S, 3D)
  2. vit_attention2  : (in ops/vit_attention.py) 2-heads-per-program
                       attention reading 128-lane head-pair slices
                       STRAIGHT out of the fused qkv buffer — no
                       head-major transpose in or out — with 2D rope
                       applied in-kernel
  3. vit_wo_residual : x + attn @ wo + bias
  4. vit_mlp_residual: LayerNorm + fc1 + gelu + fc2 + residual, the
                       hidden (T, S, 4D) activation never touching HBM

Inference-only (the kernels are forward-only; training keeps the XLA
composition whose attention already has the Pallas FA-2 custom_vjp).
Replaces the reference's timm PE block stack as driven by the patched
forward_features (modeling_perception_lm.py:181-221).

Layout invariants: S padded to a multiple of 8 by the caller (1025 -> 1032
for the standard 448/14 tile); head_dim 64 => head PAIRS are 128-lane
aligned slices of the (T, S, 3D) qkv buffer, which is what makes step 2's
transpose-free reads legal Mosaic blocks.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf_f32(z: jnp.ndarray) -> jnp.ndarray:
    """Abramowitz & Stegun 7.1.26 polynomial erf (|err| < 1.5e-7).

    Mosaic lowers neither erf nor erfc (jax.nn.gelu's exact path emits
    erfc), so the exact-GELU fused MLP computes erf on the VPU directly;
    1.5e-7 is far below bf16 activation resolution.
    """
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    az = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * az)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    e = 1.0 - poly * jnp.exp(-az * az)
    return jnp.where(z < 0, -e, e)


def _gelu_f32(h: jnp.ndarray, fast: bool) -> jnp.ndarray:
    if fast:  # tanh approximation (production presets; tanh lowers fine)
        c = 0.7978845608028654  # sqrt(2/pi)
        return 0.5 * h * (1.0 + jnp.tanh(c * (h + 0.044715 * h * h * h)))
    return 0.5 * h * (1.0 + _erf_f32(h * 0.7071067811865476))


def _layer_norm_f32(xf: jnp.ndarray, w, b, eps: float) -> jnp.ndarray:
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    return xf * w.astype(jnp.float32) + b.astype(jnp.float32)


def _row_block(s: int, target: int = 512) -> int:
    """Largest multiple-of-8 divisor of s that is <= target. LayerNorm and
    the MLP are per-token, so streaming S in row blocks is exact — and it
    is what keeps the (S, D) buffers inside the 16 MB scoped-VMEM limit at
    production shapes (S=1032, D=1024 overflowed with whole-S blocks)."""
    best = s
    for bs in range(8, min(s, target) + 1, 8):
        if s % bs == 0:
            best = bs
    return best if best <= s else s


def _ln_qkv_kernel(x_ref, lw_ref, lb_ref, w_ref, b_ref, o_ref, xn_ref,
                   *, eps: float):
    cb = pl.program_id(2)

    @pl.when(cb == 0)
    def _():
        xn_ref[:] = _layer_norm_f32(
            x_ref[:].astype(jnp.float32), lw_ref[0], lb_ref[0], eps
        ).astype(xn_ref.dtype)

    o_ref[:] = (
        jnp.dot(xn_ref[:], w_ref[:], preferred_element_type=jnp.float32)
        + b_ref[0].astype(jnp.float32)
    ).astype(o_ref.dtype)


def vit_ln_qkv(
    x: jnp.ndarray,       # (T, S, D), S % 8 == 0
    ln_scale: jnp.ndarray,  # (D,)
    ln_bias: jnp.ndarray,
    wqkv: jnp.ndarray,    # (D, 3D)
    bqkv: jnp.ndarray,    # (3D,)
    *,
    eps: float = 1e-6,
    block_n: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """LayerNorm(x) @ wqkv + bqkv in one kernel. Returns (T, S, 3D)."""
    t, s, d = x.shape
    n = wqkv.shape[-1]
    block_n = min(block_n, n)
    assert n % block_n == 0
    nb = n // block_n
    bs = _row_block(s)
    ns = s // bs

    out = pl.pallas_call(
        functools.partial(_ln_qkv_kernel, eps=eps),
        grid=(t, ns, nb),
        in_specs=[
            pl.BlockSpec((None, bs, d), lambda ti, sb, cb: (ti, sb, 0)),
            pl.BlockSpec((1, d), lambda ti, sb, cb: (0, 0)),
            pl.BlockSpec((1, d), lambda ti, sb, cb: (0, 0)),
            pl.BlockSpec((d, block_n), lambda ti, sb, cb: (0, cb)),
            pl.BlockSpec((1, block_n), lambda ti, sb, cb: (0, cb)),
        ],
        out_specs=pl.BlockSpec(
            (None, bs, block_n), lambda ti, sb, cb: (ti, sb, cb)
        ),
        out_shape=jax.ShapeDtypeStruct((t, s, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((bs, d), x.dtype)],
        interpret=interpret,
    )(x, ln_scale.reshape(1, d), ln_bias.reshape(1, d), wqkv,
      bqkv.reshape(1, n))
    return out


def _wo_kernel(a_ref, x_ref, w_ref, b_ref, ls_ref, o_ref):
    branch = (
        jnp.dot(a_ref[:], w_ref[:], preferred_element_type=jnp.float32)
        + b_ref[0].astype(jnp.float32)
    ) * ls_ref[0].astype(jnp.float32)
    o_ref[:] = (x_ref[:].astype(jnp.float32) + branch).astype(o_ref.dtype)


def vit_wo_residual(
    attn: jnp.ndarray,  # (T, S, D) token-major attention output
    x: jnp.ndarray,     # (T, S, D) residual stream
    wo: jnp.ndarray,    # (D, D)
    bo: jnp.ndarray,    # (D,)
    ls: Optional[jnp.ndarray] = None,  # (D,) LayerScale gamma (PE default)
    *,
    block_n: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """x + ls * (attn @ wo + bo)."""
    t, s, d = x.shape
    block_n = min(block_n, d)
    assert d % block_n == 0
    nb = d // block_n
    if ls is None:
        ls = jnp.ones((d,), jnp.float32)

    bs = _row_block(s)
    ns = s // bs

    return pl.pallas_call(
        _wo_kernel,
        grid=(t, ns, nb),
        in_specs=[
            pl.BlockSpec((None, bs, d), lambda ti, sb, cb: (ti, sb, 0)),
            pl.BlockSpec((None, bs, block_n), lambda ti, sb, cb: (ti, sb, cb)),
            pl.BlockSpec((d, block_n), lambda ti, sb, cb: (0, cb)),
            pl.BlockSpec((1, block_n), lambda ti, sb, cb: (0, cb)),
            pl.BlockSpec((1, block_n), lambda ti, sb, cb: (0, cb)),
        ],
        out_specs=pl.BlockSpec(
            (None, bs, block_n), lambda ti, sb, cb: (ti, sb, cb)
        ),
        out_shape=jax.ShapeDtypeStruct((t, s, d), x.dtype),
        interpret=interpret,
    )(attn, x, wo, bo.reshape(1, d), ls.reshape(1, d))


def _mlp_kernel(x_ref, lw_ref, lb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                ls_ref, o_ref, xn_ref, acc_ref, *, eps: float,
                num_blocks: int, fast_gelu: bool):
    mb = pl.program_id(2)

    @pl.when(mb == 0)
    def _():
        xn_ref[:] = _layer_norm_f32(
            x_ref[:].astype(jnp.float32), lw_ref[0], lb_ref[0], eps
        ).astype(xn_ref.dtype)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    h = (
        jnp.dot(xn_ref[:], w1_ref[:], preferred_element_type=jnp.float32)
        + b1_ref[0].astype(jnp.float32)
    )
    h = _gelu_f32(h, fast_gelu).astype(xn_ref.dtype)
    acc_ref[:] += jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)

    @pl.when(mb == num_blocks - 1)
    def _():
        branch = (
            acc_ref[:] + b2_ref[0].astype(jnp.float32)
        ) * ls_ref[0].astype(jnp.float32)
        o_ref[:] = (x_ref[:].astype(jnp.float32) + branch).astype(o_ref.dtype)


def vit_mlp_residual(
    x: jnp.ndarray,     # (T, S, D)
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    fc1: jnp.ndarray,   # (D, M)
    b1: jnp.ndarray,    # (M,)
    fc2: jnp.ndarray,   # (M, D)
    b2: jnp.ndarray,    # (D,)
    ls: Optional[jnp.ndarray] = None,  # (D,) LayerScale gamma
    *,
    eps: float = 1e-6,
    fast_gelu: bool = False,
    block_m: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """x + ls * (fc2(gelu(fc1(LayerNorm(x)))) + b2): the (S, M) hidden
    activation lives only in VMEM, streamed in block_m column chunks with
    an f32 accumulator for the fc2 partial sums."""
    t, s, d = x.shape
    m = fc1.shape[-1]
    block_m = min(block_m, m)
    assert m % block_m == 0
    nb = m // block_m
    bs = _row_block(s)
    ns = s // bs
    if ls is None:
        ls = jnp.ones((d,), jnp.float32)

    return pl.pallas_call(
        functools.partial(
            _mlp_kernel, eps=eps, num_blocks=nb, fast_gelu=fast_gelu
        ),
        grid=(t, ns, nb),
        in_specs=[
            pl.BlockSpec((None, bs, d), lambda ti, sb, mb: (ti, sb, 0)),
            pl.BlockSpec((1, d), lambda ti, sb, mb: (0, 0)),
            pl.BlockSpec((1, d), lambda ti, sb, mb: (0, 0)),
            pl.BlockSpec((d, block_m), lambda ti, sb, mb: (0, mb)),
            pl.BlockSpec((1, block_m), lambda ti, sb, mb: (0, mb)),
            pl.BlockSpec((block_m, d), lambda ti, sb, mb: (mb, 0)),
            pl.BlockSpec((1, d), lambda ti, sb, mb: (0, 0)),
            pl.BlockSpec((1, d), lambda ti, sb, mb: (0, 0)),
        ],
        out_specs=pl.BlockSpec((None, bs, d), lambda ti, sb, mb: (ti, sb, 0)),
        out_shape=jax.ShapeDtypeStruct((t, s, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bs, d), x.dtype),
            pltpu.VMEM((bs, d), jnp.float32),
        ],
        interpret=interpret,
    )(x, ln_scale.reshape(1, d), ln_bias.reshape(1, d),
      fc1, b1.reshape(1, m), fc2, b2.reshape(1, d), ls.reshape(1, d))
