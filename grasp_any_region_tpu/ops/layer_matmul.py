"""Layer-indexed matmuls for the decode step.

The decode loop reads one layer's weights per iteration out of the stacked
(L, Din, Dout) arrays. An XLA dynamic-slice at a traced layer index
materializes the slice (read + write + re-read ≈ 3x weight traffic —
docs/PERF_NOTES.md); these kernels instead stream the needed weight blocks
straight from HBM via a scalar-prefetch layer index in the BlockSpec
index_map. Weights are read-only, so (unlike the stacked-cache variant) XLA
inserts no defensive copies.

Decode is bandwidth-bound (M = batch is tiny); the kernels are shaped to
saturate HBM reads, not the MXU.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mm_kernel(lay_ref, x_ref, w_ref, o_ref):
    o_ref[:] = jnp.dot(
        x_ref[:], w_ref[:], preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def layer_matmul(
    x: jnp.ndarray,  # (B, Din)
    w_all: jnp.ndarray,  # (L, Din, Dout)
    layer: jnp.ndarray,  # () int32
    *,
    block_n: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """x @ w_all[layer] without materializing the layer slice."""
    b, din = x.shape
    L, _, dout = w_all.shape
    # weight block (din, block_n) bf16 is double-buffered; keep 2 blocks
    # within ~8 MB of VMEM
    vmem_cap = (4 * 1024 * 1024) // (2 * din) // 128 * 128
    block_n = min(block_n, dout, max(128, vmem_cap))
    assert dout % block_n == 0, f"Dout {dout} % block_n {block_n}"

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(dout // block_n,),
        in_specs=[
            pl.BlockSpec((b, din), lambda j, lay: (0, 0)),
            pl.BlockSpec((None, din, block_n), lambda j, lay: (lay[0], 0, j)),
        ],
        out_specs=pl.BlockSpec((b, block_n), lambda j, lay: (0, j)),
    )
    return pl.pallas_call(
        _mm_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, dout), x.dtype),
        interpret=interpret,
    )(layer.reshape(1).astype(jnp.int32), x, w_all)


def _swiglu_kernel(lay_ref, x_ref, wg_ref, wu_ref, o_ref):
    gate = jnp.dot(x_ref[:], wg_ref[:], preferred_element_type=jnp.float32)
    up = jnp.dot(x_ref[:], wu_ref[:], preferred_element_type=jnp.float32)
    o_ref[:] = (jax.nn.silu(gate) * up).astype(o_ref.dtype)


def layer_swiglu(
    x: jnp.ndarray,  # (B, Din)
    w_gate_all: jnp.ndarray,  # (L, Din, M)
    w_up_all: jnp.ndarray,  # (L, Din, M)
    layer: jnp.ndarray,
    *,
    block_n: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """silu(x @ w_gate[l]) * (x @ w_up[l]) fused, layer-indexed."""
    b, din = x.shape
    L, _, m = w_gate_all.shape
    block_n = min(block_n, m)
    assert m % block_n == 0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m // block_n,),
        in_specs=[
            pl.BlockSpec((b, din), lambda j, lay: (0, 0)),
            pl.BlockSpec((None, din, block_n), lambda j, lay: (lay[0], 0, j)),
            pl.BlockSpec((None, din, block_n), lambda j, lay: (lay[0], 0, j)),
        ],
        out_specs=pl.BlockSpec((b, block_n), lambda j, lay: (0, j)),
    )
    return pl.pallas_call(
        _swiglu_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, m), x.dtype),
        interpret=interpret,
    )(layer.reshape(1).astype(jnp.int32), x, w_gate_all, w_up_all)


def _qkv_kernel(lay_ref, x_ref, wq_ref, wk_ref, wv_ref, q_ref, k_ref, v_ref):
    x = x_ref[:]
    q_ref[:] = jnp.dot(x, wq_ref[:], preferred_element_type=jnp.float32).astype(q_ref.dtype)
    k_ref[:] = jnp.dot(x, wk_ref[:], preferred_element_type=jnp.float32).astype(k_ref.dtype)
    v_ref[:] = jnp.dot(x, wv_ref[:], preferred_element_type=jnp.float32).astype(v_ref.dtype)


def layer_qkv(
    x: jnp.ndarray,  # (B, D)
    wq_all: jnp.ndarray,  # (L, D, Hq)
    wk_all: jnp.ndarray,  # (L, D, Hk)
    wv_all: jnp.ndarray,  # (L, D, Hk)
    layer: jnp.ndarray,
    *,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One pass over all three attention projections of layer l.
    Hq/Hk are small (<=2048 for GAR-1B) so each full weight is one block."""
    b, d = x.shape
    L, _, hq = wq_all.shape
    hk = wk_all.shape[-1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((b, d), lambda j, lay: (0, 0)),
            pl.BlockSpec((None, d, hq), lambda j, lay: (lay[0], 0, 0)),
            pl.BlockSpec((None, d, hk), lambda j, lay: (lay[0], 0, 0)),
            pl.BlockSpec((None, d, hk), lambda j, lay: (lay[0], 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((b, hq), lambda j, lay: (0, 0)),
            pl.BlockSpec((b, hk), lambda j, lay: (0, 0)),
            pl.BlockSpec((b, hk), lambda j, lay: (0, 0)),
        ],
    )
    return pl.pallas_call(
        _qkv_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hq), x.dtype),
            jax.ShapeDtypeStruct((b, hk), x.dtype),
            jax.ShapeDtypeStruct((b, hk), x.dtype),
        ],
        interpret=interpret,
    )(layer.reshape(1).astype(jnp.int32), x, wq_all, wk_all, wv_all)


# ---------------------------------------------------------------------------
# int8 variants (weights dequantized in VMEM; HBM traffic halves)
# ---------------------------------------------------------------------------

def _mm_q8_kernel(lay_ref, x_ref, w_ref, s_ref, o_ref):
    wf = w_ref[:].astype(jnp.float32) * s_ref[:]
    o_ref[:] = jnp.dot(
        x_ref[:].astype(jnp.float32), wf, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def layer_matmul_q8(
    x: jnp.ndarray,  # (B, Din)
    w_q8: jnp.ndarray,  # (L, Din, Dout) int8
    scale: jnp.ndarray,  # (L, 1, Dout) fp32
    layer: jnp.ndarray,
    *,
    block_n: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    b, din = x.shape
    L, _, dout = w_q8.shape
    vmem_cap = (6 * 1024 * 1024) // din // 128 * 128  # int8: 1 byte/elem
    block_n = min(block_n, dout, max(128, vmem_cap))
    assert dout % block_n == 0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(dout // block_n,),
        in_specs=[
            pl.BlockSpec((b, din), lambda j, lay: (0, 0)),
            pl.BlockSpec((None, din, block_n), lambda j, lay: (lay[0], 0, j)),
            pl.BlockSpec((None, 1, block_n), lambda j, lay: (lay[0], 0, j)),
        ],
        out_specs=pl.BlockSpec((b, block_n), lambda j, lay: (0, j)),
    )
    return pl.pallas_call(
        _mm_q8_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, dout), x.dtype),
        interpret=interpret,
    )(layer.reshape(1).astype(jnp.int32), x, w_q8, scale)


def _swiglu_q8_kernel(lay_ref, x_ref, wg_ref, sg_ref, wu_ref, su_ref, o_ref):
    xf = x_ref[:].astype(jnp.float32)
    gate = jnp.dot(xf, wg_ref[:].astype(jnp.float32) * sg_ref[:],
                   preferred_element_type=jnp.float32)
    up = jnp.dot(xf, wu_ref[:].astype(jnp.float32) * su_ref[:],
                 preferred_element_type=jnp.float32)
    o_ref[:] = (jax.nn.silu(gate) * up).astype(o_ref.dtype)


def layer_swiglu_q8(
    x: jnp.ndarray,
    wg_q8: jnp.ndarray, sg: jnp.ndarray,
    wu_q8: jnp.ndarray, su: jnp.ndarray,
    layer: jnp.ndarray,
    *,
    block_n: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    b, din = x.shape
    L, _, m = wg_q8.shape
    vmem_cap = (3 * 1024 * 1024) // din // 128 * 128  # two int8 blocks live
    block_n = min(block_n, m, max(128, vmem_cap))
    assert m % block_n == 0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m // block_n,),
        in_specs=[
            pl.BlockSpec((b, din), lambda j, lay: (0, 0)),
            pl.BlockSpec((None, din, block_n), lambda j, lay: (lay[0], 0, j)),
            pl.BlockSpec((None, 1, block_n), lambda j, lay: (lay[0], 0, j)),
            pl.BlockSpec((None, din, block_n), lambda j, lay: (lay[0], 0, j)),
            pl.BlockSpec((None, 1, block_n), lambda j, lay: (lay[0], 0, j)),
        ],
        out_specs=pl.BlockSpec((b, block_n), lambda j, lay: (0, j)),
    )
    return pl.pallas_call(
        _swiglu_q8_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, m), x.dtype),
        interpret=interpret,
    )(layer.reshape(1).astype(jnp.int32), x, wg_q8, sg, wu_q8, su)


def _qkv_q8_kernel(lay_ref, x_ref, wq_ref, sq_ref, wk_ref, sk_ref, wv_ref, sv_ref,
                   q_ref, k_ref, v_ref):
    xf = x_ref[:].astype(jnp.float32)
    q_ref[:] = jnp.dot(xf, wq_ref[:].astype(jnp.float32) * sq_ref[:],
                       preferred_element_type=jnp.float32).astype(q_ref.dtype)
    k_ref[:] = jnp.dot(xf, wk_ref[:].astype(jnp.float32) * sk_ref[:],
                       preferred_element_type=jnp.float32).astype(k_ref.dtype)
    v_ref[:] = jnp.dot(xf, wv_ref[:].astype(jnp.float32) * sv_ref[:],
                       preferred_element_type=jnp.float32).astype(v_ref.dtype)


def layer_qkv_q8(
    x: jnp.ndarray,
    wq_q8, sq, wk_q8, sk, wv_q8, sv,
    layer: jnp.ndarray,
    *,
    interpret: bool = False,
):
    b, d = x.shape
    L, _, hq = wq_q8.shape
    hk = wk_q8.shape[-1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((b, d), lambda j, lay: (0, 0)),
            pl.BlockSpec((None, d, hq), lambda j, lay: (lay[0], 0, 0)),
            pl.BlockSpec((None, 1, hq), lambda j, lay: (lay[0], 0, 0)),
            pl.BlockSpec((None, d, hk), lambda j, lay: (lay[0], 0, 0)),
            pl.BlockSpec((None, 1, hk), lambda j, lay: (lay[0], 0, 0)),
            pl.BlockSpec((None, d, hk), lambda j, lay: (lay[0], 0, 0)),
            pl.BlockSpec((None, 1, hk), lambda j, lay: (lay[0], 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((b, hq), lambda j, lay: (0, 0)),
            pl.BlockSpec((b, hk), lambda j, lay: (0, 0)),
            pl.BlockSpec((b, hk), lambda j, lay: (0, 0)),
        ],
    )
    return pl.pallas_call(
        _qkv_q8_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hq), x.dtype),
            jax.ShapeDtypeStruct((b, hk), x.dtype),
            jax.ShapeDtypeStruct((b, hk), x.dtype),
        ],
        interpret=interpret,
    )(layer.reshape(1).astype(jnp.int32), x, wq_q8, sq, wk_q8, sk, wv_q8, sv)
