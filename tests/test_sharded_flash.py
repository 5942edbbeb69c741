"""Parity of the shard_map'd flash-attention path (ops/attention.py
_flash_sharded) on the virtual CPU mesh.

GSPMD cannot partition a pallas_call, so under a multi-device mesh `mha`
routes the kernel through shard_map (batch over data/fsdp, heads over
tensor). These tests force use_flash=True on the CPU mesh (the kernel runs
in interpreter mode) and assert the sharded dispatch matches the XLA
reference — forward and backward (the custom_vjp applies per shard).

Reference behavior being replaced: flash-attn 2.7.4 under torch DDP/TP
(configs/gar_1b.py:78) — there the kernel is per-rank by construction; here
shard_map is what makes the kernel per-shard inside one GSPMD program.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from grasp_any_region_tpu.ops.attention import mha, mha_reference

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _mesh(data=2, fsdp=2, tensor=2):
    devs = np.array(jax.devices()[: data * fsdp * tensor]).reshape(
        data, fsdp, tensor, 1, 1
    )
    return Mesh(devs, ("data", "fsdp", "tensor", "seq", "pipe"))


def _qkv(b=4, s=256, h=4, kh=2, d=64, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (b, s, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, kh, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, s, kh, d), jnp.float32)
    return q, k, v


def test_sharded_flash_forward_matches_reference():
    mesh = _mesh()
    q, k, v = _qkv()
    ref = mha_reference(q, k, v, causal=True)
    out = jax.jit(
        lambda q, k, v: mha(q, k, v, causal=True, use_flash=True, mesh=mesh)
    )(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_sharded_flash_segment_ids():
    """Packed rows: the block-diagonal segment mask survives the shard_map
    (segment_ids shard over the batch axes alongside q)."""
    mesh = _mesh()
    q, k, v = _qkv(s=256)
    seg = jnp.asarray(
        np.repeat(np.array([[1] * 2 + [2] * 2] * 4), 64, axis=1), jnp.int32
    )
    ref = mha_reference(q, k, v, causal=True, segment_ids=seg)
    out = jax.jit(
        lambda q, k, v, s: mha(
            q, k, v, causal=True, segment_ids=s, use_flash=True,
            right_padded=False, mesh=mesh,
        )
    )(q, k, v, seg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_sharded_flash_backward_matches_reference():
    """Gradients flow through the per-shard custom_vjp identically."""
    mesh = _mesh()
    q, k, v = _qkv(b=4, s=128)

    def loss_flash(q, k, v):
        return (
            mha(q, k, v, causal=True, use_flash=True, mesh=mesh) ** 2
        ).sum()

    def loss_ref(q, k, v):
        return (mha_reference(q, k, v, causal=True) ** 2).sum()

    gf = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-2, rtol=1e-2
        )


def test_sharded_flash_nondividing_dims_degrade():
    """B=3 over data*fsdp=4 and heads that don't divide tensor: the wrapper
    must replicate those dims (duplicated work, identical math)."""
    mesh = _mesh()
    q, k, v = _qkv(b=3, s=128, h=3, kh=3)
    ref = mha_reference(q, k, v, causal=True)
    out = jax.jit(
        lambda q, k, v: mha(q, k, v, causal=True, use_flash=True, mesh=mesh)
    )(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_vision_block_under_mesh_matches_single_device():
    """The vision tower's _block routes attention through the sharded mha
    under a multi-device mesh (tiles over data/fsdp)."""
    from grasp_any_region_tpu.core.config import gar_tiny
    from grasp_any_region_tpu.models.vision import (
        init_vision_params, vision_forward,
    )

    cfg = gar_tiny().vision
    params = init_vision_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    pix = jax.random.normal(
        jax.random.PRNGKey(1),
        (4, 3) + tuple(cfg.img_size),
        jnp.float32,
    )
    ref = vision_forward(params, cfg, pix, use_flash=False,
                         compute_dtype=jnp.float32)
    mesh = _mesh()
    out = jax.jit(
        lambda p, x: vision_forward(p, cfg, x, use_flash=True, mesh=mesh,
                                    compute_dtype=jnp.float32)
    )(params, pix)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=5e-3, rtol=1e-3
    )
