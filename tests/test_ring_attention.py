"""Ring (context-parallel) attention == single-device attention."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from grasp_any_region_tpu.core.mesh import MeshSpec, make_mesh
from grasp_any_region_tpu.ops.attention import mha_reference
from grasp_any_region_tpu.parallel.ring import ring_attention


@pytest.mark.parametrize("causal", [True, False])
def test_ring_matches_reference(rng, causal):
    mesh = make_mesh(MeshSpec(data=1, fsdp=1, tensor=1, seq=8))
    b, s, h, kh, d = 2, 64, 4, 4, 16
    q = rng.standard_normal((b, s, h, d)).astype(np.float32)
    k = rng.standard_normal((b, s, kh, d)).astype(np.float32)
    v = rng.standard_normal((b, s, kh, d)).astype(np.float32)
    out = ring_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mesh,
                         causal=causal)
    ref = mha_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                        causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_ring_gqa_more_ring_than_kv_heads(rng):
    # the case Ulysses cannot do: ring size 8 > 2 kv heads
    mesh = make_mesh(MeshSpec(data=1, fsdp=1, tensor=1, seq=8))
    b, s, h, kh, d = 1, 32, 8, 2, 8
    q = rng.standard_normal((b, s, h, d)).astype(np.float32)
    k = rng.standard_normal((b, s, kh, d)).astype(np.float32)
    v = rng.standard_normal((b, s, kh, d)).astype(np.float32)
    out = ring_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mesh,
                         causal=True)
    ref = mha_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                        causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow  # >15 s on the 1-core CPU lane (round-4 fast-lane budget)
def test_ring_grad_matches_reference(rng):
    # training is the point of ring attention: check gradients flow through
    # the ppermute rotation correctly
    mesh = make_mesh(MeshSpec(data=1, fsdp=1, tensor=1, seq=4),
                     devices=jax.devices()[:4])
    b, s, h, d = 1, 16, 2, 8
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention(q, k, v, mesh, causal=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, causal=True) ** 2)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def test_ring_rejects_indivisible_seq(rng):
    mesh = make_mesh(MeshSpec(data=1, fsdp=1, tensor=1, seq=8))
    q = jnp.zeros((1, 36, 4, 8))  # 36 % 8 != 0
    with pytest.raises(AssertionError):
        ring_attention(q, q, q, mesh)
