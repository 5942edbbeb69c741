"""Ulysses sequence-parallel attention == single-device attention."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from grasp_any_region_tpu.core.mesh import MeshSpec, make_mesh
from grasp_any_region_tpu.ops.attention import mha_reference
from grasp_any_region_tpu.parallel.ulysses import ulysses_attention


@pytest.mark.parametrize("causal", [True, False])
def test_ulysses_matches_reference(rng, causal):
    mesh = make_mesh(MeshSpec(data=1, fsdp=1, tensor=1, seq=8))
    b, s, h, kh, d = 2, 64, 8, 8, 16
    q = rng.standard_normal((b, s, h, d)).astype(np.float32)
    k = rng.standard_normal((b, s, kh, d)).astype(np.float32)
    v = rng.standard_normal((b, s, kh, d)).astype(np.float32)
    out = ulysses_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mesh,
        causal=causal, use_flash=False,
    )
    ref = mha_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_ulysses_gqa(rng):
    mesh = make_mesh(MeshSpec(data=1, fsdp=1, tensor=1, seq=4),
                     devices=jax.devices()[:4])
    b, s, h, kh, d = 1, 32, 8, 4, 8
    q = rng.standard_normal((b, s, h, d)).astype(np.float32)
    k = rng.standard_normal((b, s, kh, d)).astype(np.float32)
    v = rng.standard_normal((b, s, kh, d)).astype(np.float32)
    out = ulysses_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mesh,
                            causal=True, use_flash=False)
    ref = mha_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_ulysses_rejects_bad_head_count(rng):
    mesh = make_mesh(MeshSpec(data=1, fsdp=1, tensor=1, seq=8))
    q = jnp.zeros((1, 16, 4, 8))  # 4 heads < 8-way seq axis
    with pytest.raises(AssertionError):
        ulysses_attention(q, q, q, mesh)
