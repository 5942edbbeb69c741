"""Compiled-kernel smoke tests — run ONLY on a real TPU backend.

The CPU suite exercises every Pallas kernel in interpret mode
(tests/test_kernels.py), which cannot catch Mosaic compilation or layout
regressions. These minimal compiled calls do. They are skipped on the CPU
mesh (tests/conftest.py pins the suite to cpu), and picked up when run as

    JAX_PLATFORMS='' python -m pytest tests/test_tpu_smoke.py --no-header -q

on a machine with a TPU (the verify-skill drive recipe).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

tpu = jax.default_backend() == "tpu"
pytestmark = pytest.mark.skipif(not tpu, reason="needs a real TPU backend")


def test_flash_attention_compiles_and_matches():
    from grasp_any_region_tpu.ops.attention import mha_reference
    from grasp_any_region_tpu.ops.flash_attention import flash_attention

    rng = np.random.default_rng(0)
    b, s, h, kh, d = 1, 1024, 4, 2, 64
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, s, kh, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, s, kh, d)), jnp.bfloat16)
    out = jax.jit(lambda q, k, v: flash_attention(q, k, v, causal=True))(q, k, v)
    ref = mha_reference(q, k, v, causal=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_fused_decode_step_compiles_and_matches():
    from grasp_any_region_tpu.core.config import gar_tiny
    from grasp_any_region_tpu.models import init_gar_params
    from grasp_any_region_tpu.models.llama import (
        KVCache,
        llama_decode_step,
        llama_decode_step_fused,
    )

    cfg = gar_tiny().text
    params = init_gar_params(jax.random.PRNGKey(0), gar_tiny(), dtype=jnp.bfloat16)
    rng = np.random.default_rng(1)
    b, s_max, pad = 8, 512, 128
    cache0 = KVCache(
        k=jnp.asarray(rng.standard_normal(
            (cfg.num_layers, b, cfg.num_kv_heads, s_max, cfg.head_dim)), jnp.bfloat16),
        v=jnp.asarray(rng.standard_normal(
            (cfg.num_layers, b, cfg.num_kv_heads, s_max, cfg.head_dim)), jnp.bfloat16),
        prompt_lens=jnp.asarray(rng.integers(10, pad, b), jnp.int32),
        write_pos=jnp.asarray(pad, jnp.int32),
    )
    embeds = jnp.asarray(rng.standard_normal((b, 1, cfg.hidden_size)), jnp.bfloat16)

    h_ref, _ = jax.jit(
        lambda e, c: llama_decode_step(params["llm"], cfg, e, c, pad, use_kernel=False)
    )(embeds, cache0)
    h_fused, _ = jax.jit(
        lambda e, c: llama_decode_step_fused(params["llm"], cfg, e, c, pad)
    )(embeds, cache0)
    np.testing.assert_allclose(
        np.asarray(h_ref, np.float32), np.asarray(h_fused, np.float32),
        atol=5e-2, rtol=5e-2,
    )


def test_vit_attention_compiles_and_matches():
    from grasp_any_region_tpu.ops.attention import mha_reference
    from grasp_any_region_tpu.ops.vit_attention import vit_attention

    rng = np.random.default_rng(2)
    t, s, h, d = 2, 1025, 4, 64
    q = jnp.asarray(rng.standard_normal((t, s, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((t, s, h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((t, s, h, d)), jnp.bfloat16)
    out = jax.jit(vit_attention)(q, k, v)
    ref = mha_reference(q, k, v, causal=False)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2,
    )
