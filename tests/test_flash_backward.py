"""Gradient parity: Pallas FA-2 backward vs differentiating the XLA
reference (mha_reference). Interpret mode on CPU; on-chip compiled smoke
lives in tests/test_tpu_smoke.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grasp_any_region_tpu.ops.attention import mha_reference
from grasp_any_region_tpu.ops.flash_attention import flash_attention
from grasp_any_region_tpu.ops.flash_backward import flash_attention_bwd


def _grads(rng, b, sq, sk, h, kh, d, causal, segments, block_q=64, block_k=64):
    q = jnp.asarray(rng.normal(size=(b, sq, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, sk, kh, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, sk, kh, d)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(b, sq, h, d)), jnp.float32)
    seg = None
    if segments:
        # two documents + trailing padding (id 0)
        cut = sq // 2
        seg = np.ones((b, sq), np.int32)
        seg[:, cut:] = 2
        seg[:, sq - sq // 8:] = 0
        seg = jnp.asarray(seg)

    ref, vjp = jax.vjp(
        lambda q, k, v: mha_reference(q, k, v, causal=causal,
                                      segment_ids=seg),
        q, k, v,
    )
    dq_ref, dk_ref, dv_ref = vjp(g)

    out, lse = flash_attention(
        q, k, v, causal=causal, segment_ids=seg,
        block_q=block_q, block_k=block_k, interpret=True, return_lse=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    dq, dk, dv = flash_attention_bwd(
        q, k, v, out, lse, g, causal=causal, segment_ids=seg,
        block_q=block_q, block_k=block_k, interpret=True,
    )
    return (dq, dk, dv), (dq_ref, dk_ref, dv_ref)


@pytest.mark.parametrize(
    "b,sq,sk,h,kh,d,causal,segments",
    [
        (1, 128, 128, 2, 2, 32, True, False),     # plain causal MHA
        (2, 192, 192, 4, 2, 32, True, False),     # GQA, non-multiple of 128
        (1, 256, 256, 4, 1, 32, False, False),    # non-causal (ViT case), MQA
        (1, 100, 228, 2, 2, 32, True, False),     # q suffix (right-aligned)
        (2, 160, 160, 4, 2, 32, True, True),      # packed segments + GQA
        (1, 256, 256, 2, 2, 64, True, True),      # packed, block-aligned
    ],
)
def test_flash_backward_matches_reference(rng, b, sq, sk, h, kh, d,
                                          causal, segments):
    got, ref = _grads(rng, b, sq, sk, h, kh, d, causal, segments)
    for name, a, e in zip("dq dk dv".split(), got, ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(e), atol=2e-4, rtol=2e-3,
            err_msg=f"{name} mismatch "
                    f"(causal={causal} gqa={h}/{kh} segments={segments})",
        )


def test_flash_df_uses_pallas_backward(rng):
    """The custom_vjp pair end-to-end: grads of a scalar loss through
    flash_attention_df (Pallas fwd+bwd, interpret) == XLA reference."""
    import grasp_any_region_tpu.ops.flash_attention as FA

    b, s, h, kh, d = 1, 128, 4, 2, 32
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, kh, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, kh, d)), jnp.float32)

    orig = FA.flash_attention
    FA.flash_attention = (
        lambda *a, **kw: orig(*a, interpret=True,
                              block_q=64, block_k=64, **kw)
    )
    try:
        assert FA.BACKWARD_IMPL == "pallas"

        def loss(q, k, v):
            return jnp.sum(FA.flash_attention_df(q, k, v, True, None, None) ** 2)

        dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    finally:
        FA.flash_attention = orig

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, causal=True) ** 2)

    dq_r, dk_r, dv_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, e in [(dq, dq_r), (dk, dk_r), (dv, dv_r)]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   atol=2e-4, rtol=2e-3)


def test_lse_matches_reference(rng):
    b, s, h, d = 1, 192, 2, 32
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    _, lse = flash_attention(q, k, v, causal=True, interpret=True,
                             block_q=64, block_k=64, return_lse=True)
    scale = d ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
    mask = jnp.tril(jnp.ones((s, s), bool))
    logits = jnp.where(mask[None, None], logits, -jnp.inf)
    lse_ref = jax.scipy.special.logsumexp(logits, axis=-1)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(lse_ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("block_q", [None, 64])
def test_vit_onepass_backward_parity(block_q):
    """The single-program ViT backward (ops/vit_attention.py
    vit_attention_bwd_onepass) vs differentiating the XLA reference —
    non-causal, unpadded-S + a 128-pad case, whole-row and blocked q."""
    from grasp_any_region_tpu.ops.vit_attention import (
        vit_attention, vit_attention_bwd_onepass,
    )

    rng = np.random.default_rng(11)
    t, s, h, d = 2, 160, 3, 32  # s not a 128 multiple: exercises padding
    q = jnp.asarray(rng.normal(size=(t, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(t, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(t, s, h, d)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(t, s, h, d)), jnp.float32)

    def ref_attn(q, k, v):
        s_ = jnp.einsum("tihd,tjhd->thij", q, k) * (d ** -0.5)
        p = jax.nn.softmax(s_, axis=-1)
        return jnp.einsum("thij,tjhd->tihd", p, v)

    ref, vjp = jax.vjp(ref_attn, q, k, v)
    dq_r, dk_r, dv_r = vjp(g)

    out, lse = vit_attention(q, k, v, return_lse=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    dq, dk, dv = vit_attention_bwd_onepass(
        q, k, v, out, lse, g, block_q=block_q, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_r),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_r),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_r),
                               rtol=2e-4, atol=2e-4)
