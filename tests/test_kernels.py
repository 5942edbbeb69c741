"""Pallas kernel tests in interpreter mode (run on CPU; the same kernels were
also validated compiled on the real chip — see .claude/skills/verify)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _np_attention(q, k, v, causal):
    q = q.astype(np.float32); k = k.astype(np.float32); v = v.astype(np.float32)
    b, sq, h, d = q.shape
    sk, kh = k.shape[1], k.shape[2]
    rep = h // kh
    k = np.repeat(k, rep, axis=2)
    v = np.repeat(v, rep, axis=2)
    logits = np.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(d)
    if causal:
        mask = (np.arange(sq)[:, None] + sk - sq) >= np.arange(sk)[None, :]
        logits = np.where(mask[None, None], logits, -1e30)
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bkhd->bqhd", p, v)


@pytest.mark.parametrize(
    "b,sq,sk,h,kh,d,causal",
    [
        (1, 256, 256, 4, 2, 64, True),
        (1, 300, 300, 2, 2, 64, True),   # non-block-multiple
        (1, 128, 256, 4, 1, 64, True),   # suffix query (right-aligned)
        (2, 256, 256, 2, 2, 64, False),  # non-causal with padded keys
    ],
)
def test_flash_attention_interpret(rng, b, sq, sk, h, kh, d, causal):
    from grasp_any_region_tpu.ops.flash_attention import flash_attention

    q = rng.standard_normal((b, sq, h, d)).astype(np.float32)
    k = rng.standard_normal((b, sk, kh, d)).astype(np.float32)
    v = rng.standard_normal((b, sk, kh, d)).astype(np.float32)
    out = flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        causal=causal, block_q=128, block_k=128, interpret=True,
    )
    ref = _np_attention(q, k, v, causal)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)


def test_decode_attention_interpret(rng):
    from grasp_any_region_tpu.ops.attention import decode_attention_reference
    from grasp_any_region_tpu.ops.decode_attention import decode_attention

    b, kh, s, d, h = 2, 2, 512, 64, 8
    q = rng.standard_normal((b, h, d)).astype(np.float32)
    kc = rng.standard_normal((b, kh, s, d)).astype(np.float32)
    vc = rng.standard_normal((b, kh, s, d)).astype(np.float32)
    plens = jnp.asarray([100, 220], jnp.int32)
    wpos = jnp.asarray(300, jnp.int32)
    kwargs = dict(prompt_lens=plens, write_pos=wpos, prompt_pad=256)
    out = decode_attention(
        jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc),
        block_s=128, interpret=True, **kwargs,
    )
    ref = decode_attention_reference(
        jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc), **kwargs
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_vit_attention_interpret(rng):
    from grasp_any_region_tpu.ops.attention import mha_reference
    from grasp_any_region_tpu.ops import vit_attention as va
    import functools
    from jax.experimental import pallas as pl

    t, s, h, d = 2, 130, 2, 64  # forces kv-tail masking (pad to 256)
    q = rng.standard_normal((t, s, h, d)).astype(np.float32)
    k = rng.standard_normal((t, s, h, d)).astype(np.float32)
    v = rng.standard_normal((t, s, h, d)).astype(np.float32)

    # call the kernel in interpret mode through a small local wrapper
    qj, kj, vj = map(jnp.asarray, (q, k, v))
    pad = (-s) % 128
    qp = jnp.pad(qj, ((0, 0), (0, pad), (0, 0), (0, 0)))
    kp = jnp.pad(kj, ((0, 0), (0, pad), (0, 0), (0, 0)))
    vp = jnp.pad(vj, ((0, 0), (0, pad), (0, 0), (0, 0)))
    s_pad = s + pad
    qh = qp.transpose(0, 2, 1, 3).reshape(t * h, s_pad, d)
    kh_ = kp.transpose(0, 2, 1, 3).reshape(t * h, s_pad, d)
    vh = vp.transpose(0, 2, 1, 3).reshape(t * h, s_pad, d)
    kernel = functools.partial(
        va._vit_attn_kernel, scale=d ** -0.5, kv_valid=s, s_pad=s_pad
    )
    out = pl.pallas_call(
        kernel,
        grid=(t * h,),
        in_specs=[pl.BlockSpec((None, s_pad, d), lambda i: (i, 0, 0))] * 3,
        out_specs=pl.BlockSpec((None, s_pad, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((t * h, s_pad, d), qj.dtype),
        interpret=True,
    )(qh, kh_, vh)
    out = out.reshape(t, h, s_pad, d).transpose(0, 2, 1, 3)[:, :s]
    ref = mha_reference(qj, kj, vj, causal=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_fused_decode_step_matches_reference(rng):
    """The fully-fused decode step (layer-indexed weight kernels + in-kernel
    cache append) must match the reference step in fp32 (interpret mode)."""
    import jax
    import jax.numpy as jnp

    from grasp_any_region_tpu.core.config import gar_tiny
    from grasp_any_region_tpu.models import init_gar_params
    from grasp_any_region_tpu.models.llama import (
        KVCache,
        embed_tokens,
        llama_decode_step,
        llama_decode_step_fused,
        llama_prefill,
    )
    from grasp_any_region_tpu.models.gar import seed_cache_from_prefill

    cfg = gar_tiny()
    params = init_gar_params(jax.random.PRNGKey(0), cfg)["llm"]
    b, s_prompt = 2, 8
    ids = rng.integers(0, 1000, size=(b, s_prompt)).astype(np.int32)
    pos = np.broadcast_to(np.arange(s_prompt, dtype=np.int32), (b, s_prompt)).copy()
    embeds = embed_tokens(params, jnp.asarray(ids), jnp.float32)
    _, kv = llama_prefill(params, cfg.text, embeds, jnp.asarray(pos), use_flash=False)
    cache = seed_cache_from_prefill(
        cfg, kv, jnp.full((b,), s_prompt, jnp.int32), 128, dtype=jnp.float32)

    e = embed_tokens(params, jnp.full((b, 1), 42, jnp.int32), jnp.float32)
    h_ref, c_ref = llama_decode_step(
        params, cfg.text, e, cache, s_prompt, use_kernel=False)
    h_fused, c_fused = llama_decode_step_fused(
        params, cfg.text, e, cache, s_prompt, interpret=True)
    np.testing.assert_allclose(
        np.asarray(h_fused), np.asarray(h_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(c_fused.k), np.asarray(c_ref.k), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(c_fused.v), np.asarray(c_ref.v), rtol=1e-4, atol=1e-5)
    assert int(c_fused.write_pos) == int(c_ref.write_pos)


@pytest.mark.slow  # >15 s on the 1-core CPU lane (round-4 fast-lane budget)
def test_mega_decode_step_matches_reference(rng):
    """The 3-call megakernel decode step (ops/decode_megakernel: in-kernel
    rms_norm + flat-lane rope, attention+wo+residual accumulation, fused
    MLP) must match the XLA reference step in fp32 (interpret mode),
    including ragged prompt_lens and a mid-cache write position."""
    import jax
    import jax.numpy as jnp

    from grasp_any_region_tpu.core.config import gar_tiny
    from grasp_any_region_tpu.models import init_gar_params
    from grasp_any_region_tpu.models.llama import (
        KVCache,
        embed_tokens,
        llama_decode_step,
        llama_decode_step_mega,
    )

    cfg = gar_tiny()
    params = init_gar_params(jax.random.PRNGKey(0), cfg)["llm"]
    tc = cfg.text
    b, s_max, prompt_pad = 3, 64, 32
    k = jax.random.normal(
        jax.random.PRNGKey(1), (tc.num_layers, b, tc.num_kv_heads, s_max, tc.head_dim))
    v = jax.random.normal(
        jax.random.PRNGKey(2), (tc.num_layers, b, tc.num_kv_heads, s_max, tc.head_dim))
    cache = KVCache(
        k=k, v=v, prompt_lens=jnp.array([17, 30, 9], jnp.int32),
        write_pos=jnp.asarray(35, jnp.int32))
    e = embed_tokens(params, jnp.full((b, 1), 42, jnp.int32), jnp.float32)

    h_ref, c_ref = llama_decode_step(
        params, tc, e, cache, prompt_pad, use_kernel=False)
    h_mega, c_mega = llama_decode_step_mega(
        params, tc, e, cache, prompt_pad, interpret=True)
    np.testing.assert_allclose(
        np.asarray(h_mega), np.asarray(h_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(c_mega.k), np.asarray(c_ref.k), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(c_mega.v), np.asarray(c_ref.v), rtol=1e-4, atol=1e-5)
    assert int(c_mega.write_pos) == int(c_ref.write_pos)


@pytest.mark.slow  # >15 s on the 1-core CPU lane (round-4 fast-lane budget)
def test_int8_decode_weights_close_to_bf16(rng):
    """Quantized decode step stays close to the fp32 step (interpret mode)."""
    import jax
    import jax.numpy as jnp

    from grasp_any_region_tpu.core.config import gar_tiny
    from grasp_any_region_tpu.models import init_gar_params
    from grasp_any_region_tpu.models.gar import seed_cache_from_prefill
    from grasp_any_region_tpu.models.llama import (
        embed_tokens,
        llama_decode_step,
        llama_decode_step_fused,
        llama_prefill,
    )
    from grasp_any_region_tpu.models.quantize import quantize_decode_weights, quantize_int8, dequantize

    # quantization round trip error bound
    w = rng.standard_normal((2, 64, 128)).astype(np.float32)
    q, s = quantize_int8(jnp.asarray(w))
    back = np.asarray(dequantize(q, s, jnp.float32))
    assert np.abs(back - w).max() <= np.abs(w).max() / 127.0 + 1e-6

    cfg = gar_tiny()
    params = init_gar_params(jax.random.PRNGKey(0), cfg)["llm"]
    qparams = quantize_decode_weights({"llm": params})["llm"]
    b, s_prompt = 2, 8
    ids = rng.integers(0, 1000, size=(b, s_prompt)).astype(np.int32)
    pos = np.broadcast_to(np.arange(s_prompt, dtype=np.int32), (b, s_prompt)).copy()
    embeds = embed_tokens(params, jnp.asarray(ids), jnp.float32)
    _, kv = llama_prefill(params, cfg.text, embeds, jnp.asarray(pos), use_flash=False)
    cache = seed_cache_from_prefill(
        cfg, kv, jnp.full((b,), s_prompt, jnp.int32), 128, dtype=jnp.float32)
    e = embed_tokens(params, jnp.full((b, 1), 42, jnp.int32), jnp.float32)
    h_ref, _ = llama_decode_step(params, cfg.text, e, cache, s_prompt, use_kernel=False)
    h_q8, _ = llama_decode_step_fused(qparams, cfg.text, e, cache, s_prompt, interpret=True)
    err = np.abs(np.asarray(h_q8) - np.asarray(h_ref)).max()
    ref_mag = np.abs(np.asarray(h_ref)).max()
    assert err < 0.05 * ref_mag, (err, ref_mag)

    # int8 LM head (the largest per-step weight read): logits track the
    # bf16 head within the per-row quantization error bound
    from grasp_any_region_tpu.models.llama import lm_logits

    assert "lm_head_q8" in qparams
    lg_ref = np.asarray(lm_logits(params, cfg.text, h_ref))
    lg_q8 = np.asarray(lm_logits(qparams, cfg.text, h_ref))
    assert lg_ref.shape == lg_q8.shape
    denom = np.abs(lg_ref).max()
    assert np.abs(lg_q8 - lg_ref).max() < 0.02 * denom + 1e-3


def test_vit_attention_df_grads_match_reference(rng):
    """custom_vjp wrapper: Pallas forward + Pallas FA-2 backward (both in
    interpret mode) must reproduce the XLA attention gradients (the on-chip
    train path differentiates through this — round-2 regression for the
    'Linearization failed' bug; round-3 swapped the backward from the XLA
    reference to ops/flash_backward.py)."""
    import grasp_any_region_tpu.ops.vit_attention as VA
    from grasp_any_region_tpu.ops.attention import mha_reference

    t, s, h, d = 2, 64, 2, 32
    q = jnp.asarray(rng.standard_normal((t, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((t, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((t, s, h, d)), jnp.float32)

    orig = VA.vit_attention
    VA.vit_attention = lambda q, k, v, **kw: orig(q, k, v, interpret=True, **kw)
    try:
        def loss_df(q, k, v):
            return jnp.sum(VA.vit_attention_df(q, k, v) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(mha_reference(q, k, v, causal=False) ** 2)

        g_df = jax.grad(loss_df, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, r in zip(g_df, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       rtol=1e-3, atol=1e-4)
    finally:
        VA.vit_attention = orig


def test_flash_attention_df_grads_match_reference(rng):
    """flash_attention_df custom_vjp (training path through the flash
    kernel): reference backward incl. the int segment_ids slot."""
    import grasp_any_region_tpu.ops.flash_attention as FA
    from grasp_any_region_tpu.ops.attention import mha_reference

    b, s, h, kh, d = 1, 96, 2, 1, 32
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, kh, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, kh, d)), jnp.float32)
    seg = jnp.asarray((np.arange(s)[None] < 70).astype(np.int32))

    # run the REAL Pallas forward (which saves the per-row LSE for the FA-2
    # backward) in interpret mode — a plain mha_reference stand-in can't
    # honor return_lse
    orig = FA.flash_attention
    FA.flash_attention = lambda *a, **kw: orig(*a, interpret=True, **kw)
    try:
        def loss_df(q, k, v):
            return jnp.sum(FA.flash_attention_df(q, k, v, True, seg, None) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(
                mha_reference(q, k, v, causal=True, segment_ids=seg) ** 2
            )

        gd = jax.grad(loss_df, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, r in zip(gd, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       rtol=1e-4, atol=1e-4)
    finally:
        FA.flash_attention = orig


@pytest.mark.slow  # >15 s on the 1-core CPU lane (round-4 fast-lane budget)
def test_paired_fused_decode_step_matches_reference(rng):
    """Head-PAIRED cache layout (two kv heads packed into the lane axis,
    seed_cache_from_prefill(paired=True)): multi-step decode must match
    the unpaired XLA reference token path exactly, including the in-place
    cache appends."""
    import jax
    import jax.numpy as jnp

    from grasp_any_region_tpu.core.config import gar_tiny
    from grasp_any_region_tpu.models import init_gar_params
    from grasp_any_region_tpu.models.llama import (
        embed_tokens,
        llama_decode_step,
        llama_decode_step_fused,
        llama_prefill,
    )
    from grasp_any_region_tpu.models.gar import seed_cache_from_prefill

    cfg = gar_tiny()
    t = cfg.text
    params = init_gar_params(jax.random.PRNGKey(0), cfg)["llm"]
    b, s_prompt = 2, 8
    ids = rng.integers(0, 1000, size=(b, s_prompt)).astype(np.int32)
    pos = np.broadcast_to(np.arange(s_prompt, dtype=np.int32), (b, s_prompt)).copy()
    embeds = embed_tokens(params, jnp.asarray(ids), jnp.float32)
    _, kv = llama_prefill(params, cfg.text, embeds, jnp.asarray(pos), use_flash=False)
    plens = jnp.full((b,), s_prompt, jnp.int32)
    cache_ref = seed_cache_from_prefill(cfg, kv, plens, 128, dtype=jnp.float32)
    cache_p = seed_cache_from_prefill(
        cfg, kv, plens, 128, dtype=jnp.float32, paired=True)
    kp = t.num_kv_heads // 2
    assert cache_p.k.shape == (
        t.num_layers, b, kp, 128, 2 * t.head_dim)

    for step, tok in enumerate((42, 7, 99)):
        e = embed_tokens(params, jnp.full((b, 1), tok, jnp.int32), jnp.float32)
        h_ref, cache_ref = llama_decode_step(
            params, cfg.text, e, cache_ref, s_prompt, use_kernel=False)
        # paired cache routes through the fused kernels (interpret on CPU)
        h_p, cache_p = llama_decode_step(
            params, cfg.text, e, cache_p, s_prompt)
        np.testing.assert_allclose(
            np.asarray(h_p), np.asarray(h_ref), rtol=1e-4, atol=1e-5,
            err_msg=f"hidden mismatch at step {step}")
        # unpair (L, B, K/2, S, 2D) -> (L, B, K, S, D) for comparison
        L, _, _, S, _ = cache_p.k.shape
        kup = np.asarray(cache_p.k).reshape(L, b, kp, S, 2, t.head_dim)
        kup = kup.transpose(0, 1, 2, 4, 3, 5).reshape(
            L, b, t.num_kv_heads, S, t.head_dim)
        np.testing.assert_allclose(
            kup, np.asarray(cache_ref.k), rtol=1e-4, atol=1e-5,
            err_msg=f"cache K mismatch at step {step}")
        assert int(cache_p.write_pos) == int(cache_ref.write_pos)


@pytest.mark.slow  # >15 s on the 1-core CPU lane (round-4 fast-lane budget)
def test_int8_kv_paired_decode_tracks_reference(rng):
    """int8 KV cache (seed_cache_from_prefill(quantize_kv=True)): the fused
    paired kernel dequantizes history blocks with the static per-pair scale
    and quantizes appended columns in-kernel. Multi-step decode must track
    the fp32 XLA reference within the int8 rounding budget, and the stored
    cache must dequantize back to the reference K/V."""
    import jax
    import jax.numpy as jnp

    from grasp_any_region_tpu.core.config import gar_tiny
    from grasp_any_region_tpu.models import init_gar_params
    from grasp_any_region_tpu.models.llama import embed_tokens, llama_decode_step, llama_prefill
    from grasp_any_region_tpu.models.gar import seed_cache_from_prefill

    cfg = gar_tiny()
    t = cfg.text
    params = init_gar_params(jax.random.PRNGKey(0), cfg)["llm"]
    b, s_prompt = 2, 8
    ids = rng.integers(0, 1000, size=(b, s_prompt)).astype(np.int32)
    pos = np.broadcast_to(np.arange(s_prompt, dtype=np.int32), (b, s_prompt)).copy()
    embeds = embed_tokens(params, jnp.asarray(ids), jnp.float32)
    _, kv = llama_prefill(params, cfg.text, embeds, jnp.asarray(pos), use_flash=False)
    plens = jnp.full((b,), s_prompt, jnp.int32)
    cache_ref = seed_cache_from_prefill(cfg, kv, plens, 128, dtype=jnp.float32)
    cache_q = seed_cache_from_prefill(
        cfg, kv, plens, 128, dtype=jnp.float32, paired=True, quantize_kv=True)
    kp = t.num_kv_heads // 2
    assert cache_q.k.dtype == jnp.int8
    assert cache_q.k_scale.shape == (t.num_layers, b, kp, 1, 1)

    for step, tok in enumerate((42, 7, 99)):
        e = embed_tokens(params, jnp.full((b, 1), tok, jnp.int32), jnp.float32)
        h_ref, cache_ref = llama_decode_step(
            params, cfg.text, e, cache_ref, s_prompt, use_kernel=False)
        h_q, cache_q = llama_decode_step(params, cfg.text, e, cache_q, s_prompt)
        assert cache_q.k.dtype == jnp.int8  # appends stay quantized
        assert cache_q.k_scale is not None  # scales survive the step
        ref = np.asarray(h_ref)
        np.testing.assert_allclose(
            np.asarray(h_q), ref, rtol=5e-2,
            atol=5e-2 * np.abs(ref).max(),
            err_msg=f"hidden diverged at step {step}")
        assert int(cache_q.write_pos) == int(cache_ref.write_pos)

    # stored int8 columns (incl. the 3 appended ones) dequantize to the
    # reference K within the per-pair scale's rounding radius
    L, _, _, S, _ = cache_q.k.shape
    kdq = np.asarray(cache_q.k, np.float32) * np.asarray(cache_q.k_scale)
    kdq = kdq.reshape(L, b, kp, S, 2, t.head_dim)
    kdq = kdq.transpose(0, 1, 2, 4, 3, 5).reshape(
        L, b, t.num_kv_heads, S, t.head_dim)
    wp = int(cache_ref.write_pos)
    kr = np.asarray(cache_ref.k)
    rad = np.asarray(cache_q.k_scale).max()
    # prefill columns: pure quantization error (half a quantization step)
    np.testing.assert_allclose(
        kdq[:, :, :, :s_prompt], kr[:, :, :, :s_prompt], atol=rad * 0.51 + 1e-6)
    # appended columns additionally carry the quantized path's (bounded)
    # hidden-state drift vs the fp32 reference
    np.testing.assert_allclose(
        kdq[:, :, :, s_prompt:wp], kr[:, :, :, s_prompt:wp],
        atol=rad * 0.51 + 5e-2 * np.abs(kr[:, :, :, :wp]).max())


def test_paired_gather_flush_round_trip(rng):
    """gather_pages_dense(paired=True) + flush_window_pages on paired
    window slabs must round-trip tokens into the same pool state as the
    unpaired path."""
    import jax.numpy as jnp

    from grasp_any_region_tpu.serve.paged_cache import (
        flush_window_pages,
        gather_pages_dense,
        init_paged_kv,
    )

    L, K, PS, D, B, MP, W = 2, 4, 8, 16, 3, 4, 8
    paged = init_paged_kv(L, 16, PS, K, D, slots=B, max_pages_per_slot=MP,
                          dtype=jnp.float32)
    k_pool = jnp.asarray(
        rng.standard_normal(paged.k.shape), jnp.float32)
    v_pool = jnp.asarray(rng.standard_normal(paged.v.shape), jnp.float32)
    bt = jnp.asarray([[1, 2, 0, 0], [3, 4, 5, 0], [6, 7, 0, 0]], jnp.int32)
    seq_lens = jnp.asarray([10, 17, 9], jnp.int32)
    s_base = 3 * PS

    kd_u, vd_u = gather_pages_dense(k_pool, v_pool, bt, s_base, W)
    kd_p, vd_p = gather_pages_dense(k_pool, v_pool, bt, s_base, W, paired=True)
    # paired dense unpairs to the unpaired dense
    total = kd_u.shape[3]
    kp = K // 2
    un = np.asarray(kd_p).reshape(L, B, kp, total, 2, D)
    un = un.transpose(0, 1, 2, 4, 3, 5).reshape(L, B, K, total, D)
    np.testing.assert_allclose(un, np.asarray(kd_u), rtol=0, atol=0)

    # write some window tokens into both dense caches and flush
    counts = jnp.asarray([3, 2, 0], jnp.int32)
    new = rng.standard_normal((L, B, K, W, D)).astype(np.float32)
    kd_u = kd_u.at[:, :, :, s_base:s_base + W].set(jnp.asarray(new))
    new_p = jnp.asarray(
        new.reshape(L, B, kp, 2, W, D).transpose(0, 1, 2, 4, 3, 5)
        .reshape(L, B, kp, W, 2 * D))
    kd_p = kd_p.at[:, :, :, s_base:s_base + W].set(new_p)
    out_u, _ = flush_window_pages(
        k_pool, v_pool, kd_u, kd_u, bt, seq_lens, counts, s_base, W)
    out_p, _ = flush_window_pages(
        k_pool, v_pool, kd_p, kd_p, bt, seq_lens, counts, s_base, W)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_u), rtol=0, atol=0)
