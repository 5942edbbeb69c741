"""Packed-sequence training: segment-aware flash kernel + pack_text_batch.

TPU-native replacement for the reference's varlen packed path
(custom_collect_fn.py:28-35, 96-106 — unused for GAR because it requires
text-only batch_size=1 rows; here it is first-class)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from grasp_any_region_tpu.data.builders import PackedTextBatch, pack_text_batch
from grasp_any_region_tpu.ops.attention import mha_reference
from grasp_any_region_tpu.ops.flash_attention import flash_attention


def _random_segments(rng, b, s, max_docs=3):
    """Rows of 1..max_docs contiguous docs followed by 0-padding."""
    seg = np.zeros((b, s), np.int32)
    for i in range(b):
        n_docs = int(rng.integers(1, max_docs + 1))
        cuts = np.sort(rng.choice(np.arange(1, s), size=n_docs, replace=False))
        start = 0
        for d, end in enumerate(cuts, start=1):
            seg[i, start:end] = d
            start = end
    return seg


def test_flash_segments_interpret(rng):
    b, s, h, kh, d = 2, 256, 4, 2, 64
    q = rng.standard_normal((b, s, h, d)).astype(np.float32)
    k = rng.standard_normal((b, s, kh, d)).astype(np.float32)
    v = rng.standard_normal((b, s, kh, d)).astype(np.float32)
    seg = _random_segments(rng, b, s)
    out = flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        causal=True, segment_ids=jnp.asarray(seg),
        block_q=128, block_k=128, interpret=True,
    )
    ref = mha_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        causal=True, segment_ids=jnp.asarray(seg),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_flash_segments_nonmultiple_seq(rng):
    # padded seq (300 -> 384) — pad keys get segment id 0 and are invisible
    # to real tokens
    b, s, h, d = 1, 300, 2, 64
    q = rng.standard_normal((b, s, h, d)).astype(np.float32)
    k = rng.standard_normal((b, s, h, d)).astype(np.float32)
    v = rng.standard_normal((b, s, h, d)).astype(np.float32)
    seg = _random_segments(rng, b, s)
    seg[:, 280:] = 0  # trailing padding
    out = flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        causal=True, segment_ids=jnp.asarray(seg),
        block_q=128, block_k=128, interpret=True,
    )
    ref = mha_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        causal=True, segment_ids=jnp.asarray(seg),
    )
    np.testing.assert_allclose(np.asarray(out)[:, :280], np.asarray(ref)[:, :280],
                               rtol=2e-3, atol=2e-3)


def test_pack_text_batch_structure():
    seqs = [np.arange(1, n + 1, dtype=np.int32) for n in (10, 7, 3, 5, 8)]
    labs = [s.copy() for s in seqs]
    packed = pack_text_batch(seqs, seq_len=16, labels=labs)
    assert isinstance(packed, PackedTextBatch)
    ids = np.asarray(packed.input_ids)
    seg = np.asarray(packed.segment_ids)
    pos = np.asarray(packed.positions)
    lab = np.asarray(packed.labels)
    # FFD: 10+3 -> row0(13), 8+7 -> row1(15), 5 -> row2? no: 8, then 7 fits
    # with 8 (15), 5 fits row0 (10+5=15), 3 fits row1? 15+3>16 -> row2.
    # exact layout aside, every token must appear exactly once:
    total = sum(len(s) for s in seqs)
    assert (seg > 0).sum() == total
    assert (ids[seg > 0] > 0).all()
    # positions restart at 0 for each doc
    for r in range(ids.shape[0]):
        for d in np.unique(seg[r]):
            if d == 0:
                continue
            sel = seg[r] == d
            n = sel.sum()
            np.testing.assert_array_equal(pos[r, sel], np.arange(n))
            np.testing.assert_array_equal(lab[r, sel], ids[r, sel])
    # padding labelled -100
    assert (lab[seg == 0] == -100).all()


def test_pack_truncates_long_docs():
    packed = pack_text_batch(
        [np.arange(1, 40, dtype=np.int32)], seq_len=16,
        labels=[np.arange(1, 40, dtype=np.int32)],
    )
    assert packed.input_ids.shape == (1, 16)
    assert int(np.asarray(packed.segment_ids).sum()) == 16


@pytest.mark.slow  # >15 s on the 1-core CPU lane (round-4 fast-lane budget)
def test_packed_prefill_matches_per_doc(rng):
    """Hidden states of documents packed into one row == each doc alone."""
    from grasp_any_region_tpu.core.config import TextConfig
    from grasp_any_region_tpu.models.llama import (
        embed_tokens, init_llama_params, llama_prefill,
    )

    cfg = TextConfig(
        vocab_size=97, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=8, rope_scaling_factor=None,
    )
    params = init_llama_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.float32), params)
    docs = [rng.integers(1, 97, size=n).astype(np.int32) for n in (9, 6)]
    packed = pack_text_batch(docs, seq_len=24, labels=[d.copy() for d in docs])

    embeds = embed_tokens(params, packed.input_ids, jnp.float32)
    hidden, _ = llama_prefill(
        params, cfg, embeds, packed.positions,
        segment_ids=packed.segment_ids, right_padded=False, use_flash=False,
    )
    seg = np.asarray(packed.segment_ids)[0]
    ids = np.asarray(packed.input_ids)[0]
    for d in (1, 2):
        sel = seg == d
        doc_ids = ids[sel]
        e1 = embed_tokens(params, jnp.asarray(doc_ids)[None], jnp.float32)
        h1, _ = llama_prefill(
            params, cfg, e1, jnp.arange(len(doc_ids))[None], use_flash=False,
        )
        np.testing.assert_allclose(
            np.asarray(hidden)[0, sel], np.asarray(h1)[0],
            rtol=1e-4, atol=1e-4,
        )


def test_packed_loss_runs(rng):
    from grasp_any_region_tpu.core.config import gar_tiny
    from grasp_any_region_tpu.models import init_gar_params
    from grasp_any_region_tpu.train.step import packed_loss_fn

    cfg = gar_tiny()
    params = init_gar_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    docs = [rng.integers(5, 90, size=n).astype(np.int32) for n in (12, 7, 9)]
    packed = pack_text_batch(docs, seq_len=32, labels=[d.copy() for d in docs])
    loss = packed_loss_fn(params, cfg, packed, use_flash=False)
    assert np.isfinite(float(loss))


@pytest.mark.slow  # >15 s on the 1-core CPU lane (round-4 fast-lane budget)
def test_packed_loss_sequence_parallel_matches(rng):
    """Packed rows (block-diagonal segments) through the Ulysses SP path
    (mesh seq=2, segment ids all-gathered inside the exchange) must produce
    the single-device loss."""
    from grasp_any_region_tpu.core.config import gar_tiny
    from grasp_any_region_tpu.core.mesh import MeshSpec, make_mesh
    from grasp_any_region_tpu.models import init_gar_params
    from grasp_any_region_tpu.train.step import packed_loss_fn

    cfg = gar_tiny()
    params = init_gar_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    docs = [rng.integers(5, 90, size=n).astype(np.int32) for n in (20, 13, 9, 17)]
    packed = pack_text_batch(docs, seq_len=32, labels=[d.copy() for d in docs])
    assert packed.input_ids.shape[1] % 2 == 0

    base = float(packed_loss_fn(params, cfg, packed, use_flash=False))

    mesh = make_mesh(MeshSpec(data=1, fsdp=2, tensor=2, seq=2))
    sp = float(
        jax.jit(
            lambda p, b: packed_loss_fn(p, cfg, b, use_flash=False, mesh=mesh)
        )(params, packed)
    )
    np.testing.assert_allclose(sp, base, rtol=1e-4)
