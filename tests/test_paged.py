"""Paged KV cache, paged attention, and the continuous-batching engine."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# engine round trips dominate the 1-core CPU lane (~11 min): slow tier
pytestmark = pytest.mark.slow

from grasp_any_region_tpu.ops.attention import mha_reference
from grasp_any_region_tpu.ops.paged_attention import paged_attention_reference
from grasp_any_region_tpu.serve.paged_cache import (
    PageAllocator,
    append_token_pages,
    pages_needed,
    write_prompt_pages,
)


def _paginate(rng, k, v, page_size, num_pages, max_pages):
    """Scatter contiguous (B,S,K,D) k/v into a random head-major page layout
    ((K, N, PS, D) pools)."""
    b, s, kh, d = k.shape
    mp_used = -(-s // page_size)
    assert mp_used <= max_pages
    pool_k = rng.standard_normal((kh, num_pages, page_size, d)).astype(k.dtype)
    pool_v = rng.standard_normal((kh, num_pages, page_size, d)).astype(v.dtype)
    ids = rng.permutation(np.arange(1, num_pages))[: b * mp_used]
    bt = np.zeros((b, max_pages), np.int32)
    pad = mp_used * page_size - s
    for i in range(b):
        own = ids[i * mp_used:(i + 1) * mp_used]
        bt[i, :mp_used] = own
        # (S, K, D) -> (K, MP, PS, D)
        kp = np.pad(k[i], ((0, pad), (0, 0), (0, 0))).transpose(1, 0, 2)
        vp = np.pad(v[i], ((0, pad), (0, 0), (0, 0))).transpose(1, 0, 2)
        pool_k[:, own] = kp.reshape(kh, mp_used, page_size, d)
        pool_v[:, own] = vp.reshape(kh, mp_used, page_size, d)
    return pool_k, pool_v, bt


def test_paged_attention_matches_dense(rng):
    b, s, h, kh, d, ps = 3, 100, 4, 2, 64, 32
    q = rng.standard_normal((b, h, d)).astype(np.float32)
    k = rng.standard_normal((b, s, kh, d)).astype(np.float32)
    v = rng.standard_normal((b, s, kh, d)).astype(np.float32)
    seq_lens = np.asarray([100, 37, 64], np.int32)
    pool_k, pool_v, bt = _paginate(rng, k, v, ps, num_pages=32, max_pages=4)

    out = paged_attention_reference(
        jnp.asarray(q), jnp.asarray(pool_k), jnp.asarray(pool_v),
        jnp.asarray(bt), jnp.asarray(seq_lens),
    )
    # dense reference: mask keys beyond each row's seq_len via kv segment ids
    ref = mha_reference(
        jnp.asarray(q)[:, None], jnp.asarray(k), jnp.asarray(v),
        segment_ids=jnp.ones((b, 1), jnp.int32),
        kv_segment_ids=jnp.asarray(
            (np.arange(s)[None] < seq_lens[:, None]).astype(np.int32)),
    )[:, 0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_page_allocator():
    a = PageAllocator(8)
    assert a.free_pages == 7  # page 0 reserved
    got = a.alloc(7)
    assert sorted(got) == list(range(1, 8))
    assert a.alloc(1) is None
    a.release([3, 5])
    assert a.free_pages == 2
    assert pages_needed(1, 16) == 1 and pages_needed(16, 16) == 1
    assert pages_needed(17, 16) == 2 and pages_needed(0, 16) == 1


def test_write_and_append_roundtrip(rng):
    l, s, kh, d, ps, n = 2, 10, 2, 8, 4, 8
    k_pool = jnp.zeros((l, kh, n, ps, d), jnp.float32)
    v_pool = jnp.zeros((l, kh, n, ps, d), jnp.float32)
    k_new = jnp.asarray(rng.standard_normal((l, s, kh, d)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((l, s, kh, d)), jnp.float32)
    pages = np.array([5, 2, 7, 0], np.int32)  # 3 used + trash tail
    k_pool, v_pool = write_prompt_pages(
        k_pool, v_pool, k_new, v_new, jnp.asarray(pages),
        jnp.asarray(s, jnp.int32),
    )
    # append two decode tokens at positions 10, 11 (page 2 of the table)
    bt = jnp.asarray(pages[None])  # one slot
    for t in range(2):
        kt = jnp.asarray(rng.standard_normal((l, 1, kh, d)), jnp.float32)
        vt = jnp.asarray(rng.standard_normal((l, 1, kh, d)), jnp.float32)
        k_pool, v_pool = append_token_pages(
            k_pool, v_pool, kt, vt, bt,
            jnp.asarray([s + t], jnp.int32), jnp.asarray([True]),
        )
        k_new = jnp.concatenate([k_new, kt], axis=1)
        v_new = jnp.concatenate([v_new, vt], axis=1)
    # gather back through the block table: (L,K,N,PS,D) -> (L, S, K, D)
    got_k = np.asarray(k_pool)[:, :, pages].reshape(l, kh, -1, d)
    got_v = np.asarray(v_pool)[:, :, pages].reshape(l, kh, -1, d)
    got_k = got_k.transpose(0, 2, 1, 3)[:, : s + 2]
    got_v = got_v.transpose(0, 2, 1, 3)[:, : s + 2]
    np.testing.assert_allclose(got_k, np.asarray(k_new), rtol=0, atol=0)
    np.testing.assert_allclose(got_v, np.asarray(v_new), rtol=0, atol=0)


def test_append_inactive_writes_trash_page(rng):
    l, kh, d, ps, n = 1, 2, 8, 4, 4
    k_pool = jnp.zeros((l, kh, n, ps, d), jnp.float32)
    v_pool = jnp.zeros((l, kh, n, ps, d), jnp.float32)
    kt = jnp.ones((l, 1, kh, d), jnp.float32)
    bt = jnp.asarray([[2, 3]], jnp.int32)
    k_pool, v_pool = append_token_pages(
        k_pool, v_pool, kt, kt, bt,
        jnp.asarray([5], jnp.int32), jnp.asarray([False]),
    )
    assert float(np.abs(np.asarray(k_pool)[:, :, 1:]).sum()) == 0.0
    assert float(np.abs(np.asarray(k_pool)[:, :, 0]).sum()) > 0.0


def _tiny_setup(seed):
    from grasp_any_region_tpu.core.config import gar_tiny
    from grasp_any_region_tpu.data.synthetic import synthetic_batch
    from grasp_any_region_tpu.models import init_gar_params

    cfg = gar_tiny()
    params = init_gar_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    batches = []
    for s in range(3):
        b, _, plens = synthetic_batch(cfg, batch=1, grid=(1, 1), regions=1,
                                      seed=seed + s)
        batches.append((b, plens))
    return cfg, params, batches


def test_engine_matches_generate(rng):
    from grasp_any_region_tpu.models.generate import generate
    from grasp_any_region_tpu.serve.engine import ContinuousBatchingEngine, EngineConfig

    cfg, params, batches = _tiny_setup(7)
    max_new = 6

    expected = {}
    for i, (b, plens) in enumerate(batches):
        res = generate(params, cfg, b, plens, max_new_tokens=max_new,
                       eot_id=-1, mask_compat=False, use_flash=False)
        expected[i] = list(np.asarray(res.tokens)[0])

    ecfg = EngineConfig(
        slots=3, page_size=16, num_pages=128, max_pages_per_slot=64,
        max_new_tokens=max_new, eot_id=-1, mask_compat=False,
    )
    eng = ContinuousBatchingEngine(params, cfg, ecfg, dtype=jnp.float32)
    ids = {}
    for i, (b, plens) in enumerate(batches):
        ids[eng.submit(b, int(np.asarray(plens)[0]))] = i
    out = eng.run()
    assert len(out) == 3
    for rid, toks in out.items():
        assert toks == expected[ids[rid]], (rid, toks, expected[ids[rid]])


def test_engine_chunked_decode_matches_per_token(rng):
    """decode_chunk>1 (multi-step scheduling) emits identical tokens."""
    from grasp_any_region_tpu.serve.engine import ContinuousBatchingEngine, EngineConfig

    cfg, params, batches = _tiny_setup(33)
    max_new = 7
    base = dict(slots=3, page_size=16, num_pages=128, max_pages_per_slot=64,
                max_new_tokens=max_new, eot_id=-1, mask_compat=False)
    results = []
    for chunk in (1, 3):
        eng = ContinuousBatchingEngine(
            params, cfg, EngineConfig(decode_chunk=chunk, **base),
            dtype=jnp.float32)
        ids = [eng.submit(b, int(np.asarray(p)[0])) for b, p in batches]
        out = eng.run()
        results.append([out[i] for i in ids])
    assert results[0] == results[1]


def test_engine_chunked_prefill_matches_whole(rng):
    """TTFT chunked prefill (prefill_chunk: a queued request's decoder sweep
    advances one chunk per cycle while other slots decode) must emit
    token-for-token the same sequences as whole-prompt admission."""
    from grasp_any_region_tpu.serve.engine import ContinuousBatchingEngine, EngineConfig

    cfg, params, batches = _tiny_setup(91)
    max_new = 6
    base = dict(slots=2, page_size=16, num_pages=128, max_pages_per_slot=64,
                max_new_tokens=max_new, eot_id=-1, mask_compat=False,
                decode_chunk=3)
    # reference: whole-prompt admissions
    eng0 = ContinuousBatchingEngine(params, cfg, EngineConfig(**base),
                                    dtype=jnp.float32)
    ids0 = [eng0.submit(b, int(np.asarray(p)[0])) for b, p in batches[:2]]
    out0 = eng0.run()

    # chunked: admit request 0 first so a stream is ACTIVE, then queue
    # request 1 — the busy engine must take the chunked path for it
    eng1 = ContinuousBatchingEngine(
        params, cfg, EngineConfig(prefill_chunk=8, **base),
        dtype=jnp.float32)
    rid_a = eng1.submit(*[(b, int(np.asarray(p)[0])) for b, p in batches[:1]][0])
    eng1._admit(defer_tok0=True)
    assert eng1.active.any()
    rid_b = eng1.submit(batches[1][0], int(np.asarray(batches[1][1])[0]))
    chunk_calls = []
    orig = eng1._chunk_fn
    eng1._chunk_fn = lambda *a: (chunk_calls.append(1), orig(*a))[1]
    out1 = eng1.run()
    assert len(chunk_calls) >= 2, "chunked path must actually run"
    assert out1[rid_a] == out0[ids0[0]]
    assert out1[rid_b] == out0[ids0[1]]


def test_paged_fused_step_matches_reference(rng):
    """The weight-streaming paged decode step (Pallas interpret on CPU) must
    match the plain-XLA paged step bit-for-bit in structure (fp32 tolerance).
    slots=3 != kv_heads=2 on purpose (catches (B,K,D)/(K,B,D) transposes)."""
    from grasp_any_region_tpu.core.config import gar_tiny
    from grasp_any_region_tpu.models import init_gar_params
    from grasp_any_region_tpu.models.llama import (
        llama_decode_step_paged,
        llama_decode_step_paged_fused,
    )

    cfg = gar_tiny()
    tc = cfg.text
    params = init_gar_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    slots, ps, n, mp = 3, 16, 32, 4
    l, kh, dh = tc.num_layers, tc.num_kv_heads, tc.head_dim
    k_pool = jnp.asarray(
        rng.standard_normal((l, kh, n, ps, dh)), jnp.float32)
    v_pool = jnp.asarray(
        rng.standard_normal((l, kh, n, ps, dh)), jnp.float32)
    bt = np.zeros((slots, mp), np.int32)
    used = rng.permutation(np.arange(1, n))[: slots * mp].reshape(slots, mp)
    bt[:] = used
    seq_lens = jnp.asarray([30, 17, 5], jnp.int32)
    active = jnp.asarray([True, True, False])
    embeds = jnp.asarray(
        rng.standard_normal((slots, 1, tc.hidden_size)), jnp.float32)

    h1, k1, v1 = llama_decode_step_paged(
        params["llm"], tc, embeds, k_pool, v_pool, jnp.asarray(bt),
        seq_lens, active)
    h2, k2, v2 = llama_decode_step_paged_fused(
        params["llm"], tc, embeds, k_pool, v_pool, jnp.asarray(bt),
        seq_lens, active, interpret=True)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(k1), np.asarray(k2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)


def test_engine_fused_matches_generate(rng):
    """Engine with the fused (weight-streaming) decode step — slots=3 !=
    kv_heads, batched admission covered (3 same-shape submissions)."""
    from grasp_any_region_tpu.models.generate import generate
    from grasp_any_region_tpu.serve.engine import ContinuousBatchingEngine, EngineConfig

    cfg, params, batches = _tiny_setup(51)
    max_new = 5
    expected = {}
    for i, (b, plens) in enumerate(batches):
        res = generate(params, cfg, b, plens, max_new_tokens=max_new,
                       eot_id=-1, mask_compat=False, use_flash=False)
        expected[i] = list(np.asarray(res.tokens)[0])

    ecfg = EngineConfig(
        slots=3, page_size=16, num_pages=128, max_pages_per_slot=64,
        max_new_tokens=max_new, eot_id=-1, mask_compat=False, use_fused=True,
    )
    eng = ContinuousBatchingEngine(params, cfg, ecfg, dtype=jnp.float32)
    ids = {}
    for i, (b, plens) in enumerate(batches):
        ids[eng.submit(b, int(np.asarray(plens)[0]))] = i
    out = eng.run()
    assert len(out) == 3
    for rid, toks in out.items():
        assert toks == expected[ids[rid]], (rid, toks, expected[ids[rid]])


def test_engine_staggered_admission(rng):
    """Requests submitted mid-flight produce the same tokens as fresh runs."""
    from grasp_any_region_tpu.serve.engine import ContinuousBatchingEngine, EngineConfig

    cfg, params, batches = _tiny_setup(21)
    max_new = 5
    ecfg = EngineConfig(
        slots=3, page_size=16, num_pages=128, max_pages_per_slot=64,
        max_new_tokens=max_new, eot_id=-1, mask_compat=False,
    )

    # sequential baseline: one request at a time
    seq_tokens = []
    for b, plens in batches:
        eng = ContinuousBatchingEngine(params, cfg, ecfg, dtype=jnp.float32)
        rid = eng.submit(b, int(np.asarray(plens)[0]))
        seq_tokens.append(eng.run()[rid])

    # staggered: 2 up front (fills both slots), third queued after 2 steps
    eng = ContinuousBatchingEngine(params, cfg, ecfg, dtype=jnp.float32)
    r0 = eng.submit(batches[0][0], int(np.asarray(batches[0][1])[0]))
    r1 = eng.submit(batches[1][0], int(np.asarray(batches[1][1])[0]))
    eng.step(); eng.step()
    r2 = eng.submit(batches[2][0], int(np.asarray(batches[2][1])[0]))
    out = eng.run()
    assert out[r0] == seq_tokens[0]
    assert out[r1] == seq_tokens[1]
    assert out[r2] == seq_tokens[2]


def test_engine_eot_early_exit(rng):
    """A stream that emits <eot> mid-window must stop exactly there (device-
    side done-freeze), release its slot, and admit the queue's next request;
    other streams continue to their full budget."""
    from grasp_any_region_tpu.models.generate import generate
    from grasp_any_region_tpu.serve.engine import ContinuousBatchingEngine, EngineConfig

    cfg, params, batches = _tiny_setup(63)
    max_new = 6
    # pick an eot id that stream 0 actually emits mid-generation (from the
    # unconstrained greedy trajectory), making it a real early stop
    free = generate(params, cfg, batches[0][0], batches[0][1],
                    max_new_tokens=max_new, eot_id=-1, mask_compat=False,
                    use_flash=False)
    toks0 = [int(t) for t in np.asarray(free.tokens)[0]]
    eot = toks0[2]  # fires at step 2 (0-indexed) for stream 0
    expected = {}
    for i, (b, plens) in enumerate(batches):
        res = generate(params, cfg, b, plens, max_new_tokens=max_new,
                       eot_id=eot, mask_compat=False, use_flash=False)
        n = int(np.asarray(res.num_generated)[0])
        expected[i] = list(np.asarray(res.tokens)[0, :n])
    assert len(expected[0]) < max_new, "chosen eot must actually fire early"

    ecfg = EngineConfig(
        slots=2, page_size=16, num_pages=128, max_pages_per_slot=64,
        max_new_tokens=max_new, eot_id=eot, mask_compat=False,
        decode_chunk=max_new,
    )
    eng = ContinuousBatchingEngine(params, cfg, ecfg, dtype=jnp.float32)
    ids = {}
    for i, (b, plens) in enumerate(batches):  # 3 requests, 2 slots
        ids[eng.submit(b, int(np.asarray(plens)[0]))] = i
    out = eng.run()
    assert len(out) == 3
    for rid, toks in out.items():
        assert toks == expected[ids[rid]], (ids[rid], toks, expected[ids[rid]])


@pytest.mark.parametrize("chunk", [1, 4])
def test_engine_events_stream_full_sequence(rng, chunk):
    """StepEvents must reconstruct every request's FULL token list —
    including tok0 (sampled at admission) and requests that finish AT
    admission (max_new_tokens cut or eot as the first token). Streaming
    consumers (cli/gar_serve.py) build captions solely from events."""
    from grasp_any_region_tpu.serve.engine import (
        ContinuousBatchingEngine, EngineConfig)

    cfg, params, batches = _tiny_setup(91)
    for max_new in (1, 5):  # 1 = every request finishes at admission
        ecfg = EngineConfig(
            slots=2, page_size=16, num_pages=128, max_pages_per_slot=64,
            max_new_tokens=max_new, eot_id=-1, mask_compat=False,
            decode_chunk=chunk,
        )
        eng = ContinuousBatchingEngine(params, cfg, ecfg, dtype=jnp.float32)
        for b, plens in batches:
            eng.submit(b, int(np.asarray(plens)[0]))
        streamed: dict = {}
        dones: dict = {}
        def on_event(ev):
            streamed.setdefault(ev.request_id, []).append(ev.token)
            dones[ev.request_id] = ev.done
        out = eng.run(on_event)
        assert streamed == out, (max_new, streamed, out)
        assert all(dones.values())
