"""Continuous-batching serving engine over the paged KV cache.

The reference serves one request at a time: each demo/eval call runs a full
HF `generate` with a private cache (hf_models/modeling_gar.py:418-427,
batch_size 1 enforced in training too, grasp_any_region.py:270). This engine
instead keeps a fixed ring of decode slots over one paged KV pool
(serve/paged_cache.py) and interleaves work:

  * requests queue up; whenever a slot and enough pages are free, the
    request is admitted: its multimodal prompt runs through the jitted GAR
    prefill, the prompt K/V is scattered into freshly allocated pages, and
    its first token is sampled.
  * every `step()` decodes ONE token for ALL active slots in a single jitted
    call (the pools are donated, so XLA appends K/V in place). Slots finish
    independently (eot / max_new_tokens) and release their pages, making
    room for queued admissions — no other request is disturbed.

This is the "paged KV generate loop" SURVEY.md §2.2 assigns to the TPU
build (the reference only encounters paging inside its vLLM judge server,
serve_judge.sh). Greedy decoding matches all reference evals
(GAR-Bench/inference.py:158-167).
"""

from __future__ import annotations

import os
from collections import deque
from dataclasses import dataclass, field
from functools import partial
from typing import Deque, Dict, List, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core.config import EOT_TOKEN_ID, GARConfig
from ..models.gar import GARBatch, gar_prefill
from ..models.llama import (
    embed_tokens,
    llama_decode_step_paged,
    llama_decode_step_paged_fused,
    lm_logits,
)
from .paged_cache import PageAllocator, init_paged_kv, pages_needed, write_prompt_pages


@dataclass
class EngineConfig:
    slots: int = 8                # concurrent decode streams
    page_size: int = 64
    num_pages: int = 512          # pool size (page 0 reserved)
    max_pages_per_slot: int = 96  # block-table width
    max_new_tokens: int = 1024
    eot_id: int = EOT_TOKEN_ID
    pad_id: int = 0
    # layer-indexed weight-streaming decode step (+ int8 when quantized
    # weights are present). Measured on-chip (B=8 slots, 80-page tables):
    # 7.39 ms/step fused vs 7.67 XLA — the static-unroll XLA path already
    # streams weights well, and the fused variant costs a ~13 min first
    # compile (64 unrolled Pallas calls), so it stays opt-in. None = off.
    use_fused: Optional[bool] = None
    # int8 dense-window KV (TPU paired layout only): each window's gathered
    # dense cache quantizes with static per-(layer, slot, head-pair) scales
    # (window amax, 1.5x headroom — recomputed EVERY window so scales never
    # go stale), the fused kernel dequantizes per block and quantizes
    # appended columns in-kernel, and the flush dequantizes the window's
    # new columns back to the bf16 pools. Halves the dominant per-step HBM
    # stream in window decode; page pools stay bf16 (pool traffic is one
    # gather+flush per window, not per step).
    quantize_kv: bool = False
    mask_compat: bool = True
    double_scale_compat: bool = True
    # windowed-decode size: decode up to this many tokens for all slots in
    # ONE device call + ONE host fetch (see _run_pipelined). eot and the
    # per-slot budget are checked on device — finished slots freeze inside
    # the window and nothing speculative is ever cached (the while_loop
    # exits early once every active slot is done). 1 = fully synchronous
    # per-token scheduling.
    decode_chunk: int = 1
    # TTFT fairness: when set and other slots are DECODING, a newly queued
    # request's prompt prefills this many tokens per engine cycle
    # (llama_prefill_chunk q-suffix attention) instead of stalling every
    # active stream for the whole prefill. The vision/replay pass still
    # runs whole (one call) — only the decoder sweep is chunked. Admissions
    # into an idle engine keep the batched whole-prompt path.
    prefill_chunk: Optional[int] = None


class StepEvent(NamedTuple):
    request_id: int
    token: int
    done: bool


@dataclass
class _SlotState:
    request_id: int
    pages: List[int]
    tokens: List[int] = field(default_factory=list)


@dataclass
class _PrefillJob:
    """A chunked prefill in flight (prefill_chunk scheduling)."""

    request_id: int
    slot: int
    plen: int
    pages: List[int]
    embeds: object       # (1, S, D) full prompt embeds (device)
    input_ids: object    # (1, S) for position bookkeeping
    pos: int = 0         # next chunk start
    kv: object = None    # (k, v) (L, 1, P, Kh, Dh) accumulated
    last_hidden: object = None  # (1, C, D) of the final chunk


class ContinuousBatchingEngine:
    def __init__(self, params: dict, cfg: GARConfig, ecfg: EngineConfig,
                 dtype=jnp.bfloat16):
        self.params = params
        self.cfg = cfg
        self.ecfg = ecfg
        tc = cfg.text
        paged = init_paged_kv(
            tc.num_layers, ecfg.num_pages, ecfg.page_size,
            tc.num_kv_heads, tc.head_dim,
            slots=ecfg.slots, max_pages_per_slot=ecfg.max_pages_per_slot,
            dtype=dtype,
        )
        self.k_pool, self.v_pool = paged.k, paged.v
        self.allocator = PageAllocator(ecfg.num_pages)
        self.block_table = np.zeros((ecfg.slots, ecfg.max_pages_per_slot), np.int32)
        self.seq_lens = np.zeros(ecfg.slots, np.int32)
        self.active = np.zeros(ecfg.slots, bool)
        self.cur = np.zeros(ecfg.slots, np.int32)
        self.slots: List[Optional[_SlotState]] = [None] * ecfg.slots
        self.queue: Deque[Tuple[int, GARBatch, int]] = deque()
        self.finished: Dict[int, List[int]] = {}
        # StepEvents produced during _admit (tok0 per request, incl. requests
        # that finish at admission) — drained by step()/_run_pipelined so
        # streaming consumers see the FULL sequence
        self._pending_events: List[StepEvent] = []
        # pipelined admission: ([slots], device tok0s) pending seeding into
        # cur, and the slots whose tok0 the next window fetch must resolve
        self._deferred: List[Tuple[List[int], jnp.ndarray]] = []
        self._fresh: set = set()
        # slot -> (ks (L,S,K,D), vs, plen, page_vec): prompt K/V admitted
        # this cycle whose page seeding is deferred past the next window
        # (burst fast path — see _decode_window_fresh)
        self._fresh_kv: Dict[int, Tuple] = {}
        self._next_id = 0
        # host-side wall-clock per phase (GAR_ENGINE_TIMING=1 prints on
        # run() exit). Dispatches are lazy on the axon relay, so only the
        # window entry (which contains the cycle's single fetch) reflects
        # device time; the others measure host/dispatch overhead.
        self.timing: Dict[str, float] = {}
        # per-request latency bookkeeping (BASELINE.json names p50 TTFT as a
        # north-star metric): submit -> first HOST-VISIBLE token -> done.
        # Tokens become host-visible at fetch boundaries, so with
        # decode_chunk=N a fresh request's TTFT includes its first decode
        # window — exactly the throughput-vs-TTFT trade decode_chunk buys
        # (docs/PERF_NOTES.md round-5 serving-latency table).
        self.req_stats: Dict[int, dict] = {}

        @partial(jax.jit, static_argnames=("self_cfg",))
        def _prefill(params, self_cfg, batch, prompt_len):
            hidden, kv = gar_prefill(
                params, self_cfg, batch,
                mask_compat=ecfg.mask_compat,
                double_scale_compat=ecfg.double_scale_compat,
            )
            last = hidden[jnp.arange(hidden.shape[0]), prompt_len - 1]
            logits = lm_logits(
                params["llm"], self_cfg.text, last,
                valid_vocab=self_cfg.extended_vocab_size,
            )
            tok0 = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return tok0, kv

        self._prefill_fn = _prefill
        self._seed_fn = jax.jit(write_prompt_pages, donate_argnums=(0, 1))

        @partial(jax.jit, static_argnames=("self_cfg",))
        def _embeds(params, self_cfg, batch):
            from ..models.gar import build_prefill_embeds

            return build_prefill_embeds(
                params, self_cfg, batch,
                mask_compat=ecfg.mask_compat,
                double_scale_compat=ecfg.double_scale_compat,
            )

        @jax.jit
        def _chunk(params, embeds_c, positions, kv):
            from ..models.llama import llama_prefill_chunk

            return llama_prefill_chunk(
                params["llm"], cfg.text, embeds_c, positions, kv
            )

        @jax.jit
        def _tok0(params, hidden_c, idx):
            last = hidden_c[0, idx]
            logits = lm_logits(
                params["llm"], cfg.text, last,
                valid_vocab=cfg.extended_vocab_size,
            )
            return jnp.argmax(logits, axis=-1).astype(jnp.int32).reshape(1)

        self._embeds_fn = _embeds
        self._chunk_fn = _chunk
        self._tok0_fn = _tok0
        self._prefill_jobs: List[_PrefillJob] = []
        self._reserved: set = set()

        use_fused = bool(ecfg.use_fused)
        # windowed decode builds its dense cache head-PAIRED when the
        # fused decode kernels (which read that layout at full 128-lane
        # tile width) will consume it — models/llama.paired_cache_wanted
        from ..models.llama import paired_cache_wanted

        e_paired = paired_cache_wanted(tc)
        e_q8 = bool(ecfg.quantize_kv) and e_paired

        def _quantize_dense(kd, vd):
            """Static per-(layer, slot, head-pair) int8 quantization of a
            dense window cache (see EngineConfig.quantize_kv)."""

            def q(x):
                amax = jnp.max(
                    jnp.abs(x.astype(jnp.float32)), axis=(3, 4), keepdims=True
                )
                scale = jnp.maximum(amax * 1.5 / 127.0, 1e-8)
                qx = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
                return qx.astype(jnp.int8), scale

            kq, ksc = q(kd)
            vq, vsc = q(vd)
            return kq, vq, ksc, vsc

        def _paged_step(params_llm, embeds, kq, vq, block_table, sl, active):
            if use_fused:
                return llama_decode_step_paged_fused(
                    params_llm, cfg.text, embeds, kq, vq,
                    block_table, sl, active,
                )
            return llama_decode_step_paged(
                params_llm, cfg.text, embeds, kq, vq,
                block_table, sl, active,
            )

        @partial(jax.jit, donate_argnums=(1, 2), static_argnames=())
        def _decode(params, k_pool, v_pool, cur, block_table, seq_lens, active):
            embeds = embed_tokens(params["llm"], cur[:, None], dtype)
            hidden, k_pool, v_pool = _paged_step(
                params["llm"], embeds, k_pool, v_pool,
                block_table, seq_lens, active,
            )
            logits = lm_logits(
                params["llm"], cfg.text, hidden[:, 0],
                valid_vocab=cfg.extended_vocab_size,
            )
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return nxt, seq_lens + active.astype(jnp.int32), k_pool, v_pool

        self._decode_fn = _decode

        def _window_loop(params, cache0, cur, active, rem, s_base, steps):
            """Shared windowed-decode while_loop (see _decode_window)."""
            from ..models.llama import llama_decode_step

            eot = e_eot

            def cond(st):
                i, cur, counts, done, cache, out = st
                return (i < steps) & ~jnp.all(done | ~active)

            # freshly admitted slots arrive with an UNFETCHED tok0 in `cur`
            # (admission defers the host sync into this window's single
            # fetch): tok0 == eot or an exhausted budget freezes the slot
            # before it decodes anything
            done_init = active & ((cur == eot) | (rem <= 0))

            def body(st):
                i, cur, counts, done, cache, out = st
                act_eff = active & ~done
                embeds = embed_tokens(params["llm"], cur[:, None], dtype)
                hidden, cache = llama_decode_step(
                    params["llm"], cfg.text, embeds, cache, s_base,
                )
                logits = lm_logits(
                    params["llm"], cfg.text, hidden[:, 0],
                    valid_vocab=cfg.extended_vocab_size,
                )
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                out = out.at[i].set(jnp.where(act_eff, nxt, e_pad))
                counts = counts + act_eff.astype(jnp.int32)
                done = done | (act_eff & ((nxt == eot) | (counts >= rem)))
                cur = jnp.where(act_eff, nxt, cur)
                return (i + 1, cur, counts, done, cache, out)

            slots = cur.shape[0]
            out0 = jnp.full((steps, slots), e_pad, jnp.int32)
            counts0 = jnp.zeros((slots,), jnp.int32)
            i0 = jnp.asarray(0, jnp.int32)
            cur0 = cur
            (_, cur, counts, done, cache, out) = jax.lax.while_loop(
                cond, body, (i0, cur, counts0, done_init, cache0, out0),
            )
            # ONE fetchable array: row 0 = the input cur (deferred tok0s for
            # fresh slots), row 1 = per-slot new-token counts, rows 2.. =
            # the window's tokens
            packed = jnp.concatenate([cur0[None], counts[None], out], axis=0)
            return packed, cache, counts

        @partial(jax.jit, donate_argnums=(1, 2),
                 static_argnames=("s_base", "steps"))
        def _decode_window(params, k_pool, v_pool, cur, block_table, seq_lens,
                           active, rem, s_base, steps):
            """Decode up to `steps` tokens for all slots in ONE device call.

            The slots' pages gather into a dense two-interval KVCache
            (paged_cache.gather_pages_dense) so the loop body is the static
            generate path's llama_decode_step — in-place cache writes at
            ~6.4 ms/step B=8 instead of the paged scatter/gather loop's
            14-26 ms/step — then the window's new K/V flushes back to the
            pages. eot and the per-slot token budget (`rem`) are checked ON
            DEVICE: finished slots freeze and the while_loop exits early
            once every active slot is done. ONE host fetch covers the whole
            window (the relay charges per fetch: docs/PERF_NOTES.md)."""
            from ..models.llama import KVCache
            from .paged_cache import flush_window_pages, gather_pages_dense

            kd, vd = gather_pages_dense(
                k_pool, v_pool, block_table, s_base, steps, paired=e_paired
            )
            ksc = vsc = None
            if e_q8:
                kd, vd, ksc, vsc = _quantize_dense(kd, vd)
            cache0 = KVCache(
                k=kd, v=vd, prompt_lens=seq_lens,
                write_pos=jnp.asarray(s_base, jnp.int32),
                k_scale=ksc, v_scale=vsc,
            )
            packed, cache, counts = _window_loop(
                params, cache0, cur, active, rem, s_base, steps
            )
            # flush only the window's new columns (s_base=0 against the
            # sliced dense — same convention as the fresh path), dequantized
            # back to the bf16 pools when the window ran int8
            kwin = cache.k[:, :, :, s_base : s_base + steps]
            vwin = cache.v[:, :, :, s_base : s_base + steps]
            if e_q8:
                kwin = (kwin.astype(jnp.float32) * ksc).astype(dtype)
                vwin = (vwin.astype(jnp.float32) * vsc).astype(dtype)
            k_pool, v_pool = flush_window_pages(
                k_pool, v_pool, kwin, vwin, block_table,
                seq_lens, counts, 0, steps,
            )
            return packed, k_pool, v_pool

        @partial(jax.jit, static_argnames=("s_base", "steps"))
        def _decode_window_fresh(params, ks, vs, slot_idx, cur, seq_lens,
                                 active, rem, s_base, steps):
            """Burst-admission fast path: every live slot was admitted THIS
            cycle, so its prompt K/V (ks/vs, (L, G, S, K, D) straight from
            the batched prefill) feeds the dense window cache directly —
            skipping the page-seed scatter AND the dense gather round-trip.
            The page pools are not touched at all: the window's new K/V
            returns as dense (L, slots, K, steps, D) slabs and the HOST
            flushes/seeds pages afterward, only for slots that survive the
            window — a request that completes within it never touches its
            pages."""
            from ..models.llama import KVCache

            l, g, s, kh, d = ks.shape
            slots = cur.shape[0]
            total = ((s_base + steps + 511) // 512) * 512
            cols = min(s, s_base)
            if e_paired:
                # head-paired dense layout for the fused decode kernel
                # (pairing across the last axis is a pure reshape: the
                # prefill layout keeps kv heads adjacent)
                kh, d = kh // 2, 2 * d
                ks = ks.reshape(l, g, s, kh, d)
                vs = vs.reshape(l, g, s, kh, d)
            kd = jnp.zeros((l, slots, kh, total, d), dtype)
            vd = jnp.zeros((l, slots, kh, total, d), dtype)
            kt = ks.transpose(0, 1, 3, 2, 4)[:, :, :, :cols]  # (L,G,K,c,D)
            vt = vs.transpose(0, 1, 3, 2, 4)[:, :, :, :cols]
            kd = kd.at[:, slot_idx, :, :cols].set(kt.astype(kd.dtype))
            vd = vd.at[:, slot_idx, :, :cols].set(vt.astype(vd.dtype))
            ksc = vsc = None
            if e_q8:
                kd, vd, ksc, vsc = _quantize_dense(kd, vd)
            cache0 = KVCache(
                k=kd, v=vd, prompt_lens=seq_lens,
                write_pos=jnp.asarray(s_base, jnp.int32),
                k_scale=ksc, v_scale=vsc,
            )
            packed, cache, counts = _window_loop(
                params, cache0, cur, active, rem, s_base, steps
            )
            kwin = cache.k[:, :, :, s_base : s_base + steps]
            vwin = cache.v[:, :, :, s_base : s_base + steps]
            if e_q8:
                # the host-side flush/seed writes bf16 pools
                kwin = (kwin.astype(jnp.float32) * ksc).astype(dtype)
                vwin = (vwin.astype(jnp.float32) * vsc).astype(dtype)
            return packed, kwin, vwin

        from .paged_cache import flush_window_pages as _fwp

        self._flush_fn = jax.jit(
            _fwp, donate_argnums=(0, 1), static_argnames=("s_base", "window")
        )

        e_eot = ecfg.eot_id
        e_pad = ecfg.pad_id
        self._decode_window_fn = _decode_window
        self._decode_window_fresh_fn = _decode_window_fresh
        self.paired = e_paired

    # -- client API ---------------------------------------------------------

    def submit(self, batch: GARBatch, prompt_len: int) -> int:
        """Queue one request (batch must have batch dim 1). Returns its id."""
        assert batch.input_ids.shape[0] == 1, "submit one request at a time"
        import time as _time

        rid = self._next_id
        self._next_id += 1
        self.queue.append((rid, batch, int(prompt_len)))
        self.req_stats[rid] = {
            "submit": _time.perf_counter(), "first": None, "done": None,
            "prompt_len": int(prompt_len), "n_tokens": 0,
        }
        return rid

    def _mark_tokens(self, rid: int, n_new: int) -> None:
        """Record host-visible token arrivals for latency accounting (call
        only at host sync points — fetches — never on lazy dispatches)."""
        st = self.req_stats.get(rid)
        if st is None or n_new <= 0:
            return
        import time as _time

        now = _time.perf_counter()
        if st["first"] is None:
            st["first"] = now
        st["n_tokens"] += n_new

    def latency_stats(self) -> dict:
        """Aggregate per-request latency over every completed request since
        construction: p50/p95 TTFT (submit -> first host-visible token),
        p50/p95 total latency (submit -> done), and decode tok/s."""
        done = [s for s in self.req_stats.values()
                if s["done"] is not None and s["first"] is not None]
        if not done:
            return {"n": 0}
        ttft = np.sort([s["first"] - s["submit"] for s in done])
        total = np.sort([s["done"] - s["submit"] for s in done])

        def pct(a, p):
            return float(a[min(len(a) - 1, int(round(p / 100 * (len(a) - 1))))])

        toks = sum(s["n_tokens"] for s in done)
        span = max(s["done"] for s in done) - min(s["submit"] for s in done)
        return {
            "n": len(done),
            "ttft_p50_s": pct(ttft, 50), "ttft_p95_s": pct(ttft, 95),
            "latency_p50_s": pct(total, 50), "latency_p95_s": pct(total, 95),
            "tok_per_s": toks / span if span > 0 else float("nan"),
        }

    def has_work(self) -> bool:
        return (
            bool(self.queue)
            or bool(self.active.any())
            or bool(self._prefill_jobs)
        )

    def run(self, on_event=None) -> Dict[int, List[int]]:
        """Drain the queue to completion; returns request_id -> token ids.

        on_event: optional callback receiving a StepEvent per generated
        token (streaming); with decode_chunk > 1 events arrive in bursts at
        the pipelined loop's lagged sync points."""
        if self.ecfg.decode_chunk > 1:
            self._run_pipelined(on_event)
        else:
            while self.has_work():
                for ev in self.step():
                    if on_event is not None:
                        on_event(ev)
        out, self.finished = self.finished, {}
        if os.environ.get("GAR_ENGINE_TIMING") and self.timing:
            total = sum(self.timing.values())
            parts = " ".join(
                f"{k}={v*1000:.0f}ms" for k, v in sorted(self.timing.items())
            )
            print(f"[engine timing] total={total*1000:.0f}ms {parts}")
            self.timing = {}
        return out

    # -- scheduling ---------------------------------------------------------

    def _budget_pages(self, prompt_len: int) -> int:
        # +1 safety only: the decode window checks eot and the per-slot
        # budget on device, so no speculative tokens are ever cached
        n = pages_needed(
            prompt_len + self.ecfg.max_new_tokens + 1,
            self.ecfg.page_size,
        )
        assert n <= self.ecfg.max_pages_per_slot, (
            f"request needs {n} pages > block-table width "
            f"{self.ecfg.max_pages_per_slot}"
        )
        return n

    def _admit(self, defer_tok0: bool = False) -> None:
        """Admit as many queued requests as slots/pages allow.

        Same-shape requests at the queue head prefill TOGETHER in one
        batched gar_prefill call — admission gets the same batching
        economics as the static path instead of stalling all active slots
        once per request (round-1 weakness: serial per-request prefill).

        defer_tok0 (pipelined mode): do NOT sync tok0 to the host here —
        the relay replays the un-materialized graph per fetch, so a
        per-admission fetch costs nearly a full prefill replay. The device
        tok0s queue in self._deferred; the decode window seeds them into
        `cur` and returns them inside its single packed fetch."""
        if (
            defer_tok0
            and self.ecfg.prefill_chunk
            and self.active.any()
            and self.queue
        ):
            # streams are decoding: start chunked prefills instead of
            # stalling every slot for a whole prompt (TTFT fairness)
            self._start_chunked_prefills()
            return
        while self.queue:
            free_slots = [
                i for i in range(self.ecfg.slots)
                if not self.active[i] and i not in self._reserved
            ]
            group: List[Tuple[int, GARBatch, int, List[int]]] = []
            budget = self.allocator.free_pages
            shape0 = None
            for rid, batch, plen in self.queue:
                if len(group) >= len(free_slots):
                    break
                need = self._budget_pages(plen)
                if budget < need:
                    break
                # bucket on EVERY leaf's shape — region count R, tile H/W etc.
                # all vary per request and concatenate only when equal
                sh = tuple(
                    x.shape for x in jax.tree_util.tree_leaves(batch)
                )
                if shape0 is None:
                    shape0 = sh
                elif sh != shape0:
                    break  # shape bucket boundary; next _admit picks it up
                group.append((rid, batch, plen, self.allocator.alloc(need)))
                budget -= need
            if not group:
                return
            for _ in group:
                self.queue.popleft()
            mp = self.ecfg.max_pages_per_slot

            if len(group) == 1:
                bb = group[0][1]
            else:
                bb = jax.tree_util.tree_map(
                    lambda *xs: jnp.concatenate(xs, axis=0)
                    if xs[0] is not None else None,
                    *[g[1] for g in group],
                    is_leaf=lambda x: x is None,
                )
            plens = jnp.asarray([g[2] for g in group], jnp.int32)
            try:
                tok0s, kv = self._prefill_fn(self.params, self.cfg, bb, plens)
            except Exception:
                # release the group's pages — a long-lived server must not
                # leak pool capacity on a failed prefill
                for _, _, _, pages in group:
                    self.allocator.release(pages)
                raise
            ks, vs = kv  # (L, G, S, K, D)
            if defer_tok0:
                self._deferred.append(
                    ([free_slots[i] for i in range(len(group))], tok0s)
                )
            else:
                tok0s = np.asarray(tok0s)
            for i, (rid, _, plen, pages) in enumerate(group):
                slot = free_slots[i]
                page_vec = np.zeros(mp, np.int32)
                page_vec[: len(pages)] = pages
                if defer_tok0:
                    # defer the page-seed scatter too: the window may read
                    # this K/V straight from the prefill output (fresh fast
                    # path) and, if the request finishes inside the window,
                    # the pages are never needed at all
                    self._fresh_kv[slot] = (ks[:, i], vs[:, i], plen, page_vec)
                else:
                    self.k_pool, self.v_pool = self._seed_fn(
                        self.k_pool, self.v_pool, ks[:, i], vs[:, i],
                        jnp.asarray(page_vec), jnp.asarray(plen, jnp.int32),
                    )
                self.block_table[slot] = page_vec
                self.seq_lens[slot] = plen
                self.active[slot] = True
                if defer_tok0:
                    # tok0 is still on device; the window boundary fills it in
                    self.slots[slot] = _SlotState(
                        request_id=rid, pages=pages, tokens=[]
                    )
                    self._fresh.add(slot)
                    continue
                tok0 = int(tok0s[i])
                self._mark_tokens(rid, 1)  # tok0 was host-fetched above
                self.cur[slot] = tok0
                self.slots[slot] = _SlotState(
                    request_id=rid, pages=pages, tokens=[tok0]
                )
                done0 = tok0 == self.ecfg.eot_id or self.ecfg.max_new_tokens == 1
                self._pending_events.append(StepEvent(rid, tok0, done0))
                if done0:
                    self._retire(slot)

    def _start_chunked_prefills(self) -> None:
        """Pop queued requests into _PrefillJob records: the expensive
        vision/replay pass runs now (one call), the decoder sweep advances
        prefill_chunk tokens per engine cycle (_advance_prefills)."""
        while self.queue:
            free = [
                i for i in range(self.ecfg.slots)
                if not self.active[i] and i not in self._reserved
            ]
            if not free:
                return
            rid, batch, plen = self.queue[0]
            need = self._budget_pages(plen)
            if self.allocator.free_pages < need:
                return
            self.queue.popleft()
            pages = self.allocator.alloc(need)
            embeds = self._embeds_fn(self.params, self.cfg, batch)
            slot = free[0]
            self._reserved.add(slot)
            self._prefill_jobs.append(_PrefillJob(
                request_id=rid, slot=slot, plen=plen, pages=pages,
                embeds=embeds, input_ids=batch.input_ids,
            ))

    def _advance_prefills(self) -> None:
        """Advance every in-flight chunked prefill by ONE chunk (lazy device
        dispatches; the next window fetch forces them alongside decode)."""
        c = self.ecfg.prefill_chunk
        finished = []
        for job in self._prefill_jobs:
            s = job.embeds.shape[1]
            c0 = job.pos
            c1 = min(c0 + c, s)
            pos = jnp.broadcast_to(
                jnp.arange(c0, c1, dtype=jnp.int32), (1, c1 - c0)
            )
            hidden, kv = self._chunk_fn(
                self.params, job.embeds[:, c0:c1], pos, job.kv
            )
            job.kv = kv
            job.pos = c1
            if c0 <= job.plen - 1 < c1:
                job.last_hidden = (hidden, c0)
            # remaining chunks past the prompt are pure right-padding: the
            # causal mask keeps their garbage keys invisible, and the seed
            # below only writes plen tokens — skip them entirely
            if c1 >= s or c1 >= job.plen:
                finished.append(job)
        for job in finished:
            self._prefill_jobs.remove(job)
            self._finish_prefill(job)

    def _finish_prefill(self, job: _PrefillJob) -> None:
        mp = self.ecfg.max_pages_per_slot
        page_vec = np.zeros(mp, np.int32)
        page_vec[: len(job.pages)] = job.pages
        ks, vs = job.kv  # (L, 1, P, Kh, Dh)
        self.k_pool, self.v_pool = self._seed_fn(
            self.k_pool, self.v_pool, ks[:, 0], vs[:, 0],
            jnp.asarray(page_vec), jnp.asarray(job.plen, jnp.int32),
        )
        hidden, h0 = job.last_hidden
        tok0 = self._tok0_fn(
            self.params, hidden, jnp.asarray(job.plen - 1 - h0, jnp.int32)
        )
        slot = job.slot
        self.block_table[slot] = page_vec
        self.seq_lens[slot] = job.plen
        self.active[slot] = True
        self.slots[slot] = _SlotState(
            request_id=job.request_id, pages=job.pages, tokens=[]
        )
        self._reserved.discard(slot)
        self._deferred.append(([slot], tok0))
        self._fresh.add(slot)

    def _retire(self, slot: int) -> None:
        import time as _time

        st = self.slots[slot]
        rs = self.req_stats.get(st.request_id)
        if rs is not None:
            rs["done"] = _time.perf_counter()
        self.finished[st.request_id] = st.tokens
        self.allocator.release(st.pages)
        self.block_table[slot] = 0
        self.seq_lens[slot] = 0
        self.active[slot] = False
        self.slots[slot] = None

    # -- one engine tick ----------------------------------------------------

    def step(self) -> List[StepEvent]:
        self._admit()
        events, self._pending_events = self._pending_events, []
        if not self.active.any():
            return events
        nxt, _, self.k_pool, self.v_pool = self._decode_fn(
            self.params, self.k_pool, self.v_pool,
            jnp.asarray(self.cur), jnp.asarray(self.block_table),
            jnp.asarray(self.seq_lens), jnp.asarray(self.active),
        )
        nxt = np.asarray(nxt)
        for slot in range(self.ecfg.slots):
            if not self.active[slot]:
                continue
            st = self.slots[slot]
            self.seq_lens[slot] += 1  # the step cached cur's K/V
            tok = int(nxt[slot])
            self._mark_tokens(st.request_id, 1)
            st.tokens.append(tok)
            self.cur[slot] = tok
            done = (
                tok == self.ecfg.eot_id
                or len(st.tokens) >= self.ecfg.max_new_tokens
            )
            events.append(StepEvent(st.request_id, tok, done))
            if done:
                self._retire(slot)
        return events

    def _run_pipelined(self, on_event=None) -> None:
        """Windowed decode: ONE device call + ONE fetch per decode_chunk
        tokens.

        The device relay executes lazily and charges per FETCH — per-token
        or per-chunk synchronous stepping replays work on every sync
        (docs/PERF_NOTES.md round-2 addendum). So the whole window runs
        inside a jitted while_loop with on-device eot + per-slot budget
        checks (finished slots freeze, the loop exits early when all are
        done), and the host syncs exactly once per window, then
        retires/admits at the boundary.
        """
        e = self.ecfg
        if self._pending_events:  # leftovers from a prior step() call
            if on_event is not None:
                for ev in self._pending_events:
                    on_event(ev)
            self._pending_events = []
        import time as _time

        def _lap(name, t0):
            t1 = _time.perf_counter()
            self.timing[name] = self.timing.get(name, 0.0) + (t1 - t0)
            return t1

        while self.has_work():
            t0 = _time.perf_counter()
            self._advance_prefills()
            t0 = _lap("prefill_chunks", t0)
            self._admit(defer_tok0=True)
            t0 = _lap("admit", t0)
            if not self.active.any():
                if self._prefill_jobs:
                    continue  # chunked prefills will activate their slots
                if self.queue:
                    rid, _, plen = self.queue[0]
                    raise RuntimeError(
                        f"request {rid} (prompt {plen}) needs more pages than "
                        "the empty engine can provide — raise num_pages"
                    )
                continue
            live = [s for s in range(e.slots) if self.active[s]]
            rem = np.zeros(e.slots, np.int32)
            for s in live:
                # fresh slots: tok0 (still device-side) counts against the
                # budget even though tokens[] is empty until the fetch
                rem[s] = e.max_new_tokens - len(self.slots[s].tokens) - (
                    1 if s in self._fresh else 0
                )
            # seed the deferred device tok0s into cur (lazy device ops — no
            # host sync until the window's packed fetch)
            cur_dev = jnp.asarray(self.cur)
            for slot_list, tok0s in self._deferred:
                cur_dev = cur_dev.at[jnp.asarray(slot_list, jnp.int32)].set(tok0s)
            self._deferred = []
            # dense-cache column budget: longest live sequence, bucketed to
            # 256-multiples of page_size so shapes (and compiles) are few.
            # 256 (not 512): the dense total rounds UP to the attention
            # kernel's 512-block after adding the window, so a 512 bucket
            # wastes up to a whole extra block of per-step KV reads (5632
            # vs 5120 columns on the 4.7k-token bench prompt = +10%/step)
            bucket = e.page_size * max(1, 256 // e.page_size)
            s_base = int(max(self.seq_lens[s] for s in live))
            s_base = ((s_base + bucket - 1) // bucket) * bucket
            s_base = min(s_base, e.max_pages_per_slot * e.page_size)
            # burst fast path: every live slot admitted this cycle with the
            # same prompt shape -> feed prefill K/V straight into the dense
            # window cache (no page seed, no gather); otherwise seed any
            # pending fresh K/V into pages and gather as usual
            fresh_kv = self._fresh_kv
            use_fresh = (
                bool(fresh_kv)
                and all(s in fresh_kv for s in live)
                and len({fresh_kv[s][0].shape for s in live}) == 1
            )
            if fresh_kv and not use_fresh:
                for s, (ks_s, vs_s, plen, page_vec) in list(fresh_kv.items()):
                    self.k_pool, self.v_pool = self._seed_fn(
                        self.k_pool, self.v_pool, ks_s, vs_s,
                        jnp.asarray(page_vec), jnp.asarray(plen, jnp.int32),
                    )
                self._fresh_kv = {}
                fresh_kv = {}
            t0 = _lap("window_setup", t0)
            start_lens = self.seq_lens.copy()
            kwin = vwin = None
            if use_fresh:
                order = sorted(live)
                ks_b = jnp.stack([fresh_kv[s][0] for s in order], axis=1)
                vs_b = jnp.stack([fresh_kv[s][1] for s in order], axis=1)
                packed, kwin, vwin = self._decode_window_fresh_fn(
                    self.params, ks_b, vs_b,
                    jnp.asarray(order, jnp.int32), cur_dev,
                    jnp.asarray(self.seq_lens), jnp.asarray(self.active),
                    jnp.asarray(rem), s_base=s_base, steps=e.decode_chunk,
                )
            else:
                packed, self.k_pool, self.v_pool = self._decode_window_fn(
                    self.params, self.k_pool, self.v_pool,
                    cur_dev, jnp.asarray(self.block_table),
                    jnp.asarray(self.seq_lens), jnp.asarray(self.active),
                    jnp.asarray(rem), s_base=s_base, steps=e.decode_chunk,
                )
            t0 = _lap("window_dispatch", t0)
            packed = np.asarray(packed)  # the cycle's SINGLE device fetch
            t0 = _lap("window_fetch", t0)
            cur0, counts, toks = packed[0], packed[1], packed[2:]
            fresh, self._fresh = self._fresh, set()
            for s in live:
                st = self.slots[s]
                if s in fresh:
                    tok0 = int(cur0[s])
                    self._mark_tokens(st.request_id, 1)
                    st.tokens.append(tok0)
                    done0 = tok0 == e.eot_id or e.max_new_tokens == 1
                    if on_event is not None:
                        on_event(StepEvent(st.request_id, tok0, done0))
                n = int(counts[s])
                self._mark_tokens(st.request_id, n)
                for t in range(n):
                    tok = int(toks[t, s])
                    st.tokens.append(tok)
                    done = (
                        tok == e.eot_id
                        or len(st.tokens) >= e.max_new_tokens
                    )
                    if on_event is not None:
                        on_event(StepEvent(st.request_id, tok, done))
                self.cur[s] = st.tokens[-1]
                self.seq_lens[s] += n
                if (
                    st.tokens[-1] == e.eot_id
                    or len(st.tokens) >= e.max_new_tokens
                ):
                    self._retire(s)
            if use_fresh:
                # the window ran without touching the page pools; slots
                # that SURVIVED it will be gathered from pages next window,
                # so flush their window K/V and seed their prompt pages
                # now. Retired slots' pages were never read — both writes
                # are skipped entirely (the bench burst case: zero pool
                # traffic end to end).
                survivors = [s for s in order if self.active[s]]
                if survivors:
                    counts_m = np.where(self.active, counts, 0).astype(np.int32)
                    self.k_pool, self.v_pool = self._flush_fn(
                        self.k_pool, self.v_pool, kwin, vwin,
                        jnp.asarray(self.block_table),
                        jnp.asarray(start_lens), jnp.asarray(counts_m),
                        s_base=0, window=e.decode_chunk,
                    )
                    for s in survivors:
                        ks_s, vs_s, plen, page_vec = fresh_kv[s]
                        self.k_pool, self.v_pool = self._seed_fn(
                            self.k_pool, self.v_pool, ks_s, vs_s,
                            jnp.asarray(page_vec), jnp.asarray(plen, jnp.int32),
                        )
                self._fresh_kv = {}
