"""Pipeline parallelism for the decoder: GPipe and 1F1B schedules.

The reference never pipelines GAR itself — pipeline parallelism appears
only as a vLLM flag on the DLC judge server
(evaluation/DLC-Bench/serve_judge.sh:7) because its 1B/8B decoders fit a
single GPU. On TPU the same models may want to ride more, smaller chips
(or a >8B decoder may land): this module closes SURVEY §2.3's last row
with two real schedules, not a flag — ``pipeline_prefill`` (GPipe;
differentiate through it for training) and ``pipeline_train_1f1b``
(production 1F1B: same bubble, O(P) instead of O(M) activation memory;
its docstring has the schedule math).

Design (TPU-native — XLA collectives over ICI, no NCCL p2p):

* the mesh gets a ``pipe`` axis; the STACKED layer dim of
  ``params["blocks"]`` (every leaf is ``(L, ...)``, see
  models/llama.py:56) shards over it with ``PartitionSpec('pipe')`` —
  each stage holds ``L/P`` contiguous layers and weights are never
  duplicated (parallel/sharding.py's ``param_pspecs(pipe=True)``).
* ``shard_map`` runs the classic GPipe loop: ``M`` microbatches flow
  through the ``P`` stages in ``M+P-1`` ticks. Each tick, every stage
  applies its local layer slice (a ``lax.scan`` over the slice — the
  same compiled block as the single-chip path) and the activation then
  rotates one stage forward via ``lax.ppermute``. Stage 0 injects
  microbatch ``t`` at tick ``t``; stage ``P-1`` retires microbatch
  ``t-(P-1)``.
* bubble fraction is ``(P-1)/(M+P-1)``; pick ``M >= 4*(P-1)`` to keep
  it under ~20%. ``n_micro`` must divide the batch.
* everything in the loop (``ppermute``/``scan``/``where``) transposes
  cleanly, so ``jax.grad`` backprops straight through the schedule —
  the reverse pass is automatically the reverse pipeline. ``remat=True``
  checkpoints each layer body exactly like ``llama_prefill(remat=True)``
  so only inter-layer activations live across the backward.

Composition: when the mesh also carries ``data``/``fsdp`` axes, the
microbatch dim shards over them — each data-parallel group runs its own
pipeline on its batch rows; shard_map's transpose psums the weight grads
over the replicated axes, exactly DDP semantics. ``tensor``/``seq`` must
stay 1 (the stage body runs dense per-stage matmuls); ``train.step``
enforces this. Results leave the loop via a pipe-stacked output (the
last stage's slice is sliced out by the caller) instead of an
O(B*S*D) psum over every stage.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core.config import TextConfig
from ..models.llama import _mlp, _proj, _qkv
from ..ops.attention import mha
from ..ops.norms import rms_norm
from ..ops.rope import llama_inv_freq, rope_cos_sin

__all__ = [
    "make_pipeline_mesh",
    "pipeline_prefill",
    "pipeline_train_1f1b",
    "pipeline_bubble_fraction",
]


def _make_stage(cfg, *, remat, use_flash, right_padded, has_seg, has_lora):
    """Per-stage layer-slice forward, shared by the GPipe and 1F1B schedules.

    Same block body as llama_prefill (models/llama.py:178), minus the
    SP/ring branches — pipe composes with plain per-stage attention.
    stage(blocks_local, ls, x, cos_t, sin_t, seg_t) -> x
    """
    eps = cfg.rms_norm_eps

    def stage(blocks_local, ls, x, cos_t, sin_t, seg_t):
        seg = seg_t if has_seg else None
        scal = ls if has_lora else None

        def body(x, bp):
            y = rms_norm(x, bp["attn_norm"], eps)
            q, k, v = _qkv(cfg, bp, y, cos_t, sin_t, scal)
            a = mha(q, k, v, causal=True, segment_ids=seg,
                    use_flash=use_flash, right_padded=right_padded)
            a = _proj(bp, "wo", a.reshape(x.shape[0], x.shape[1], -1), scal)
            x = x + a
            y = rms_norm(x, bp["mlp_norm"], eps)
            return x + _mlp(bp, y, scal), None

        body_fn = jax.checkpoint(body) if remat else body
        x, _ = jax.lax.scan(body_fn, x, blocks_local)
        return x

    return stage


def make_pipeline_mesh(n_stages: int, devices=None) -> Mesh:
    """A 1-D ('pipe',) mesh over the first n_stages devices."""
    devices = list(jax.devices() if devices is None else devices)
    if len(devices) < n_stages:
        raise ValueError(f"need {n_stages} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n_stages]), ("pipe",))


def pipeline_bubble_fraction(n_stages: int, n_micro: int) -> float:
    """Idle fraction of the GPipe schedule: (P-1)/(M+P-1)."""
    return (n_stages - 1) / (n_micro + n_stages - 1)


def _pipe_layout(mesh: Mesh, cfg: TextConfig, batch: int, n_micro):
    """Validate mesh/batch/microbatch composition shared by both schedules.

    Returns (n_stages, dp_axes, n_micro, microbatch_rows)."""
    n_stages = mesh.shape["pipe"]
    names = mesh.axis_names
    dp_axes = tuple(a for a in ("data", "fsdp") if a in names)
    dp = 1
    for a in dp_axes:
        dp *= mesh.shape[a]
    for a in ("tensor", "seq"):
        if a in names and mesh.shape[a] > 1:
            raise ValueError(
                f"pipeline composes with data/fsdp only; mesh axis "
                f"'{a}' has size {mesh.shape[a]} (must be 1 when pipe > 1)"
            )
    if n_micro is None:
        n_micro = max(1, batch // max(dp, 1))
    if batch % n_micro != 0:
        raise ValueError(f"batch {batch} must divide into n_micro={n_micro}")
    if cfg.num_layers % n_stages != 0:
        raise ValueError(
            f"pipe axis {n_stages} must evenly divide num_layers "
            f"{cfg.num_layers}"
        )
    M, mb = n_micro, batch // n_micro
    if dp > 1 and mb % dp != 0:
        raise ValueError(
            f"microbatch rows {mb} must divide over data*fsdp={dp} "
            f"(lower n_micro or raise the batch)"
        )
    return n_stages, dp_axes, M, mb


def pipeline_prefill(
    params: dict,
    cfg: TextConfig,
    inputs_embeds: jnp.ndarray,  # (B, S, D)
    positions: jnp.ndarray,  # (B, S) int32
    mesh: Mesh,
    *,
    n_micro: Optional[int] = None,
    remat: bool = False,
    use_flash: Optional[bool] = None,
    segment_ids: Optional[jnp.ndarray] = None,  # (B, S) packing/padding mask
    right_padded: bool = True,
) -> jnp.ndarray:
    """Decoder forward, layer-partitioned over the mesh's 'pipe' axis.

    Numerically identical to llama_prefill's hidden states (same per-layer
    body incl. LoRA deltas and segment-aware attention;
    tests/test_pipeline.py asserts parity fwd+bwd). Returns hidden
    (B, S, D); the final rms_norm/lm head stay with the caller, as in
    llama_prefill. KV stacks are not returned — the pipelined path is a
    training-forward surface; inference keeps the TP/fused-decode path.

    The mesh may be the 1-D ('pipe',) mesh or a composed
    (data, fsdp, ..., pipe) mesh: the microbatch dim shards over
    data/fsdp, pipe partitions the layers. n_micro defaults to
    B // (data*fsdp) so each data-parallel shard owns whole microbatches.
    """
    n_stages, dp_axes, M, mb = _pipe_layout(
        mesh, cfg, inputs_embeds.shape[0], n_micro
    )
    B, S, D = inputs_embeds.shape
    dh = cfg.head_dim
    lora_scaling = params.get("lora_scaling")
    has_lora = lora_scaling is not None

    cos, sin = rope_cos_sin(positions, llama_inv_freq(cfg))  # (B, S, Dh)
    embeds_mb = inputs_embeds.reshape(M, mb, S, D)
    cos_mb = cos.reshape(M, mb, S, dh)
    sin_mb = sin.reshape(M, mb, S, dh)
    has_seg = segment_ids is not None
    seg_mb = segment_ids.reshape(M, mb, S) if has_seg else jnp.zeros((M, mb, S), jnp.int32)

    stage = _make_stage(cfg, remat=remat, use_flash=use_flash,
                        right_padded=right_padded, has_seg=has_seg,
                        has_lora=has_lora)

    mb_dim = dp_axes if dp_axes else None

    def pipelined(blocks_local, ls, embeds, cos_r, sin_r, seg_r):
        idx = jax.lax.axis_index("pipe")
        # initial carries are device-varying over pipe after tick 1 (each
        # stage computes different values) and over the data axes (each dp
        # shard pipelines its own rows); mark them so the scan carry type
        # is stable under the VMA (varying-manual-axes) check
        vary = ("pipe",) + dp_axes
        state = jax.lax.pcast(
            jnp.zeros(embeds.shape[1:], embeds.dtype), vary, to="varying"
        )  # (mb_loc, S, D)
        outs = jax.lax.pcast(
            jnp.zeros(embeds.shape, embeds.dtype), vary, to="varying"
        )  # (M, mb_loc, S, D)

        def tick(carry, t):
            state, outs = carry
            # the microbatch THIS stage processes at tick t is t - idx;
            # clip keeps warmup/drain ticks in-range (their results are
            # never recorded)
            mb_i = jnp.clip(t - idx, 0, M - 1)
            inj = jax.lax.dynamic_index_in_dim(
                embeds, jnp.minimum(t, M - 1), 0, keepdims=False
            )
            x = jnp.where(idx == 0, inj, state)
            cos_t = jax.lax.dynamic_index_in_dim(cos_r, mb_i, 0, keepdims=False)
            sin_t = jax.lax.dynamic_index_in_dim(sin_r, mb_i, 0, keepdims=False)
            seg_t = jax.lax.dynamic_index_in_dim(seg_r, mb_i, 0, keepdims=False)
            x = stage(blocks_local, ls, x, cos_t, sin_t, seg_t)
            # last stage retires microbatch t-(P-1)
            ot = jnp.clip(t - (n_stages - 1), 0, M - 1)
            valid = (idx == n_stages - 1) & (t >= n_stages - 1)
            cur = jax.lax.dynamic_index_in_dim(outs, ot, 0, keepdims=False)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(valid, x, cur), ot, 0
            )
            state = jax.lax.ppermute(
                x, "pipe", [(i, (i + 1) % n_stages) for i in range(n_stages)]
            )
            return (state, outs), None

        (state, outs), _ = jax.lax.scan(
            tick, (state, outs), jnp.arange(M + n_stages - 1)
        )
        # results live on the last stage only; emit a pipe-stacked output
        # (the caller slices stage P-1) instead of psum-replicating the
        # whole (M, mb, S, D) buffer through every stage.
        return outs[None]

    from jax import shard_map

    fn = shard_map(
        pipelined,
        mesh=mesh,
        in_specs=(
            P("pipe"),                      # blocks: layer dim over stages
            P(),                            # lora scaling scalar
            P(None, mb_dim, None, None),    # embeds (M, mb, S, D)
            P(None, mb_dim, None, None),    # cos
            P(None, mb_dim, None, None),    # sin
            P(None, mb_dim, None),          # segment ids
        ),
        out_specs=P("pipe", None, mb_dim, None, None),
    )
    ls_arg = lora_scaling if has_lora else jnp.zeros((), jnp.float32)
    outs = fn(params["blocks"], ls_arg, embeds_mb, cos_mb, sin_mb, seg_mb)
    return outs[-1].reshape(B, S, D)


def pipeline_train_1f1b(
    llm_params: dict,
    cfg: TextConfig,
    inputs_embeds: jnp.ndarray,  # (B, S, D)
    positions: jnp.ndarray,  # (B, S) int32
    labels: jnp.ndarray,  # (B, S) UNshifted; -100 = ignore
    mesh: Mesh,
    *,
    n_micro: Optional[int] = None,
    remat: bool = True,
    use_flash: Optional[bool] = None,
    segment_ids: Optional[jnp.ndarray] = None,
    right_padded: bool = True,
    valid_vocab: Optional[int] = None,
    ce_chunk: int = 1024,
):
    """Decoder loss + gradients under the 1F1B pipeline schedule.

    GPipe (pipeline_prefill under jax.grad) runs all M forwards, then all M
    backwards: every stage holds M microbatches of inter-layer activations
    across the turnaround. 1F1B runs each microbatch's backward as soon as
    its forward reaches the last stage, so stage s holds at most P-s
    in-flight microbatches — peak activation memory is O(P), independent of
    M, at the SAME bubble fraction (P-1)/(M+P-1) per pass. This is the
    standard production schedule (non-interleaved 1F1B, the default in
    Megatron-LM); the reference never pipelines at all (vLLM judge flag
    only, evaluation/DLC-Bench/serve_judge.sh:7).

    TPU-native formulation: one shard_map whose body is a lax.scan over
    2M+2P-2 half-ticks. At half-tick h, stage idx FORWARDS microbatch
    f=(h-idx)/2 when that is a whole number in [0,M) and BACKWARDS
    b=(h-(2P-1-idx))/2 likewise — the parities are disjoint, so each stage
    does exactly one of {F, B, idle} per half-tick, alternating F,B,F,B in
    steady state (that is the name "1F1B"). Which one runs is a
    device-varying lax.switch: XLA lowers it to a real per-device branch,
    so idle/F/B ticks cost only what they execute. Activations travel
    stage->stage+1 and cotangents stage->stage-1 via lax.ppermute each
    half-tick; a stage's saved inputs live in a P-slot ring buffer and the
    backward re-runs its forward under jax.vjp (with per-layer remat, so
    residency stays one layer deep — identical recompute policy to the
    GPipe/grad path).

    The loss head (final norm + LM head CE) runs on the LAST stage inside
    its forward tick: per-microbatch NLL sums are seeded with the global
    1/supervised_count cotangent (computable from labels alone before any
    compute), which makes the result bit-comparable to
    chunked_cross_entropy's global mean. Gradients for the stage-local
    layer slice accumulate on the stage that owns those weights (they
    never move); head grads live on the last stage; d(embeds) leaves
    stage 0. Composition with data/fsdp axes matches pipeline_prefill
    (microbatch rows shard over them; block/head grads psum over them).

    Returns (loss, d_llm, d_embeds) where d_llm has "blocks" (layer dim
    sharded over 'pipe', exactly where the params live) plus the head
    leaves ("final_norm" and "embed" or "lm_head"); the caller merges
    these with the embedding-path vjp (train/step.loss_and_grads_1f1b).
    """
    from ..train.losses import ce_sums, shift_labels, IGNORE_INDEX

    n_stages, dp_axes, M, mb = _pipe_layout(
        mesh, cfg, inputs_embeds.shape[0], n_micro
    )
    B, S, D = inputs_embeds.shape
    dh = cfg.head_dim
    lora_scaling = llm_params.get("lora_scaling")
    has_lora = lora_scaling is not None
    has_seg = segment_ids is not None

    cos, sin = rope_cos_sin(positions, llama_inv_freq(cfg))
    embeds_mb = inputs_embeds.reshape(M, mb, S, D)
    cos_mb = cos.reshape(M, mb, S, dh)
    sin_mb = sin.reshape(M, mb, S, dh)
    seg_mb = (
        segment_ids.reshape(M, mb, S) if has_seg
        else jnp.zeros((M, mb, S), jnp.int32)
    )

    shifted = shift_labels(labels)
    lab_mb = shifted.reshape(M, mb, S)
    inv_count = 1.0 / jnp.maximum(
        (shifted != IGNORE_INDEX).sum(), 1
    ).astype(jnp.float32)

    tied = "lm_head" not in llm_params
    head_p = {
        "final_norm": llm_params["final_norm"],
        ("embed" if tied else "lm_head"): (
            llm_params["embed"] if tied else llm_params["lm_head"]
        ),
    }

    stage = _make_stage(cfg, remat=remat, use_flash=use_flash,
                        right_padded=right_padded, has_seg=has_seg,
                        has_lora=has_lora)

    def head_nll(hp, y, lab):
        total, _ = ce_sums(hp, cfg, y, lab, chunk_size=ce_chunk,
                           valid_vocab=valid_vocab)
        return total

    Np = n_stages
    half_ticks = 2 * M + 2 * Np - 2
    mb_dim = dp_axes if dp_axes else None
    tmap = jax.tree_util.tree_map

    def dyn(a, i):
        return jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False)

    def pipelined(blocks_local, ls, hp, embeds, cos_r, sin_r, seg_r, lab_r,
                  inv_n):
        idx = jax.lax.axis_index("pipe")
        vary = ("pipe",) + dp_axes
        # the vjp cotangent seed must carry the same varying-manual-axes
        # type as the differentiated output (which varies per stage/shard)
        inv_v = jax.lax.pcast(inv_n, vary, to="varying")
        # differentiate w.r.t. VARYING copies of the weights: a vjp w.r.t.
        # an unvarying input transposes the implicit pvary into a psum —
        # a collective inside the cond/switch branches (and an M-times
        # rebroadcast of full weight grads). pcast keeps every grad
        # per-device; the single psum over dp happens after the scan.
        blocks_v = (
            tmap(lambda w: jax.lax.pcast(w, dp_axes, to="varying"),
                 blocks_local)
            if dp_axes else blocks_local
        )
        hp_v = tmap(lambda w: jax.lax.pcast(w, vary, to="varying"), hp)

        def vz(shape, dtype):
            return jax.lax.pcast(jnp.zeros(shape, dtype), vary, to="varying")

        x_shape = embeds.shape[1:]  # (mb_loc, S, D)
        carry0 = (
            vz((Np,) + x_shape, embeds.dtype),          # ring of saved inputs
            vz(x_shape, embeds.dtype),                  # fwd activation msg
            vz(x_shape, embeds.dtype),                  # bwd cotangent msg
            vz(x_shape, embeds.dtype),                  # last stage's own ct
            tmap(lambda w: vz(w.shape, w.dtype), blocks_local),
            tmap(lambda w: vz(w.shape, w.dtype), hp),
            vz(embeds.shape, embeds.dtype),             # d(embeds), stage 0
            vz((), jnp.float32),                        # nll accumulator
        )
        fperm = [(i, (i + 1) % Np) for i in range(Np)]
        bperm = [(i, (i - 1) % Np) for i in range(Np)]

        def tick(carry, h):
            tf = h - idx
            tb = h - (2 * Np - 1 - idx)
            is_f = (tf >= 0) & (tf % 2 == 0) & (tf < 2 * M)
            is_b = (tb >= 0) & (tb % 2 == 0) & (tb < 2 * M)
            f = jnp.clip(tf // 2, 0, M - 1)
            b = jnp.clip(tb // 2, 0, M - 1)

            def idle(carry):
                return carry

            def fwd(carry):
                ring, fwd_msg, bwd_msg, pend_ct, gB, gH, gE, nll = carry
                x = jnp.where(idx == 0, dyn(embeds, f), fwd_msg)
                ring = jax.lax.dynamic_update_index_in_dim(
                    ring, x, f % Np, 0
                )
                cos_t, sin_t = dyn(cos_r, f), dyn(sin_r, f)
                seg_t, lab_t = dyn(seg_r, f), dyn(lab_r, f)
                y = stage(blocks_v, ls, x, cos_t, sin_t, seg_t)

                def with_head(y):
                    nll_f, pb = jax.vjp(
                        lambda hp_, yy: head_nll(hp_, yy, lab_t), hp_v, y
                    )
                    g_hp, ct = pb(inv_v)
                    return nll_f, g_hp, ct

                def no_head(y):
                    return (
                        vz((), jnp.float32),
                        tmap(lambda w: vz(w.shape, w.dtype), hp_v),
                        jnp.zeros_like(y),
                    )

                nll_f, g_hp, ct = jax.lax.cond(
                    idx == Np - 1, with_head, no_head, y
                )
                pend_ct = jnp.where(idx == Np - 1, ct, pend_ct)
                gH = tmap(jnp.add, gH, g_hp)
                return (ring, y, bwd_msg, pend_ct, gB, gH, gE, nll + nll_f)

            def bwd(carry):
                ring, fwd_msg, bwd_msg, pend_ct, gB, gH, gE, nll = carry
                x = dyn(ring, b % Np)
                ct = jnp.where(idx == Np - 1, pend_ct, bwd_msg)
                cos_t, sin_t = dyn(cos_r, b), dyn(sin_r, b)
                seg_t = dyn(seg_r, b)
                _, pb = jax.vjp(
                    lambda bl, xx: stage(bl, ls, xx, cos_t, sin_t, seg_t),
                    blocks_v, x,
                )
                g_bl, g_x = pb(ct)
                gB = tmap(jnp.add, gB, g_bl)
                gE = jnp.where(
                    idx == 0,
                    jax.lax.dynamic_update_index_in_dim(gE, g_x, b, 0),
                    gE,
                )
                return (ring, fwd_msg, g_x, pend_ct, gB, gH, gE, nll)

            branch = is_f.astype(jnp.int32) + 2 * is_b.astype(jnp.int32)
            carry = jax.lax.switch(branch, [idle, fwd, bwd], carry)
            ring, fwd_msg, bwd_msg, pend_ct, gB, gH, gE, nll = carry
            fwd_msg = jax.lax.ppermute(fwd_msg, "pipe", fperm)
            bwd_msg = jax.lax.ppermute(bwd_msg, "pipe", bperm)
            return (ring, fwd_msg, bwd_msg, pend_ct, gB, gH, gE, nll), None

        carry, _ = jax.lax.scan(
            tick, carry0, jnp.arange(half_ticks, dtype=jnp.int32)
        )
        _, _, _, _, gB, gH, gE, nll = carry
        if dp_axes:
            gB = jax.lax.psum(gB, dp_axes)
            gH = jax.lax.psum(gH, dp_axes)
            nll = jax.lax.psum(nll, dp_axes)
        loss = jax.lax.psum(nll, "pipe") * inv_n
        # grads stay where their params live: blocks on their stage (the
        # 'pipe'-sharded out_spec reassembles the layer dim), head grads
        # stacked over pipe (caller slices the last stage), d(embeds)
        # stacked (caller slices stage 0) — no O(B*S*D) or O(V*D) psums.
        return loss, gB, tmap(lambda g: g[None], gH), gE[None]

    from jax import shard_map

    blocks = llm_params["blocks"]
    fn = shard_map(
        pipelined,
        mesh=mesh,
        in_specs=(
            P("pipe"),                     # blocks: layer dim over stages
            P(),                           # lora scaling scalar
            P(),                           # head params (replicated)
            P(None, mb_dim, None, None),   # embeds (M, mb, S, D)
            P(None, mb_dim, None, None),   # cos
            P(None, mb_dim, None, None),   # sin
            P(None, mb_dim, None),         # segment ids
            P(None, mb_dim, None),         # labels (shifted)
            P(),                           # 1/supervised-count
        ),
        out_specs=(
            P(),                                    # loss (replicated)
            tmap(lambda _: P("pipe"), blocks),      # block grads: layer dim
            tmap(lambda _: P("pipe"), head_p),      # head grads, pipe-stacked
            P("pipe", None, mb_dim, None, None),    # d(embeds), pipe-stacked
        ),
    )
    ls_arg = lora_scaling if has_lora else jnp.zeros((), jnp.float32)
    loss, g_blocks, g_head_st, g_emb_st = fn(
        blocks, ls_arg, head_p, embeds_mb, cos_mb, sin_mb, seg_mb, lab_mb,
        inv_count,
    )
    d_llm = {"blocks": g_blocks}
    d_llm.update(tmap(lambda g: g[-1], g_head_st))
    d_embeds = g_emb_st[0].reshape(B, S, D)
    return loss, d_llm, d_embeds
