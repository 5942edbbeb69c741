"""GPipe-style pipeline parallelism for the decoder.

The reference never pipelines GAR itself — pipeline parallelism appears
only as a vLLM flag on the DLC judge server
(evaluation/DLC-Bench/serve_judge.sh:7) because its 1B/8B decoders fit a
single GPU. On TPU the same models may want to ride more, smaller chips
(or a >8B decoder may land): this module closes SURVEY §2.3's last row
with a real schedule, not a flag.

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

__all__ = ["make_pipeline_mesh", "pipeline_prefill", "pipeline_bubble_fraction"]


def make_pipeline_mesh(n_stages: int, devices=None) -> Mesh:
    """A 1-D ('pipe',) mesh over the first n_stages devices."""
    devices = list(jax.devices() if devices is None else devices)
    if len(devices) < n_stages:
        raise ValueError(f"need {n_stages} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n_stages]), ("pipe",))


def pipeline_bubble_fraction(n_stages: int, n_micro: int) -> float:
    """Idle fraction of the GPipe schedule: (P-1)/(M+P-1)."""
    return (n_stages - 1) / (n_micro + n_stages - 1)


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
    n_stages = mesh.shape["pipe"]
    B, S, D = inputs_embeds.shape
    names = mesh.axis_names
    dp_axes = tuple(a for a in ("data", "fsdp") if a in names)
    dp = 1
    for a in dp_axes:
        dp *= mesh.shape[a]
    for a in ("tensor", "seq"):
        if a in names and mesh.shape[a] > 1:
            raise ValueError(
                f"pipeline_prefill composes with data/fsdp only; mesh axis "
                f"'{a}' has size {mesh.shape[a]} (must be 1 when pipe > 1)"
            )
    if n_micro is None:
        n_micro = max(1, B // max(dp, 1))
    if B % n_micro != 0:
        raise ValueError(f"batch {B} must divide into n_micro={n_micro}")
    if cfg.num_layers % n_stages != 0:
        raise ValueError(
            f"pipe axis {n_stages} must evenly divide num_layers "
            f"{cfg.num_layers}"
        )
    M, mb = n_micro, B // n_micro
    if dp > 1 and mb % dp != 0:
        raise ValueError(
            f"microbatch rows {mb} must divide over data*fsdp={dp} "
            f"(lower n_micro or raise the batch)"
        )
    eps = cfg.rms_norm_eps
    dh = cfg.head_dim
    lora_scaling = params.get("lora_scaling")
    has_lora = lora_scaling is not None

    cos, sin = rope_cos_sin(positions, llama_inv_freq(cfg))  # (B, S, Dh)
    embeds_mb = inputs_embeds.reshape(M, mb, S, D)
    cos_mb = cos.reshape(M, mb, S, dh)
    sin_mb = sin.reshape(M, mb, S, dh)
    has_seg = segment_ids is not None
    seg_mb = segment_ids.reshape(M, mb, S) if has_seg else jnp.zeros((M, mb, S), jnp.int32)

    def stage(blocks_local, ls, x, cos_t, sin_t, seg_t):
        # same block body as llama_prefill (models/llama.py:178), minus the
        # SP/ring branches — pipe composes with plain per-stage attention
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
