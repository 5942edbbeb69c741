"""The jitted training step, sharded over the (data, fsdp, tensor, seq) mesh.

Replaces the reference's mmengine Runner + DDP + DeepSpeed ZeRO-2 step
(SURVEY.md §3.1): forward (remat'd), chunked CE, grad, clip, AdamW — one
compiled function.

Sharding flow (idiomatic jax.jit + committed inputs):
  1. `shard_params(params, mesh)` places params per parallel/sharding.py
  2. `init_sharded_state` builds optimizer state *under jit from the sharded
     params*, so Adam moments inherit the exact param shardings (ZeRO: the
     optimizer state only ever exists on the fsdp shards)
  3. the train step is jit'ed without explicit shardings — committed input
     shardings + GSPMD propagation insert all collectives (grad psum over
     ('data','fsdp'), TP all-reduces over 'tensor') on ICI.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import GARConfig
from ..models.gar import GARBatch, build_prefill_embeds
from ..models.llama import embed_tokens, llama_prefill
from ..parallel.sharding import batch_pspecs, shard_params
from .losses import chunked_cross_entropy, shift_labels
from .optimizer import OptimizerConfig, make_optimizer


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def _pipe_size(mesh: Optional[Mesh]) -> int:
    if mesh is None or "pipe" not in mesh.axis_names:
        return 1
    return mesh.shape["pipe"]


def loss_fn(
    params: Any,
    cfg: GARConfig,
    batch: GARBatch,
    labels: jnp.ndarray,
    *,
    mask_compat: bool = True,
    use_flash: Optional[bool] = None,
    mesh: Optional[Mesh] = None,
    ce_chunk: int = 1024,
    vit_remat_group: int = 1,
) -> jnp.ndarray:
    embeds = build_prefill_embeds(
        params, cfg, batch, mask_compat=mask_compat, remat=True,
        remat_group=vit_remat_group, compute_dtype=jnp.bfloat16, mesh=mesh,
    )
    if _pipe_size(mesh) > 1:
        from ..parallel.pipeline import pipeline_prefill

        hidden = pipeline_prefill(
            params["llm"], cfg.text, embeds, batch.positions, mesh,
            segment_ids=batch.segment_ids, remat=True, use_flash=use_flash,
        )
    else:
        hidden, _ = llama_prefill(
            params["llm"], cfg.text, embeds, batch.positions,
            segment_ids=batch.segment_ids, remat=True, use_flash=use_flash,
            mesh=mesh,
        )
    return chunked_cross_entropy(
        params["llm"], cfg.text, hidden, shift_labels(labels),
        valid_vocab=cfg.extended_vocab_size, chunk_size=ce_chunk,
    )


def packed_loss_fn(
    params: Any,
    cfg: GARConfig,
    packed,  # data.builders.PackedTextBatch
    *,
    use_flash: Optional[bool] = None,
    mesh: Optional[Mesh] = None,
) -> jnp.ndarray:
    """Loss over packed text-only rows (many documents per row, block-diagonal
    segment mask; the reference's varlen path, custom_collect_fn.py:96-106).

    right_padded=False routes attention through the segment-aware flash
    kernel; per-document position ids come pre-reset from pack_text_batch."""
    embeds = embed_tokens(params["llm"], packed.input_ids, jnp.bfloat16,
                          mesh=mesh)
    if _pipe_size(mesh) > 1:
        from ..parallel.pipeline import pipeline_prefill

        hidden = pipeline_prefill(
            params["llm"], cfg.text, embeds, packed.positions, mesh,
            segment_ids=packed.segment_ids, remat=True, use_flash=use_flash,
            right_padded=False,
        )
    else:
        hidden, _ = llama_prefill(
            params["llm"], cfg.text, embeds, packed.positions,
            segment_ids=packed.segment_ids, remat=True, use_flash=use_flash,
            right_padded=False, mesh=mesh,
        )
    return chunked_cross_entropy(
        params["llm"], cfg.text, hidden, shift_labels(packed.labels),
        valid_vocab=cfg.extended_vocab_size,
    )


def _merge_pipe_grads(grads: dict, d_llm: dict) -> dict:
    """Add 1F1B decoder grads (blocks + head leaves) into the full-tree
    grads produced by the embedding-path vjp."""
    gl = dict(grads["llm"])
    gl["blocks"] = jax.tree_util.tree_map(
        jnp.add, gl["blocks"], d_llm["blocks"]
    )
    for k, v in d_llm.items():
        if k != "blocks":
            gl[k] = gl[k] + v
    out = dict(grads)
    out["llm"] = gl
    return out


def loss_and_grads_1f1b(
    params: Any,
    cfg: GARConfig,
    batch: GARBatch,
    labels: jnp.ndarray,
    *,
    mask_compat: bool = True,
    use_flash: Optional[bool] = None,
    mesh: Optional[Mesh] = None,
) -> Tuple[jnp.ndarray, Any]:
    """value_and_grad equivalent of loss_fn under the 1F1B pipe schedule.

    The decoder+CE segment runs the manual 1F1B pipeline (activation
    memory O(P) instead of O(n_micro) — parallel/pipeline.py docstring);
    the vision/embedding front half backprops through an ordinary vjp fed
    the pipeline's d(embeds). Numerically equivalent to
    value_and_grad(loss_fn) with the GPipe schedule
    (tests/test_pipeline_1f1b.py)."""
    from ..parallel.pipeline import pipeline_train_1f1b

    def embeds_fn(p):
        return build_prefill_embeds(
            p, cfg, batch, mask_compat=mask_compat, remat=True,
            compute_dtype=jnp.bfloat16, mesh=mesh,
        )

    embeds, emb_vjp = jax.vjp(embeds_fn, params)
    loss, d_llm, d_embeds = pipeline_train_1f1b(
        params["llm"], cfg.text, embeds, batch.positions, labels, mesh,
        segment_ids=batch.segment_ids, remat=True, use_flash=use_flash,
        valid_vocab=cfg.extended_vocab_size,
    )
    (grads,) = emb_vjp(d_embeds)
    return loss, _merge_pipe_grads(grads, d_llm)


def packed_loss_and_grads_1f1b(
    params: Any,
    cfg: GARConfig,
    packed,
    *,
    use_flash: Optional[bool] = None,
    mesh: Optional[Mesh] = None,
) -> Tuple[jnp.ndarray, Any]:
    """1F1B counterpart of packed_loss_fn (text-only packed rows)."""
    from ..parallel.pipeline import pipeline_train_1f1b

    def embeds_fn(p):
        return embed_tokens(p["llm"], packed.input_ids, jnp.bfloat16,
                            mesh=mesh)

    embeds, emb_vjp = jax.vjp(embeds_fn, params)
    loss, d_llm, d_embeds = pipeline_train_1f1b(
        params["llm"], cfg.text, embeds, packed.positions, packed.labels,
        mesh, segment_ids=packed.segment_ids, remat=True,
        use_flash=use_flash, right_padded=False,
        valid_vocab=cfg.extended_vocab_size,
    )
    (grads,) = emb_vjp(d_embeds)
    return loss, _merge_pipe_grads(grads, d_llm)


def make_packed_train_step(
    cfg: GARConfig,
    tx: optax.GradientTransformation,
    *,
    use_flash: Optional[bool] = None,
    donate: bool = True,
    mesh: Optional[Mesh] = None,
    pipe_schedule: str = "gpipe",
):
    """Train step over PackedTextBatch rows. Pair with a frozen-vision
    optimizer regime (train/optimizer.py) — the packed path never touches
    vision params, so their gradients are zero.

    pipe_schedule: "gpipe" (grad through the pipelined forward) or "1f1b"
    (manual interleaved schedule, O(P) activation memory) — only
    meaningful when the mesh carries a pipe axis > 1."""
    use_1f1b = pipe_schedule == "1f1b" and _pipe_size(mesh) > 1
    if pipe_schedule not in ("gpipe", "1f1b"):
        raise ValueError(f"unknown pipe_schedule {pipe_schedule!r}")

    def step_fn(state: TrainState, packed):
        if use_1f1b:
            loss, grads = packed_loss_and_grads_1f1b(
                state.params, cfg, packed, use_flash=use_flash, mesh=mesh
            )
        else:
            loss, grads = jax.value_and_grad(
                lambda p: packed_loss_fn(p, cfg, packed, use_flash=use_flash,
                                         mesh=mesh)
            )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        return (
            TrainState(params=params, opt_state=opt_state, step=state.step + 1),
            metrics,
        )

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def opt_state_shardings(
    tx: optax.GradientTransformation, params: Any, mesh: Mesh
) -> Any:
    """NamedShardings for every optimizer-state leaf: Adam moments mirror
    their param's placement (ZeRO — the moment only lives on the fsdp shard
    that owns the weight), scalars/counters replicate.

    This must be EXPLICIT: ``jit(tx.init)(sharded_params)`` does NOT
    propagate shardings into the moments — they are ``zeros_like`` outputs
    with no data dependence on the inputs, so GSPMD's solver is free to
    replicate them (measured: a GAR-8B fsdp=8 train step carried 38.8 GiB
    of replicated state per device before this pin, 8.6 GiB after —
    docs/GAR8B_MEMORY.md). ``optax.tree_map_params`` walks multi_transform/
    masked wrappers to find the param-shaped moment leaves.
    """
    from ..parallel.sharding import param_shardings

    opt_shapes = jax.eval_shape(tx.init, params)
    pshard = param_shardings(params, mesh)
    replicated = NamedSharding(mesh, P())
    return optax.tree_map_params(
        tx,
        lambda _, psh: psh,
        opt_shapes,
        pshard,
        transform_non_params=lambda _: replicated,
    )


def init_sharded_state(
    params: Any,
    opt_cfg: OptimizerConfig,
    mesh: Optional[Mesh] = None,
) -> Tuple[TrainState, optax.GradientTransformation]:
    """Shard params onto the mesh, then init optimizer state under jit with
    explicitly pinned moment shardings (see opt_state_shardings)."""
    tx = make_optimizer(params, opt_cfg)
    if mesh is not None:
        params = shard_params(params, mesh)
        opt_state = jax.jit(
            tx.init, out_shardings=opt_state_shardings(tx, params, mesh)
        )(params)
    else:
        opt_state = jax.jit(tx.init)(params)
    return TrainState(params=params, opt_state=opt_state, step=jnp.int32(0)), tx


def shard_batch(batch: GARBatch, labels: jnp.ndarray, mesh: Mesh):
    """Place a host batch onto the mesh (batch axis over data+fsdp).

    Single-process: a plain global device_put. Multi-host (a real pod):
    each process passes only ITS batch rows — local shards assemble into the
    global array via `jax.make_array_from_process_local_data`, the pattern
    torchrun+DistributedSampler covered in the reference (tools/dist.sh,
    DistSamplerSeedHook) — no cross-host batch gather ever happens.
    """
    label_sharding = NamedSharding(mesh, P(("data", "fsdp"), None))
    shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), batch_pspecs(batch)
    )
    if jax.process_count() > 1:
        import numpy as np

        def put(x, sh):
            return jax.make_array_from_process_local_data(sh, np.asarray(x))

        batch = jax.tree_util.tree_map(put, batch, shardings)
        labels = put(labels, label_sharding)
        return batch, labels
    batch = jax.tree_util.tree_map(jax.device_put, batch, shardings)
    labels = jax.device_put(labels, label_sharding)
    return batch, labels


def _train_step_fn(
    cfg: GARConfig,
    tx: optax.GradientTransformation,
    *,
    mask_compat: bool,
    use_flash: Optional[bool],
    mesh: Optional[Mesh],
    pipe_schedule: str = "gpipe",
    ce_chunk: int = 1024,
    vit_remat_group: int = 1,
):
    use_1f1b = pipe_schedule == "1f1b" and _pipe_size(mesh) > 1
    if pipe_schedule not in ("gpipe", "1f1b"):
        raise ValueError(f"unknown pipe_schedule {pipe_schedule!r}")

    def step_fn(state: TrainState, batch: GARBatch, labels: jnp.ndarray):
        if use_1f1b:
            loss, grads = loss_and_grads_1f1b(
                state.params, cfg, batch, labels, mask_compat=mask_compat,
                use_flash=use_flash, mesh=mesh,
            )
        else:
            loss, grads = jax.value_and_grad(
                lambda p: loss_fn(
                    p, cfg, batch, labels, mask_compat=mask_compat,
                    use_flash=use_flash, mesh=mesh, ce_chunk=ce_chunk,
                    vit_remat_group=vit_remat_group,
                )
            )(state.params)
        if mesh is not None:
            # Pin each gradient to its param's sharding AT the grad's
            # definition: GSPMD then reduce-scatters every fsdp grad as the
            # backward produces it (ZeRO-2 grad sharding) and each full-size
            # grad dies immediately. Without the pin the solver may keep the
            # whole unsharded grad tree live into the optimizer — measured
            # +20 GiB/device peak on the GAR-8B fsdp=8 AOT accounting
            # (docs/GAR8B_MEMORY.md).
            from ..parallel.sharding import param_shardings

            grads = jax.tree_util.tree_map(
                jax.lax.with_sharding_constraint,
                grads,
                param_shardings(grads, mesh),
            )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        return (
            TrainState(params=params, opt_state=opt_state, step=state.step + 1),
            metrics,
        )

    return step_fn


def make_train_step(
    cfg: GARConfig,
    tx: optax.GradientTransformation,
    *,
    mask_compat: bool = True,
    use_flash: Optional[bool] = None,
    donate: bool = True,
    mesh: Optional[Mesh] = None,
    pipe_schedule: str = "gpipe",
):
    """mesh: pass the active Mesh to enable sequence parallelism when its
    'seq' axis > 1 (threaded into llama_prefill's Ulysses/ring dispatch).
    pipe_schedule: "gpipe" | "1f1b" — see make_packed_train_step."""
    step_fn = _train_step_fn(cfg, tx, mask_compat=mask_compat,
                             use_flash=use_flash, mesh=mesh,
                             pipe_schedule=pipe_schedule)
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_train_loop(
    cfg: GARConfig,
    tx: optax.GradientTransformation,
    n_steps: int,
    *,
    mask_compat: bool = True,
    use_flash: Optional[bool] = None,
    donate: bool = True,
    mesh: Optional[Mesh] = None,
    ce_chunk: int = 1024,
    vit_remat_group: int = 1,
):
    """`n_steps` train steps inside ONE jit (`lax.scan` over the step body):
    a single dispatch and a single device->host fetch for the whole window.

    Two reasons this exists:
      * honest timing on relayed/remote device transports that charge per
        FETCH and replay the un-materialized chain (docs/PERF_NOTES.md
        round-2 notes) — bench.py's train line times this, not a Python
        loop of steps;
      * the lowest-overhead production inner loop — zero per-step host
        round-trips, exactly the XLA-native analog of the reference's
        mmengine IterBasedTrainLoop batching host work out of the hot path.

    The same (batch, labels) feed every step of the window (a benchmark
    harness; the real trainer re-invokes per data batch). Returns
    (final_state, losses[n_steps])."""
    step_fn = _train_step_fn(cfg, tx, mask_compat=mask_compat,
                             use_flash=use_flash, mesh=mesh,
                             ce_chunk=ce_chunk,
                             vit_remat_group=vit_remat_group)

    def loop_fn(state: TrainState, batch: GARBatch, labels: jnp.ndarray):
        def body(s, _):
            s, metrics = step_fn(s, batch, labels)
            return s, metrics["loss"]

        state, losses = jax.lax.scan(body, state, None, length=n_steps)
        return state, losses

    return jax.jit(loop_fn, donate_argnums=(0,) if donate else ())
