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
  duplicated.
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

Compose with data parallelism by adding the usual ``data`` axis to the
same mesh and sharding the batch over it; tensor/sequence axes remain
the better fit for <=8B (SURVEY §2.3) so this module intentionally stays
orthogonal to parallel/sharding.py's rules.
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
) -> jnp.ndarray:
    """Decoder forward, layer-partitioned over the mesh's 'pipe' axis.

    Numerically identical to llama_prefill's hidden states (same per-layer
    body; tests/test_pipeline.py asserts parity fwd+bwd). Returns hidden
    (B, S, D); the final rms_norm/lm head stay with the caller, as in
    llama_prefill. KV stacks are not returned — the pipelined path is a
    training-forward surface; inference keeps the TP/fused-decode path.
    """
    n_stages = mesh.shape["pipe"]
    B, S, D = inputs_embeds.shape
    if n_micro is None:
        n_micro = B
    if B % n_micro != 0:
        raise ValueError(f"batch {B} must divide into n_micro={n_micro}")
    if cfg.num_layers % n_stages != 0:
        raise ValueError(
            f"num_layers {cfg.num_layers} must divide pipe axis {n_stages}"
        )
    M, mb = n_micro, B // n_micro
    eps = cfg.rms_norm_eps
    dh = cfg.head_dim

    cos, sin = rope_cos_sin(positions, llama_inv_freq(cfg))  # (B, S, Dh)
    embeds_mb = inputs_embeds.reshape(M, mb, S, D)
    cos_mb = cos.reshape(M, mb, S, dh)
    sin_mb = sin.reshape(M, mb, S, dh)

    def stage(blocks_local, x, cos_t, sin_t):
        # same block body as llama_prefill (models/llama.py:178), minus the
        # SP/ring branches — pipe composes with plain per-stage attention
        def body(x, bp):
            y = rms_norm(x, bp["attn_norm"], eps)
            q, k, v = _qkv(cfg, bp, y, cos_t, sin_t)
            a = mha(q, k, v, causal=True, use_flash=use_flash)
            a = _proj(bp, "wo", a.reshape(x.shape[0], x.shape[1], -1))
            x = x + a
            y = rms_norm(x, bp["mlp_norm"], eps)
            return x + _mlp(bp, y), None

        body_fn = jax.checkpoint(body) if remat else body
        x, _ = jax.lax.scan(body_fn, x, blocks_local)
        return x

    def pipelined(blocks_local, embeds, cos_r, sin_r):
        idx = jax.lax.axis_index("pipe")
        state = jnp.zeros((mb, S, D), embeds.dtype)
        outs = jnp.zeros((M, mb, S, D), embeds.dtype)

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
            x = stage(blocks_local, x, cos_t, sin_t)
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
        # results live on the last stage only; zero-mask + psum replicates
        last = idx == n_stages - 1
        return jax.lax.psum(jnp.where(last, outs, jnp.zeros_like(outs)), "pipe")

    from jax import shard_map

    fn = shard_map(
        pipelined,
        mesh=mesh,
        in_specs=(P("pipe"), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    outs = fn(params["blocks"], embeds_mb, cos_mb, sin_mb)
    return outs.reshape(B, S, D)
