"""Ulysses-style sequence-parallel attention over the 'seq' mesh axis.

The reference only has dormant hooks for xtuner's DeepSpeed-Ulysses SP
(collate pads the sequence to a multiple of the SP world size,
custom_collect_fn.py:89-94; dispatch_modules wires the all-to-alls). Here it
is a first-class primitive:

  inputs arrive sequence-sharded: each of the P devices on the 'seq' axis
  holds (B, S/P, H, D) of q/k/v. An all-to-all exchanges sequence shards for
  head shards -> (B, S, H/P, D), full-sequence flash attention runs locally
  per head group, and the inverse all-to-all restores sequence sharding.

Requires H % P == 0 (heads divide the seq axis) — the classic Ulysses
constraint; ring attention (parallel/ring.py) lifts it for extreme contexts.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.attention import mha


def ulysses_attention(
    q: jnp.ndarray,  # (B, S/P, H, D) — sequence-sharded over 'seq'
    k: jnp.ndarray,  # (B, S/P, K, D)
    v: jnp.ndarray,
    mesh: Mesh,
    *,
    causal: bool = True,
    segment_ids: Optional[jnp.ndarray] = None,  # (B, S) packing mask
    use_flash: Optional[bool] = None,
    right_padded: bool = True,
    axis: str = "seq",
    batch_axes=None,  # mesh axes the batch dim shards over (e.g. ("data","fsdp"))
) -> jnp.ndarray:
    """Sequence-parallel attention. Call under shard_map-compatible sharded
    inputs; returns output sharded like q.

    batch_axes: in the train step the batch axis is dp-sharded; declaring it
    here keeps shard_map from all-gathering the batch (each dp group runs its
    own independent Ulysses exchange over its 'seq' neighbours).
    segment_ids supports packed rows: shards are re-gathered to the full
    (B, S) ids inside the exchange (ints — negligible traffic)."""
    h = q.shape[2]
    kh = k.shape[2]
    p = mesh.shape[axis]
    assert h % p == 0 and kh % p == 0, (
        f"heads ({h} q / {kh} kv) must divide seq-axis size {p}"
    )

    def inner(q, k, v, seg):
        # all_to_all: split head axis, gather sequence axis
        # in: (B, S/P, H, D) -> out: (B, S, H/P, D)
        def seq2head(x):
            return jax.lax.all_to_all(
                x, axis, split_axis=2, concat_axis=1, tiled=True
            )

        def head2seq(x):
            return jax.lax.all_to_all(
                x, axis, split_axis=1, concat_axis=2, tiled=True
            )

        qh = seq2head(q)
        khh = seq2head(k)
        vh = seq2head(v)
        seg_full = None
        if seg is not None:
            seg_full = jax.lax.all_gather(seg, axis, axis=1, tiled=True)
        out = mha(
            qh, khh, vh, causal=causal, segment_ids=seg_full,
            use_flash=use_flash, right_padded=right_padded,
        )
        return head2seq(out)

    from jax import shard_map

    # check_vma on for TPU lowerings; the Pallas INTERPRETER (non-TPU test
    # meshes) inlines the flash kernel's ref-carrying fori_loop into the
    # shard_map trace where the carry loses its vma (known JAX limitation;
    # ops/attention._flash_sharded has the full note)
    vma_ok = mesh.devices.flat[0].platform == "tpu"
    spec = P(batch_axes, axis, None, None)
    seg_spec = P(batch_axes, axis)
    if segment_ids is None:
        fn = shard_map(
            lambda q, k, v: inner(q, k, v, None), mesh=mesh,
            in_specs=(spec, spec, spec),
            out_specs=spec,
            check_vma=vma_ok,
        )
        return fn(q, k, v)
    fn = shard_map(
        inner, mesh=mesh,
        in_specs=(spec, spec, spec, seg_spec),
        out_specs=spec,
        check_vma=vma_ok,
    )
    return fn(q, k, v, segment_ids)
