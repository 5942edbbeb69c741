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


def _attn_local(q, k, v, *, causal, use_flash, right_padded):
    return mha(q, k, v, causal=causal, use_flash=use_flash,
               right_padded=right_padded)


def ulysses_attention(
    q: jnp.ndarray,  # (B, S/P, H, D) — sequence-sharded over 'seq'
    k: jnp.ndarray,  # (B, S/P, K, D)
    v: jnp.ndarray,
    mesh: Mesh,
    *,
    causal: bool = True,
    use_flash: Optional[bool] = None,
    right_padded: bool = True,
    axis: str = "seq",
) -> jnp.ndarray:
    """Sequence-parallel attention. Call under shard_map-compatible sharded
    inputs; returns output sharded like q."""
    h = q.shape[2]
    kh = k.shape[2]
    p = mesh.shape[axis]
    assert h % p == 0 and kh % p == 0, (
        f"heads ({h} q / {kh} kv) must divide seq-axis size {p}"
    )

    def inner(q, k, v):
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
        out = _attn_local(
            qh, khh, vh, causal=causal, use_flash=use_flash,
            right_padded=right_padded,
        )
        return head2seq(out)

    from jax.experimental.shard_map import shard_map

    spec = P(None, axis, None, None)
    fn = shard_map(
        inner, mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_rep=False,
    )
    return fn(q, k, v)
