"""Ring attention: context-parallel attention over the 'seq' mesh axis.

The long-context escalation path beyond Ulysses SP (parallel/ulysses.py).
Ulysses gathers the full sequence per head group, so (a) every device must
hold S x D activations for its heads and (b) the seq-axis size may not exceed
the KV head count (4 for GAR's Llama-3.2-1B decoder). Ring attention lifts
both limits: q stays sequence-sharded, and K/V shards rotate around the ring
(`jax.lax.ppermute` over ICI neighbours) while each device folds one block
per hop into a running online-softmax state (m, l, acc) — the cross-device
generalization of the FlashAttention-2 recurrence in ops/flash_attention.py.

The reference has no equivalent (its xtuner SP hooks are Ulysses-only and
dormant, custom_collect_fn.py:89-94; max_length 16384, configs/gar_1b.py:28);
this is the SURVEY.md §5 "ring attention as the long-context escalation path"
item.

Numerics: logits/softmax state in fp32, block matmuls via the MXU with fp32
accumulation — same policy as ops/attention.py. Per-block compute is one
(B*H, Sq/P, Sk/P) einsum, which XLA overlaps with the next hop's ppermute
(the collective-permute is async on TPU); with causal masking the late ring
positions do skippable work — zig-zag re-ordering is a known fix, kept out
for simplicity since causal long-context here means training, where the
wasted half is hidden behind the backward pass.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.attention import NEG_INF, repeat_kv


def ring_attention(
    q: jnp.ndarray,  # (B, S/P, H, D) — sequence-sharded over `axis`
    k: jnp.ndarray,  # (B, S/P, K, D)
    v: jnp.ndarray,
    mesh: Mesh,
    *,
    causal: bool = True,
    scale: Optional[float] = None,
    axis: str = "seq",
    batch_axes=None,  # mesh axes the batch dim shards over (e.g. ("data","fsdp"))
) -> jnp.ndarray:
    """Context-parallel attention; returns output sharded like q.

    Unlike ulysses_attention there is no head-count constraint — any H/K
    works on any ring size (GQA kv heads are repeated locally per block).
    """
    s_global, h, d = q.shape[1], q.shape[2], q.shape[3]
    kh = k.shape[2]
    assert h % kh == 0, f"q heads {h} not a multiple of kv heads {kh}"
    g = h // kh
    p = mesh.shape[axis]
    assert s_global % p == 0, f"seq len {s_global} not divisible by ring size {p}"
    s_local = s_global // p
    if scale is None:
        scale = d ** -0.5

    def inner(q, k, v):
        b = q.shape[0]  # LOCAL batch (dp-sharded when batch_axes is set)
        idx = jax.lax.axis_index(axis)
        qf = q.astype(jnp.float32) * scale
        q_pos = idx * s_local + jnp.arange(s_local)  # global q positions
        perm = [(j, (j + 1) % p) for j in range(p)]

        def step(i, carry):
            k_blk, v_blk, m, l, acc = carry
            src = (idx - i) % p  # ring hop i holds the block born on device src
            kf = repeat_kv(k_blk, g).astype(jnp.float32)
            s = jnp.einsum(
                "bqhd,bkhd->bhqk", qf, kf, preferred_element_type=jnp.float32
            )
            if causal:
                k_pos = src * s_local + jnp.arange(s_local)
                ok = q_pos[:, None] >= k_pos[None, :]  # (Sq, Sk) global causal
                s = jnp.where(ok[None, None], s, NEG_INF)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            pmat = jnp.exp(s - m_new)
            if causal:
                # a fully-masked row has s == m_new == NEG_INF -> exp(0) == 1;
                # zero those contributions explicitly
                pmat = jnp.where(ok[None, None], pmat, 0.0)
            alpha = jnp.exp(m - m_new)
            l = l * alpha + jnp.sum(pmat, axis=-1, keepdims=True)
            vf = repeat_kv(v_blk, g)
            acc = acc * alpha + jnp.einsum(
                "bhqk,bkhd->bhqd", pmat.astype(vf.dtype), vf,
                preferred_element_type=jnp.float32,
            )
            # rotate kv to the next device (last hop's rotate restores the
            # original layout, keeping k/v unmutated from the caller's view)
            k_blk = jax.lax.ppermute(k_blk, axis, perm)
            v_blk = jax.lax.ppermute(v_blk, axis, perm)
            return k_blk, v_blk, m_new, l, acc

        # initial accumulators are constants, but after one hop they carry
        # device-varying values (each shard attends its own q rows against
        # rotating kv blocks) — mark them varying so the fori_loop carry
        # type is stable under the VMA check
        vary = tuple(jax.typeof(q).vma | jax.typeof(k).vma)
        m0 = jnp.full((b, h, s_local, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((b, h, s_local, 1), jnp.float32)
        acc0 = jnp.zeros((b, h, s_local, d), jnp.float32)
        if vary:
            m0, l0, acc0 = (
                jax.lax.pcast(t, vary, to="varying") for t in (m0, l0, acc0)
            )
        *_, l, acc = jax.lax.fori_loop(0, p, step, (k, v, m0, l0, acc0))
        out = acc / jnp.maximum(l, 1e-30)
        return out.transpose(0, 2, 1, 3).astype(q.dtype)

    from jax import shard_map

    spec = P(batch_axes, axis, None, None)
    fn = shard_map(
        inner, mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)
