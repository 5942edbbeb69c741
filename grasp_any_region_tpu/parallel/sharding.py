"""Sharding rules: params + activations over the (data, fsdp, tensor, seq) mesh.

Replaces the reference's DDP + DeepSpeed ZeRO-2 (tools/dist.sh:19) and its
absent-but-implied TP (vLLM judge flags) with declarative PartitionSpecs.
GSPMD propagates the rest; collectives ride ICI.

Scheme (megatron-style TP + fsdp on the complementary matmul axis):
  decoder  wq/wk/wv (L, D, H*dh): (None, fsdp, tensor)   — heads on tensor
           wo       (L, H*dh, D): (None, tensor, fsdp)
           w_gate/up (L, D, M):   (None, fsdp, tensor)
           w_down   (L, M, D):    (None, tensor, fsdp)
           embed    (V, D):       (tensor, fsdp)          — vocab-parallel
  vision   wqkv     (L, D, 3D):   (None, fsdp, tensor)
           wo/fc2   (L, X, D):    (None, tensor, fsdp)
           fc1      (L, D, M):    (None, fsdp, tensor)
  scalars/norms/layerscale: replicated.

KV caches: (L, B, S, K, Dh) -> (None, data, None, tensor, None).
Activations: batch on ('data','fsdp') (fsdp doubles as extra DP for the
batch axis, ZeRO-style), sequence on 'seq', heads on 'tensor'.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _pspec_for(path: str, ndim: int) -> P:
    """Rule table keyed on the flattened param path."""
    # --- decoder ---
    if path.endswith("llm/embed"):
        return P("tensor", "fsdp")
    if path.endswith("llm/lm_head"):
        return P("fsdp", "tensor")
    if "llm/blocks" in path:
        name = path.rsplit("/", 1)[-1]
        if name in ("wq", "wk", "wv", "w_gate", "w_up"):
            return P(None, "fsdp", "tensor")
        if name in ("wo", "w_down"):
            return P(None, "tensor", "fsdp")
        return P(None)  # norms (L, D)
    if path.endswith("llm/final_norm"):
        return P()
    # --- vision ---
    if "vision/blocks" in path:
        name = path.rsplit("/", 1)[-1]
        if name in ("wqkv", "fc1"):
            return P(None, "fsdp", "tensor")
        if name in ("wo", "fc2"):
            return P(None, "tensor", "fsdp")
        return P(None)  # biases, norms, layerscale (L, X)
    if "patch_embed/kernel" in path:
        return P("fsdp", "tensor")
    if "vision/pos_embed" in path or "cls_token" in path or "rope_freqs" in path:
        return P()
    # --- projector ---
    if path.endswith("projector/fc1"):
        return P("fsdp", "tensor")
    if path.endswith("projector/fc2"):
        return P("tensor", "fsdp")
    # --- mask embed ---
    if "mask_embed/kernel" in path:
        return P("fsdp", "tensor")
    return P()  # replicate everything else (norm scales, small biases)


def _path_str(key_path) -> str:
    parts = []
    for k in key_path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def param_pspecs(params: Any, pipe: bool = False) -> Any:
    """Tree of PartitionSpecs matching `params`.

    pipe: partition the decoder's stacked layer dim over the 'pipe' axis
    instead of megatron TP/fsdp on the matmul dims — each pipeline stage
    holds L/P contiguous layers dense (parallel/pipeline.py runs the stage
    body as plain matmuls inside shard_map, so weight dims must be local).
    """

    def rule(kp, x):
        path = _path_str(kp)
        if pipe and "llm/blocks" in path:
            return P("pipe")
        return _pspec_for(path, getattr(x, "ndim", 0))

    return jax.tree_util.tree_map_with_path(rule, params)


def sanitize_spec(spec: P, shape, mesh: Mesh) -> P:
    """Drop mesh axes that do not evenly divide their dimension.

    Keeps sharding rules declarative while degrading gracefully on odd mesh
    factorizations (e.g. fsdp=3 over a 64-wide tiny model) — the dimension
    just replicates instead of crashing device_put.
    """
    if spec is None:
        return P()
    out = []
    for i, entry in enumerate(spec):
        if entry is None or i >= len(shape):
            out.append(None)
            continue
        axes = entry if isinstance(entry, tuple) else (entry,)
        size = 1
        for a in axes:
            size *= mesh.shape[a]
        out.append(entry if shape[i] % size == 0 else None)
    return P(*out)


def param_shardings(params: Any, mesh: Mesh) -> Any:
    pipe = "pipe" in mesh.axis_names and mesh.shape["pipe"] > 1
    specs = param_pspecs(params, pipe=pipe)
    return jax.tree_util.tree_map(
        lambda x, spec: NamedSharding(
            mesh, sanitize_spec(spec, getattr(x, "shape", ()), mesh)
        ),
        params,
        specs,
    )


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Device-put params with their shardings (host -> sharded device arrays)."""
    shardings = param_shardings(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


# Activation specs ----------------------------------------------------------

BATCH_SPEC = P(("data", "fsdp"))  # batch sharded over data+fsdp axes


def batch_pspecs(batch_tree: Any) -> Any:
    """All host-batch arrays shard on their leading (batch) axis."""
    def spec(x):
        nd = getattr(x, "ndim", 0)
        return P(("data", "fsdp"), *([None] * (nd - 1))) if nd >= 1 else P()

    return jax.tree_util.tree_map(spec, batch_tree)


def constrain_seq(x, mesh: Mesh = None):
    """Shard the sequence axis of (B, S, D) activations over 'seq'."""
    if mesh is None:
        return x
    sharding = NamedSharding(mesh, P(("data", "fsdp"), "seq", None))
    return jax.lax.with_sharding_constraint(x, sharding)
