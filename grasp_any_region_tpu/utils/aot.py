"""Shape-only AOT lowering + per-device memory accounting.

Proves multi-chip feasibility of configs larger than the available hardware
(GAR-8B on a v5e-8) WITHOUT materializing a single weight: params are
`jax.eval_shape` trees, `jit.lower` accepts ShapeDtypeStructs with attached
shardings, and XLA's CompiledMemoryStats reports the per-device argument /
temp / output bytes of the partitioned executable. This answers the
reference's deployment question — its serving stack exposes
tensor-parallel-size / pipeline-parallel-size flags
(evaluation/DLC-Bench/serve_judge.sh:6-7, vLLM) and sizes memory dynamically
at engine start; here the same accounting is a compile-time artifact that
runs on an 8-device virtual CPU mesh (SURVEY.md §4 test strategy).

Used by tests/test_gar8b_aot.py (assertions) and tools/gar8b_memory.py
(the docs/GAR8B_MEMORY.md table).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import GARConfig
from ..core.platform import force_compile_target
from ..parallel.sharding import batch_pspecs, param_shardings, sanitize_spec

V5E_HBM_BYTES = 16 * 1024**3  # 16 GiB per v5e chip


def v5e_mesh(spec) -> Mesh:
    """Mesh over a DEVICELESS v5e-8 (2x4) topology (jax.experimental
    .topologies): AOT compiles run the real TPU backend — Mosaic kernels,
    TPU layouts/padding, and the TPU scheduler's loop-aware buffer
    assignment — so CompiledMemoryStats are the actual per-chip HBM
    numbers, not a CPU-backend proxy (XLA:CPU hoists fsdp all-gathers out
    of the layer scan and over-reports train temps ~5x: 46.6 GiB CPU vs
    the TPU numbers in docs/GAR8B_MEMORY.md).

    spec: a core.mesh.MeshSpec (size must divide 8).
    """
    import numpy as np
    from jax.experimental import topologies

    from ..core.mesh import AXES

    topo = topologies.get_topology_desc("v5e:2x4", platform="tpu")
    devs = np.array(topo.devices)
    assert spec.size <= devs.size and devs.size % spec.size == 0, spec
    return Mesh(devs[: spec.size].reshape(spec.axis_sizes()), AXES)


def shaped(tree: Any, shardings: Any) -> Any:
    """Attach shardings to an eval_shape tree (ShapeDtypeStructs)."""
    return jax.tree_util.tree_map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        tree,
        shardings,
    )


def shaped_params(cfg: GARConfig, dtype=jnp.bfloat16) -> Any:
    from ..models import init_gar_params

    return jax.eval_shape(
        lambda k: init_gar_params(k, cfg, dtype=dtype), jax.random.PRNGKey(0)
    )


def memory_report(compiled) -> dict:
    """Per-device bytes of a partitioned executable.

    With SPMD partitioning the executable is per-device, so argument/temp
    sizes are already per-device. Peak live bytes <= arguments + temps +
    (outputs - aliased): donated inputs alias outputs and are not counted
    twice.
    """
    m = compiled.memory_analysis()
    args = int(m.argument_size_in_bytes)
    temp = int(m.temp_size_in_bytes)
    out = int(m.output_size_in_bytes)
    alias = int(m.alias_size_in_bytes)
    peak = args + temp + max(0, out - alias)
    return {
        "argument_bytes": args,
        "temp_bytes": temp,
        "output_bytes": out,
        "alias_bytes": alias,
        "peak_bytes": peak,
        "peak_gib": peak / 1024**3,
        "fits_v5e": peak < V5E_HBM_BYTES,
    }


def _annotate(shape_tree: Any, spec_tree: Any, mesh: Mesh) -> Any:
    return jax.tree_util.tree_map(
        lambda s, sp: jax.ShapeDtypeStruct(
            s.shape, s.dtype,
            sharding=NamedSharding(mesh, sanitize_spec(sp, s.shape, mesh)),
        ),
        shape_tree,
        spec_tree,
    )


def _shaped_batch(cfg: GARConfig, mesh: Mesh, batch: int, grid=(2, 2)):
    from ..data.synthetic import synthetic_batch

    b, labels, plens = synthetic_batch(cfg, batch=batch, grid=grid, regions=1, seed=0)
    sb = _annotate(
        jax.tree_util.tree_map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), b),
        batch_pspecs(b),
        mesh,
    )
    ls = _annotate(
        jax.ShapeDtypeStruct(labels.shape, labels.dtype),
        P(("data", "fsdp"), None),
        mesh,
    )
    pl = _annotate(
        jax.ShapeDtypeStruct(plens.shape, plens.dtype), P(("data", "fsdp")), mesh
    )
    return sb, ls, pl


def lower_prefill(cfg: GARConfig, mesh: Mesh, *, batch: int = 1, grid=(2, 2)):
    """AOT-compile the full multimodal prefill (ViT + projector + replay +
    decoder) + last-token logits, params sharded per parallel/sharding.py."""
    from ..models.gar import gar_prefill
    from ..models.llama import lm_logits

    pshapes = shaped_params(cfg, jnp.bfloat16)
    pshard = shaped(pshapes, param_shardings(pshapes, mesh))
    sb, _, pl = _shaped_batch(cfg, mesh, batch, grid)

    def fn(params, b, prompt_lens):
        # use_flash=None: mha dispatches per the MESH's device platform —
        # the v5e topology lowering takes the shard_map'd Pallas kernels
        # (the deployment config); CPU meshes take the XLA reference path
        hidden, _ = gar_prefill(params, cfg, b, mask_compat=False,
                                use_flash=None, mesh=mesh)
        last = hidden[jnp.arange(hidden.shape[0]), prompt_lens - 1]
        return lm_logits(params["llm"], cfg.text, last,
                         valid_vocab=cfg.extended_vocab_size)

    with mesh, force_compile_target(mesh.devices.flat[0].platform):
        return jax.jit(fn).lower(pshard, sb, pl).compile()


def lower_decode_step(cfg: GARConfig, mesh: Mesh, *, slots: int = 8,
                      s_max: int = 4096):
    """One decode token across `slots` sequences with an s_max KV cache.

    The cache is kv-head-sharded over 'tensor' (models/generate.py:115);
    decode under a mesh uses the plain-XLA path (use_kernel=False)."""
    from ..models.llama import KVCache, llama_decode_step

    pshapes = shaped_params(cfg, jnp.bfloat16)
    pshard = shaped(pshapes, param_shardings(pshapes, mesh))
    t = cfg.text
    kv_shape = (t.num_layers, slots, t.num_kv_heads, s_max, t.head_dim)
    kv = _annotate(
        jax.ShapeDtypeStruct(kv_shape, jnp.bfloat16),
        P(None, ("data", "fsdp"), "tensor", None, None),
        mesh,
    )
    cache = KVCache(
        k=kv,
        v=kv,
        prompt_lens=_annotate(
            jax.ShapeDtypeStruct((slots,), jnp.int32), P(("data", "fsdp")), mesh
        ),
        write_pos=_annotate(jax.ShapeDtypeStruct((), jnp.int32), P(), mesh),
    )
    embeds = _annotate(
        jax.ShapeDtypeStruct((slots, 1, t.hidden_size), jnp.bfloat16),
        P(("data", "fsdp"), None, None),
        mesh,
    )

    def fn(llm, e, c):
        return llama_decode_step(llm, t, e, c, prompt_pad=s_max // 2,
                                 use_kernel=False)

    with mesh, force_compile_target(mesh.devices.flat[0].platform):
        return (
            jax.jit(fn, donate_argnums=(2,))
            .lower(pshard["llm"], embeds, cache)
            .compile()
        )


def lower_train_step(cfg: GARConfig, mesh: Mesh, *, batch: int, grid=(2, 2),
                     master_dtype=jnp.float32):
    """Full train step (value_and_grad + AdamW update), params/moments
    sharded per parallel/sharding.py over the mesh's fsdp/tensor axes.
    Moment shardings come from the same opt_state_shardings pin the real
    trainer uses (train/step.py) — the accounting here is the deployment's."""
    from ..train.optimizer import OptimizerConfig, make_optimizer
    from ..train.step import TrainState, make_train_step, opt_state_shardings

    pshapes = shaped_params(cfg, master_dtype)
    opt_cfg = OptimizerConfig(lr=1e-4, total_steps=100, accumulation=1)
    tx = make_optimizer(pshapes, opt_cfg)
    pshard = shaped(pshapes, param_shardings(pshapes, mesh))
    oshapes = jax.eval_shape(tx.init, pshapes)
    oshard = shaped(oshapes, opt_state_shardings(tx, pshapes, mesh))
    state_shaped = TrainState(
        params=pshard,
        opt_state=oshard,
        step=_annotate(jax.ShapeDtypeStruct((), jnp.int32), P(), mesh),
    )
    sb, ls, _ = _shaped_batch(cfg, mesh, batch, grid)
    step = make_train_step(cfg, tx, mask_compat=False, use_flash=None,
                           donate=True, mesh=mesh)
    with mesh, force_compile_target(mesh.devices.flat[0].platform):
        return step.lower(state_shaped, sb, ls).compile()


def lower_packed_train_step(cfg: GARConfig, mesh: Mesh, *, rows: int,
                            seq_len: int, pipe_schedule: str = "gpipe",
                            master_dtype=jnp.bfloat16):
    """AOT-compile the packed text-only train step on a pipe mesh.

    The decoder is the pipelined component (vision never pipelines), so
    this is the surface where the GPipe-vs-1F1B activation-memory claim
    (parallel/pipeline.py docstring) is measurable on the REAL TPU
    compiler: same model, same rows, only the schedule changes —
    CompiledMemoryStats' temp bytes are the schedule's working set.
    Used by tools/pipe_schedule_memory.py and tests/test_gar8b_aot_quick.py.
    """
    from ..data.builders import PackedTextBatch
    from ..train.optimizer import OptimizerConfig, make_optimizer
    from ..train.step import (
        TrainState, make_packed_train_step, opt_state_shardings,
    )

    pshapes = shaped_params(cfg, master_dtype)
    opt_cfg = OptimizerConfig(lr=1e-4, total_steps=100, accumulation=1)
    tx = make_optimizer(pshapes, opt_cfg)
    pshard = shaped(pshapes, param_shardings(pshapes, mesh))
    oshapes = jax.eval_shape(tx.init, pshapes)
    oshard = shaped(oshapes, opt_state_shardings(tx, pshapes, mesh))
    state_shaped = TrainState(
        params=pshard,
        opt_state=oshard,
        step=_annotate(jax.ShapeDtypeStruct((), jnp.int32), P(), mesh),
    )
    row_i32 = jax.ShapeDtypeStruct((rows, seq_len), jnp.int32)
    dp = tuple(a for a in ("data", "fsdp") if a in mesh.axis_names
               and mesh.shape[a] > 1) or None
    packed_shaped = PackedTextBatch(
        input_ids=_annotate(row_i32, P(dp, None), mesh),
        positions=_annotate(row_i32, P(dp, None), mesh),
        segment_ids=_annotate(row_i32, P(dp, None), mesh),
        labels=_annotate(row_i32, P(dp, None), mesh),
    )
    step = make_packed_train_step(cfg, tx, use_flash=None, donate=True,
                                  mesh=mesh, pipe_schedule=pipe_schedule)
    with mesh, force_compile_target(mesh.devices.flat[0].platform):
        return step.lower(state_shaped, packed_shaped).compile()
