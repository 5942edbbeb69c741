"""Device mesh / topology setup.

Replaces the reference's NCCL + torchrun process-group world
(`tools/dist.sh:26-31`, `configs/gar_1b.py:190-197`, and the
`init_process_group` calls in every demo) with a `jax.sharding.Mesh` over
named axes:

  data   — data parallel (DCN between slices, ICI within)
  fsdp   — ZeRO-3-style parameter/optimizer sharding (reference used
           DeepSpeed ZeRO-2, tools/dist.sh:19)
  tensor — tensor parallel over ICI (reference only exposes TP through the
           vLLM judge flags, serve_judge.sh:6; here it is first-class)
  seq    — sequence parallel (the reference's xtuner Ulysses hooks,
           custom_collect_fn.py:89-94)

XLA inserts the collectives; there is no explicit process-group management.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

AXES = ("data", "fsdp", "tensor", "seq", "pipe")


@dataclass(frozen=True)
class MeshSpec:
    data: int = 1
    fsdp: int = 1
    tensor: int = 1
    seq: int = 1
    # pipeline parallelism: decoder layers partitioned over stages
    # (parallel/pipeline.py). Composes with data/fsdp as batch parallelism;
    # tensor/seq must stay 1 when pipe > 1 (the stage body runs dense
    # per-stage matmuls — enforced by train.trainer/step).
    pipe: int = 1

    @property
    def size(self) -> int:
        return self.data * self.fsdp * self.tensor * self.seq * self.pipe

    def axis_sizes(self) -> tuple[int, int, int, int, int]:
        return (self.data, self.fsdp, self.tensor, self.seq, self.pipe)


def make_mesh(spec: Optional[MeshSpec] = None, devices: Optional[Sequence] = None) -> Mesh:
    """Build a Mesh with axes (data, fsdp, tensor, seq).

    Axis order places `tensor` and `seq` innermost so they map onto
    contiguous ICI neighbors; `data` is outermost (DCN-friendly for
    multi-slice deployments).
    """
    if devices is None:
        devices = jax.devices()
    if spec is None:
        spec = MeshSpec(fsdp=len(devices))
    if spec.size != len(devices):
        raise ValueError(
            f"mesh spec {spec} needs {spec.size} devices, got {len(devices)}"
        )
    arr = np.asarray(devices).reshape(spec.axis_sizes())
    return Mesh(arr, AXES)


def single_device_mesh() -> Mesh:
    return make_mesh(MeshSpec(), devices=jax.devices()[:1])


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host init (replaces torchrun rendezvous, tools/dist.sh:26-31).

    On Cloud TPU pods arguments are auto-detected from the metadata server;
    explicit args support manual clusters.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
