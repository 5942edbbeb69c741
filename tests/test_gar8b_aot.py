"""GAR-8B feasibility without 8B hardware (VERDICT r3 Next #2).

AOT-lowers the FULL-SIZE gar_8b() config — PE-Core-G/14 vision tower +
Llama-3.1-8B-shaped decoder (core/config.py) — sharded over a DEVICELESS
v5e-8 (2x4) topology, compiled by the real TPU backend (Mosaic kernels, TPU
layouts, loop-aware buffer assignment), and asserts XLA's per-device memory
accounting fits a 16 GiB v5e chip. Shape-only: no weights are ever
materialized (utils/aot.py).

Falls back to the 8-virtual-CPU mesh when the TPU compiler is unavailable
(e.g. another process holds the libtpu lockfile) — the fit assertions are
then skipped for the train step, because XLA:CPU hoists fsdp all-gathers
out of the layer scan and over-reports train temps ~5x (46.6 GiB CPU vs
12-16 GiB TPU for the same program).

Reference analog: the serving stack's tensor-parallel flags
(evaluation/DLC-Bench/serve_judge.sh:6-7); the reference answers "does it
fit" by OOM-ing at runtime, we answer it at compile time.

tools/gar8b_memory.py renders the full sweep into docs/GAR8B_MEMORY.md.

EXPECTED RUNTIME (measured 2026-08-20 on this machine, real TPU compiler,
run alone): ~9 min total — train_fsdp4_tp2 ~475 s (the 47-block remat'd
ViT + 32-layer decoder backward is one huge module), prefill_tp4 ~50 s,
decode_tp4 ~7 s, weight_bytes_math <1 s. Budget accordingly before
re-running; the FAST-lane regression canary for this surface is
tests/test_gar8b_aot_quick.py (decode-step lowering, ~10 s, not slow-
marked), which catches sharding-rule breaks at production dims without
paying for the train compile.
"""

import pytest

import jax
import jax.numpy as jnp

from grasp_any_region_tpu.core.config import gar_8b
from grasp_any_region_tpu.core.mesh import MeshSpec, make_mesh
from grasp_any_region_tpu.utils.aot import (
    V5E_HBM_BYTES,
    lower_decode_step,
    lower_prefill,
    lower_train_step,
    memory_report,
    v5e_mesh,
)

pytestmark = pytest.mark.slow

GIB = 1024**3


def _mesh(tensor: int, fsdp: int = 1, data: int = 1):
    """v5e:2x4 topology mesh when the TPU compiler is reachable, CPU mesh
    otherwise. Returns (mesh, on_tpu)."""
    spec = MeshSpec(data=data, fsdp=fsdp, tensor=tensor, seq=1)
    try:
        return v5e_mesh(spec), True
    except Exception:
        return make_mesh(spec), False


def test_gar8b_prefill_tp4_fits_v5e():
    """bf16 8B weights are ~16 GiB total; TP=4 leaves ~4 GiB/chip + prefill
    activations at the gar_8b tile budget (8 tiles + thumb, grid 2x2 here)."""
    cfg = gar_8b()
    mesh, _ = _mesh(tensor=4, fsdp=2)
    compiled = lower_prefill(cfg, mesh, batch=1, grid=(2, 2))
    rep = memory_report(compiled)
    assert rep["fits_v5e"], f"TP=4 prefill peak {rep['peak_gib']:.2f} GiB"
    # weights actually sharded (not replicated): per-device args must be a
    # fraction of the full ~17.5 GiB bf16 param tree
    assert rep["argument_bytes"] < 6 * GIB, rep


def test_gar8b_decode_tp4_fits_v5e():
    cfg = gar_8b()
    mesh, _ = _mesh(tensor=4, fsdp=2)
    compiled = lower_decode_step(cfg, mesh, slots=8, s_max=4096)
    rep = memory_report(compiled)
    assert rep["fits_v5e"], f"TP=4 decode peak {rep['peak_gib']:.2f} GiB"


def test_gar8b_train_fsdp4_tp2_fits_v5e():
    """Training an 8B on a v5e-8: bf16 params + bf16 Adam moments, fsdp=4 x
    tensor=2 (tensor sharding splits the per-chip activation temps that push
    pure fsdp=8 at B=8 marginally over — the full sweep is in
    docs/GAR8B_MEMORY.md)."""
    cfg = gar_8b()
    mesh, on_tpu = _mesh(tensor=2, fsdp=4)
    compiled = lower_train_step(cfg, mesh, batch=4, grid=(2, 2),
                                master_dtype=jnp.bfloat16)
    rep = memory_report(compiled)
    if not on_tpu:
        pytest.skip(
            f"CPU-backend proxy over-reports train temps (peak "
            f"{rep['peak_gib']:.2f} GiB) — TPU topology unavailable"
        )
    assert rep["fits_v5e"], f"fsdp=4xtp=2 train peak {rep['peak_gib']:.2f} GiB"


def test_gar8b_weight_bytes_math():
    """Analytic cross-check: the eval_shape tree's total bf16 bytes match the
    8B scale (decoder ~8.0B params + PE-Core-G ~1.9B)."""
    from grasp_any_region_tpu.utils.aot import shaped_params

    shapes = shaped_params(gar_8b(), jnp.bfloat16)
    n_params = sum(
        int(jnp.prod(jnp.array(s.shape))) for s in jax.tree_util.tree_leaves(shapes)
    )
    assert 9.0e9 < n_params < 12.0e9, n_params
    total_bytes = 2 * n_params
    # TP=8 serving: weights alone must leave headroom on every chip
    assert total_bytes / 8 < 4 * GIB
