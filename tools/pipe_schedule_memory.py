"""GPipe vs 1F1B: per-device memory on the REAL TPU compiler.

AOT-lowers the packed text-only GAR-1B train step (the decoder is the
pipelined component) on a deviceless v5e pipe=4 topology under both
schedules and prints XLA CompiledMemoryStats — the compiler's own
accounting of the schedule's working set. This is the hardware evidence
for the O(n_micro)-vs-O(stages) activation claim in parallel/pipeline.py;
run from the repo root:

    python -m tools.pipe_schedule_memory [--rows 4 8] [--seq 4096]

Expect GPipe's temp bytes to GROW with n_micro (jax.grad through the
schedule saves every tick's carry, and n_micro is exactly the knob you
raise to shrink the bubble) while 1F1B's stay ~flat (ring of P saved
stage inputs). The reference has no counterpart — it never pipelines
(vLLM judge flag only, evaluation/DLC-Bench/serve_judge.sh:7).
"""

import argparse
import sys

from grasp_any_region_tpu.core.config import gar_1b
from grasp_any_region_tpu.core.mesh import MeshSpec
from grasp_any_region_tpu.utils.aot import (
    lower_packed_train_step, memory_report, v5e_mesh,
)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--rows", type=int, nargs="+", default=[4, 8],
                   help="packed rows = n_micro (dp=1, 1 row per microbatch)")
    p.add_argument("--seq", type=int, default=4096)
    p.add_argument("--pipe", type=int, default=4)
    args = p.parse_args(argv)

    cfg = gar_1b()
    mesh = v5e_mesh(MeshSpec(pipe=args.pipe))
    print(f"[pipe-mem] gar_1b packed {args.seq}-token rows, pipe={args.pipe},"
          f" v5e topology (shape-only AOT)", file=sys.stderr)
    rows_out = []
    for rows in args.rows:
        for sched in ("gpipe", "1f1b"):
            compiled = lower_packed_train_step(
                cfg, mesh, rows=rows, seq_len=args.seq, pipe_schedule=sched,
            )
            m = memory_report(compiled)
            rows_out.append((rows, sched, m))
            print(
                f"[pipe-mem] M={rows} {sched:>5}: temps "
                f"{m['temp_bytes']/2**30:.2f} GiB, args "
                f"{m['argument_bytes']/2**30:.2f} GiB, peak "
                f"{m['peak_gib']:.2f} GiB (fits_v5e={m['fits_v5e']})",
                file=sys.stderr,
            )
    return rows_out


if __name__ == "__main__":
    main()
