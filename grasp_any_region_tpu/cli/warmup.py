"""Pre-compile the interactive demo shapes into the persistent XLA cache.

The B=1 cold start is the worst first impression this stack can make: the
first caption of a fresh process pays the full prefill+decode compile
(~220 s for GAR-1B at the 17-tile bucket — BENCH r4), while every later
caption of the same shape costs ~1.2 s. Compiles persist across PROCESSES
via the on-disk XLA compilation cache (core/cache.py, ~/.cache/gar_tpu_xla
— every CLI entry point enables it through GARRuntime.load), so one warmup
run makes every subsequent demo/CLI invocation on the machine start fast.

    python -m grasp_any_region_tpu.cli.warmup --preset gar_1b

compiles the standard demo shapes: each requested tile grid x each
max-new-tokens value (prompt lengths bucket to 128 tokens and the KV length
to 512, data/builders.py:30 / models/generate.py:92, so any image with the
same grid and any instruction under ~100 tokens reuses these executables).
Weight VALUES are irrelevant to the cache key (it hashes the compiled
program, not the constants), so warmup runs on random init and the
executables serve real checkpoints of the same config.

Reference analog: the reference has no equivalent (its HF stack re-traces
per process and relies on eager CUDA); this is the TPU-native answer to its
demo startup latency (demo/gar_with_mask.py).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def _grid(s: str):
    w, h = s.lower().split("x")
    return int(w), int(h)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="gar_1b")
    p.add_argument("--model-path", default=None,
                   help="optional; shapes (not values) key the cache, so "
                        "random init warms real checkpoints too")
    p.add_argument("--grids", default="4x4",
                   help="comma-separated tile grids to compile (e.g. "
                        "'4x4,2x2,1x1'); 4x4 is the 17-tile demo bucket")
    p.add_argument("--max-new-tokens", default="256,1024",
                   help="comma-separated decode lengths to compile")
    p.add_argument("--int8-serving", action="store_true",
                   help="also warm the serving-only int8 weight layout")
    args = p.parse_args(argv)

    from ..data.builders import RegionSample
    from .runtime import GARRuntime

    rt = GARRuntime.load(args.model_path, args.preset, random_init=True,
                         int8_serving=args.int8_serving)
    grids = [_grid(g) for g in args.grids.split(",") if g]
    lens = [int(x) for x in args.max_new_tokens.split(",") if x]

    tile = 448
    total0 = time.time()
    for ncw, nch in grids:
        # an exactly grid-shaped image selects (ncw, nch) in the processor's
        # canvas fit (data/image_processor.select_tile_grid)
        img = np.zeros((nch * tile, ncw * tile, 3), np.uint8)
        img[::7, ::7] = 255
        mask = np.zeros(img.shape[:2], np.uint8)
        mask[tile // 4 : tile, tile // 4 : tile] = 1
        sample = RegionSample(image=img, masks={1: mask},
                              instruction="Describe the masked region in detail.")
        for n in lens:
            t0 = time.time()
            rt.caption([sample], max_new_tokens=n)
            print(
                f"[warmup] grid {ncw}x{nch} max_new={n}: compiled+ran in "
                f"{time.time()-t0:.1f}s",
                file=sys.stderr,
            )
    print(
        f"[warmup] done in {time.time()-total0:.1f}s — subsequent CLI "
        f"invocations of these shapes skip compilation (persistent cache: "
        f"~/.cache/gar_tpu_xla)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
