"""CLI demo: video region QA — sampled frames + per-frame region masks.

Zero-shot video region understanding (the capability behind GAR-8B's
VideoRefer-BenchQ result; model path modeling_perception_lm.py:765-852).
Frames are given as an ordered list of images; masks annotate the tracked
region in (a subset of) those frames.

Usage:
  python -m grasp_any_region_tpu.cli.gar_video \
      --frame f0.png --frame f1.png --frame f2.png \
      --mask 0:m0.png --mask 2:m2.png \
      --question "What is the masked object doing?"

  # or straight from a video container (uniform temporal sampling):
  python -m grasp_any_region_tpu.cli.gar_video \
      --video clip.mp4 --num-frames 8 --mask 0:m0.png \
      --question "What is the masked object doing?"

With --video, --mask frame indices refer to the SAMPLED frame positions
(0..num_frames-1); the chosen source indices are printed.
"""

from __future__ import annotations

import argparse
import sys

from .runtime import GARRuntime, load_image, load_mask
from ..data.builders import VideoRegionSample, build_video_batch


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model-path", default=None)
    p.add_argument("--preset", default="gar_8b")
    p.add_argument("--frame", action="append",
                   help="ordered frame image paths (alternative to --video)")
    p.add_argument("--video", default=None,
                   help="video file; frames sampled uniformly (data/video.py)")
    p.add_argument("--num-frames", type=int, default=8,
                   help="frames to sample with --video")
    p.add_argument("--mask", action="append", required=True,
                   help="frame_idx:path pairs, e.g. 0:mask0.png")
    p.add_argument("--question", default="Describe this masked region in detail.")
    p.add_argument("--max-new-tokens", type=int, default=1024)
    p.add_argument("--random-init", action="store_true")
    args = p.parse_args(argv)

    if bool(args.frame) == bool(args.video):
        p.error("give exactly one of --frame... or --video")
    if args.video:
        from ..data.video import read_video_frames

        frames, src_idx, fps = read_video_frames(args.video, args.num_frames)
        print(
            f"[video] sampled {len(frames)} frames {src_idx} "
            f"(fps {fps:.1f})", file=sys.stderr,
        )
    else:
        frames = [load_image(f) for f in args.frame]
    masks = {}
    for spec in args.mask:
        idx, _, path = spec.partition(":")
        if not path:
            p.error(f"--mask expects frame_idx:path, got {spec!r}")
        masks[int(idx)] = load_mask(path)

    rt = GARRuntime.load(args.model_path, args.preset, args.random_init)
    sample = VideoRegionSample(frames=frames, masks=masks, question=args.question)
    batch, plens = build_video_batch(rt.cfg, rt.tok, rt.proc, [sample])

    import numpy as np
    from ..models.generate import generate

    out = generate(
        rt.params, rt.cfg, batch, plens,
        max_new_tokens=args.max_new_tokens, eot_id=rt.tok.eot_id,
        video_mode=True,
    )
    n = int(out.num_generated[0])
    ids = np.asarray(out.tokens)[0, :n].tolist()
    if ids and ids[-1] == rt.tok.eot_id:
        ids = ids[:-1]
    print(rt.tok.decode(ids))


if __name__ == "__main__":
    main()
