"""Benchmark evaluation CLI (inference + optional judging).

  python -m grasp_any_region_tpu.cli.eval garbench-vqa \
      --model-path ckpt --anno evaluation/GAR-Bench/annotations/GAR-Bench-VQA.json \
      --images evaluation/GAR-Bench/annotations/images --out out/vqa.json

Subcommands: garbench-vqa | garbench-simple | garbench-detailed | dlc |
ferret | mdvp | judge-simple | judge-detailed | judge-dlc
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("task", choices=[
        "garbench-vqa", "garbench-simple", "garbench-detailed",
        "dlc", "ferret", "mdvp",
        "judge-simple", "judge-detailed", "judge-dlc",
    ])
    p.add_argument("--model-path", default=None)
    p.add_argument("--preset", default="gar_1b")
    p.add_argument("--anno", required=True)
    p.add_argument("--images", default=None)
    p.add_argument("--out", default=None)
    p.add_argument("--pred", default=None, help="predictions file (judge tasks)")
    p.add_argument("--qa", default=None, help="DLC qa.json")
    p.add_argument("--class-names", default=None, help="DLC class_names.json")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--max-new-tokens", type=int, default=1024)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--random-init", action="store_true")
    p.add_argument("--judge-model", default="gpt-4o-2024-11-20")
    p.add_argument("--text-only-judge", action="store_true")
    args = p.parse_args(argv)

    if args.task.startswith("judge-"):
        from ..evaluation.judges import JudgeConfig, judge_detailed, judge_dlc, judge_simple

        jc = JudgeConfig(model=args.judge_model)
        if args.task == "judge-simple":
            judge_simple(args.pred, args.images, jc)
        elif args.task == "judge-detailed":
            judge_detailed(args.pred, args.images, jc)
        else:
            judge_dlc(
                args.pred, args.anno, args.qa, args.class_names,
                image_folder=args.images, judge_cfg=jc,
                with_images=not args.text_only_judge,
            )
        return

    from .runtime import GARRuntime
    from ..evaluation import BatchedCaptioner, run_dlc, run_ferret, run_garbench, run_mdvp

    rt = GARRuntime.load(args.model_path, args.preset, args.random_init)
    cap = BatchedCaptioner(rt, batch_size=args.batch_size,
                           max_new_tokens=args.max_new_tokens)
    out = args.out or f"model_outputs/{args.task}.json"
    if args.task.startswith("garbench-"):
        mode = args.task.split("-", 1)[1]
        run_garbench(cap, args.anno, args.images, mode, out, limit=args.limit)
    elif args.task == "dlc":
        run_dlc(cap, args.anno, args.images, out, limit=args.limit)
    elif args.task == "ferret":
        run_ferret(cap, args.anno, args.images, out, limit=args.limit)
    elif args.task == "mdvp":
        run_mdvp(cap, args.anno, args.images, out, limit=args.limit)


if __name__ == "__main__":
    main()
