"""Train CLI.

Equivalent surface to `bash tools/dist.sh train configs/gar_1b.py N` +
tools/train.py, minus torchrun/mmengine: one process per host, XLA handles
the chips.

  python -m grasp_any_region_tpu.cli.train --preset gar_1b \
      --data data/Seed-Dataset.json --work-dir work_dirs/gar_1b \
      --fsdp 4 --tensor 2
"""

from __future__ import annotations

import argparse
import json

import jax


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="gar_1b")
    p.add_argument("--config", default=None, help="config json overriding preset")
    p.add_argument("--data", action="append", required=True)
    p.add_argument("--work-dir", default="./work_dirs/gar")
    p.add_argument("--init-from", default=None, help="checkpoint dir to start from")
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--accumulation", type=int, default=2)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--warmup-ratio", type=float, default=0.03)
    p.add_argument("--freeze-llm", action="store_true")
    p.add_argument("--freeze-vision", action="store_true")
    p.add_argument("--data-axis", type=int, default=1)
    p.add_argument("--fsdp", type=int, default=0, help="0 = all remaining devices")
    p.add_argument("--tensor", type=int, default=1)
    p.add_argument("--seq", type=int, default=1)
    p.add_argument("--pipe", type=int, default=1,
                   help="pipeline-parallel stages (decoder layers partition; "
                        "requires --tensor 1 --seq 1)")
    p.add_argument("--pipe-schedule", default="gpipe",
                   choices=["gpipe", "1f1b"],
                   help="1f1b interleaves each microbatch's backward right "
                        "after its forward retires: O(pipe) activation "
                        "memory instead of O(n_micro), same bubble "
                        "(parallel/pipeline.pipeline_train_1f1b)")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="param + Adam-moment dtype. bfloat16 is the "
                        "single-chip recipe (fp32 GAR-1B state is ~17 GB "
                        "and needs the fsdp axis; docs/GAR8B_MEMORY.md)")
    p.add_argument("--export-hf", default=None, help="export dir after training")
    p.add_argument("--no-save-optimizer", action="store_true")
    p.add_argument("--log-interval", type=int, default=100,
                   help="steps between loss logs (reference LoggerHook=100)")
    args = p.parse_args(argv)

    from ..core.cache import enable_compilation_cache
    from ..core.config import PRESETS, load_config
    from ..core.mesh import MeshSpec
    from ..data.dataset import DatasetConfig, GraspAnyRegionDataset
    from ..data.tokenizer import GARTokenizer
    from ..models import init_gar_params
    from ..train.optimizer import OptimizerConfig
    from ..train.trainer import Trainer, TrainerConfig

    enable_compilation_cache()
    cfg = load_config(args.config) if args.config else PRESETS[args.preset]()
    import jax.numpy as jnp

    dtype = jnp.dtype(args.dtype)
    if args.init_from:
        from ..core.weights import load_checkpoint

        cfg, params = load_checkpoint(args.init_from)
        if dtype != jnp.float32:
            # Adam moments follow param dtype (optax mu_dtype default), so
            # this one cast selects the whole bf16 single-chip state recipe.
            params = jax.tree_util.tree_map(
                lambda x: x.astype(dtype) if jnp.issubdtype(
                    x.dtype, jnp.floating) else x,
                params,
            )
        tok_file = f"{args.init_from}/tokenizer.json"
        import os

        tok = (
            GARTokenizer.from_file(tok_file, cfg.prompt_numbers)
            if os.path.exists(tok_file)
            else GARTokenizer.synthetic(cfg.prompt_numbers)
        )
    else:
        params = init_gar_params(jax.random.PRNGKey(0), cfg, dtype=dtype)
        tok = GARTokenizer.synthetic(cfg.prompt_numbers)

    dataset = GraspAnyRegionDataset(
        cfg, tok, DatasetConfig(annotation_paths=args.data)
    )
    n_dev = len(jax.devices())
    if args.pipe > 1 and (args.tensor > 1 or args.seq > 1):
        p.error("--pipe composes with data/fsdp only (use --tensor 1 --seq 1)")
    fsdp = args.fsdp or max(
        1, n_dev // (args.data_axis * args.tensor * args.seq * args.pipe)
    )
    mesh = MeshSpec(data=args.data_axis, fsdp=fsdp, tensor=args.tensor,
                    seq=args.seq, pipe=args.pipe)
    total_steps = args.max_steps or len(dataset)
    opt_cfg = OptimizerConfig(
        lr=args.lr,
        warmup_ratio=args.warmup_ratio,
        total_steps=total_steps,
        accumulation=args.accumulation,
        freeze_llm=args.freeze_llm,
        freeze_visual_encoder=args.freeze_vision,
    )
    tcfg = TrainerConfig(
        work_dir=args.work_dir,
        max_steps=args.max_steps,
        batch_size=args.batch_size,
        mesh=mesh if mesh.size > 1 else None,
        save_optimizer=not args.no_save_optimizer,
        log_interval=args.log_interval,
        pipe_schedule=args.pipe_schedule,
    )
    trainer = Trainer(cfg, params, dataset, opt_cfg, tcfg)
    state = trainer.train()

    if args.export_hf:
        from ..train.export import export_hf_checkpoint

        export_hf_checkpoint(args.export_hf, cfg, jax.device_get(state.params))
        print(f"[trainer] exported HF checkpoint to {args.export_hf}")


if __name__ == "__main__":
    main()
