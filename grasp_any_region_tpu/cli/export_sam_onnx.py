"""Export the SAM mask decoder to ONNX for in-browser decoding.

The reference demo ships a React frontend that runs the decoder
client-side with onnxruntime-web for hover-instant mask previews
(demo/gradio/frontend/src/components/helpers/onnxModelAPI.tsx). This CLI
produces the .onnx file that frontend loads, from either a real SAM
checkpoint (torch .pth, converted by sam/weights.py) or random weights
(plumbing tests).

Usage:
  python -m grasp_any_region_tpu.cli.export_sam_onnx \
      --checkpoint sam_vit_h_4b8939.pth --out sam_decoder.onnx
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", default=None,
                   help="SAM .pth checkpoint (vit_b/l/h inferred from shapes)")
    p.add_argument("--out", required=True, help="output .onnx path")
    p.add_argument("--multimask", action="store_true",
                   help="emit all 4 mask outputs instead of the best one "
                        "(the browser demo uses single-mask)")
    p.add_argument("--random-init", action="store_true",
                   help="random weights (export-pipeline smoke test)")
    args = p.parse_args(argv)

    from ..sam.onnx_export import export_mask_decoder_onnx

    if args.checkpoint:
        from ..sam.weights import load_sam_checkpoint

        cfg, params = load_sam_checkpoint(args.checkpoint)
    elif args.random_init:
        import jax
        import jax.numpy as jnp

        from ..sam.model import init_sam_params, sam_vit_b

        cfg = sam_vit_b()
        params = init_sam_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    else:
        p.error("--checkpoint or --random-init required")

    path = export_mask_decoder_onnx(
        params, cfg, args.out, return_single_mask=not args.multimask
    )
    import os

    print(f"[export] {path} ({os.path.getsize(path) / 1e6:.1f} MB)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
