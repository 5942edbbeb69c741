"""Shared CLI runtime: model loading + the image->caption pipeline.

Replaces the reference demos' boilerplate (AutoModel.from_pretrained with
trust_remote_code + manual NCCL init even on one GPU, demo/gar_with_mask.py
:80-94) with a plain loader: checkpoint dir (our safetensors or converted HF)
or random-init fallback for smoke tests.
"""

from __future__ import annotations

import os
import sys
import time
from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np

from ..core.config import GARConfig, PRESETS, load_config
from ..data.builders import RegionSample, build_region_batch
from ..data.image_processor import GARImageProcessor, ImageProcessorConfig
from ..data.tokenizer import GARTokenizer


@dataclass
class GARRuntime:
    cfg: GARConfig
    params: dict
    tok: GARTokenizer
    proc: GARImageProcessor

    @classmethod
    def load(
        cls,
        model_path: Optional[str] = None,
        preset: str = "gar_1b",
        random_init: bool = False,
        seed: int = 0,
        int8_serving: bool = False,
    ) -> "GARRuntime":
        """int8_serving: convert to serving-only int8 decoder weights
        (models/quantize.serving_weights — per-channel int8 matmuls, NO
        resident bf16 decoder copies). Halves the resident decoder footprint,
        which is what lets 16 engine slots fit one 16 GiB chip (the bench.py
        serving leader, 811 tok/s). Quality vs bf16 is parity-tested on
        random weights only; real-checkpoint validation is cli/parity.py
        check (c)."""
        import jax
        import jax.numpy as jnp

        from ..core.cache import enable_compilation_cache
        from ..models import init_gar_params

        enable_compilation_cache()

        cfg = None
        tok = None
        params = None
        if model_path is not None and os.path.isdir(model_path):
            from ..core.weights import load_checkpoint

            cfg, params = load_checkpoint(model_path)
            tok_file = os.path.join(model_path, "tokenizer.json")
            if os.path.exists(tok_file):
                tok = GARTokenizer.from_file(tok_file, cfg.prompt_numbers)
        if cfg is None:
            cfg = PRESETS[preset]()
        if params is None:
            if not random_init:
                print(
                    "[gar] no checkpoint found — using RANDOM weights "
                    "(pass --random-init to silence)",
                    file=sys.stderr,
                )
            params = init_gar_params(jax.random.PRNGKey(seed), cfg, dtype=jnp.bfloat16)
        if tok is None:
            tok = GARTokenizer.synthetic(cfg.prompt_numbers)
        if int8_serving:
            from ..models.quantize import serving_weights

            params = serving_weights(params)
            print(
                "[gar] int8 serving-only weights: decoder matmuls quantized "
                "per-output-channel int8 (no resident bf16 copies). Quality "
                "vs bf16 is validated on random weights only — run "
                "cli/parity.py check (c) against a real checkpoint before "
                "trusting captions.",
                file=sys.stderr,
            )
        proc = GARImageProcessor(ImageProcessorConfig(max_num_tiles=cfg.max_num_tiles))
        return cls(cfg=cfg, params=params, tok=tok, proc=proc)

    def caption(
        self,
        samples: List[RegionSample],
        *,
        max_new_tokens: int = 1024,
        temperature: float = 0.0,
        speculative: Optional[tuple] = None,  # (gamma, draft_layers)
    ) -> List[str]:
        """Run the full pipeline; returns decoded text per sample.

        speculative: single-sample greedy decode via self-speculative
        draft/verify (models/speculative.py) — identical tokens, fewer
        weight streams per token when the shallow draft is predictive."""
        batch, plens = build_region_batch(self.cfg, self.tok, self.proc, samples)
        t0 = time.time()
        if speculative is not None:
            from ..models.speculative import generate_speculative

            assert len(samples) == 1 and temperature == 0.0, (
                "speculative decode is single-stream greedy"
            )
            gamma, k = speculative
            out = generate_speculative(
                self.params, self.cfg, batch, plens,
                max_new_tokens=max_new_tokens, gamma=gamma, draft_layers=k,
                eot_id=self.tok.eot_id,
            )
        else:
            from ..models.generate import generate

            out = generate(
                self.params, self.cfg, batch, plens,
                max_new_tokens=max_new_tokens,
                eot_id=self.tok.eot_id,
                temperature=temperature,
            )
        toks = np.asarray(out.tokens)
        nums = np.asarray(out.num_generated)
        dt = time.time() - t0
        print(
            f"[gar] {len(samples)} caption(s) in {dt:.2f}s "
            f"({int(nums.sum())} tokens)",
            file=sys.stderr,
        )
        texts = []
        for i in range(len(samples)):
            ids = toks[i, : nums[i]].tolist()
            if ids and ids[-1] == self.tok.eot_id:
                ids = ids[:-1]
            texts.append(self.tok.decode(ids, skip_special_tokens=False))
        return texts


def load_image(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))


def load_mask(path: str) -> np.ndarray:
    from PIL import Image

    m = np.asarray(Image.open(path).convert("L"))
    return (m > 127).astype(np.uint8)
