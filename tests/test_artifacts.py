"""Artifact-gated validation: tests that light up the moment real weights /
tokenizers land in the environment (docs/ROADMAP.md #2-3; VERDICT r1 #9).

Each test skips unless its artifact exists at one of the conventional paths
(override with environment variables). They encode the exact checks that
will prove real-checkpoint fidelity:

  * GAR_TOKENIZER_JSON — a Llama-3 tokenizer.json: chat-template ids from
    our host tokenizer must match HF AutoTokenizer's for the GAR question
    format (incl. <Prompt*> added tokens at 128256+).
  * GAR_HF_CHECKPOINT — a GAR/PLM HF export dir: weights must convert and
    one forward step must run, with crop-token geometry intact.
  * SAM_HF_CHECKPOINT — facebook/sam-vit-* dir: conversion must produce our
    pytree and the mask pipeline must emit a plausible mask.
"""

import os

import numpy as np
import pytest

TOKENIZER_PATHS = [
    os.environ.get("GAR_TOKENIZER_JSON", ""),
    "/root/weights/tokenizer.json",
    "/root/weights/GAR-1B/tokenizer.json",
]
GAR_CKPT_PATHS = [
    os.environ.get("GAR_HF_CHECKPOINT", ""),
    "/root/weights/GAR-1B",
    "/root/weights/Perception-LM-1B",
]
SAM_CKPT_PATHS = [
    os.environ.get("SAM_HF_CHECKPOINT", ""),
    "/root/weights/sam-vit-huge",
    "/root/weights/sam-vit-base",
]


def _first_existing(paths, needs=None):
    for p in paths:
        if p and os.path.exists(p):
            if needs and not os.path.exists(os.path.join(p, needs)):
                continue
            return p
    return None


tokenizer_file = _first_existing(TOKENIZER_PATHS)
gar_ckpt = _first_existing(GAR_CKPT_PATHS, needs="config.json")
sam_ckpt = _first_existing(SAM_CKPT_PATHS, needs="config.json")


@pytest.mark.skipif(tokenizer_file is None, reason="no tokenizer.json artifact")
def test_real_tokenizer_chat_template_matches_hf():
    from grasp_any_region_tpu.data.chat import ChatMessage, apply_chat_template
    from grasp_any_region_tpu.data.tokenizer import GARTokenizer

    tok = GARTokenizer.from_file(tokenizer_file)
    # canonical single-region question (eval_dataset.py:109-113)
    from grasp_any_region_tpu.data.prompts import single_region_question

    text = tok.image_token + single_region_question(1)
    ids = apply_chat_template(
        tok,
        [ChatMessage(role="user", content=text)],
        add_generation_prompt=True,
        num_tiles_per_image=[2],
        tokens_per_tile=256,
    )
    ids = np.asarray(ids)
    assert ids[0] == 128000  # <|begin_of_text|>
    assert (ids == 128002).sum() == 2 * 256  # expanded image placeholders
    # <Prompt1> sits in the added-token range
    assert tok.convert_tokens_to_ids("<Prompt1>") >= 128256

    # cross-check against HF tokenizers when available
    try:
        from transformers import PreTrainedTokenizerFast
    except ImportError:
        return
    hf = PreTrainedTokenizerFast(tokenizer_file=tokenizer_file)
    plain = "Describe this masked region in detail."
    assert hf.encode(plain, add_special_tokens=False) == tok.encode(plain)


@pytest.mark.skipif(gar_ckpt is None, reason="no GAR/PLM HF checkpoint")
def test_real_checkpoint_loads_and_runs():
    import jax
    import jax.numpy as jnp

    from grasp_any_region_tpu.core.weights import load_checkpoint
    from grasp_any_region_tpu.data.synthetic import synthetic_batch
    from grasp_any_region_tpu.models.gar import gar_prefill
    from grasp_any_region_tpu.models.llama import lm_logits

    cfg, params = load_checkpoint(gar_ckpt, dtype=jnp.bfloat16)
    assert params["llm"]["blocks"]["wq"].shape[0] == cfg.text.num_layers
    batch, _, plens = synthetic_batch(cfg, batch=1, grid=(1, 1), regions=1)
    hidden, _ = gar_prefill(params, cfg, batch, mask_compat=False, use_flash=False)
    last = hidden[jnp.arange(1), plens - 1]
    logits = lm_logits(params["llm"], cfg.text, last,
                       valid_vocab=cfg.extended_vocab_size)
    assert bool(jnp.isfinite(logits).all())


@pytest.mark.skipif(sam_ckpt is None, reason="no SAM HF checkpoint")
def test_real_sam_checkpoint_masks():
    from grasp_any_region_tpu.sam.pipeline import SamPredictor

    pred = SamPredictor.load(sam_ckpt)
    assert pred.has_model
    rng = np.random.default_rng(0)
    img = (rng.random((256, 384, 3)) * 255).astype(np.uint8)
    img[60:180, 100:250] = (30, 200, 30)  # a solid region to segment
    mask = pred.predict(img, points=[(170, 120)], point_labels=[1])
    assert mask.shape == (256, 384)
    assert 0 < mask.sum() < mask.size  # nontrivial mask


@pytest.mark.skipif(gar_ckpt is None, reason="no GAR HF checkpoint")
def test_parity_harness_runs_on_real_checkpoint():
    """Drives the one-command parity harness (cli/parity.py, VERDICT r3 #5).

    With a real checkpoint present this must exit 0 (all checks that could
    run matched) or at worst 2 (no reference assets found) — exit 1 means a
    reproducibility break against the published caption/transcripts."""
    from grasp_any_region_tpu.cli.parity import main

    rc = main(["--model-path", gar_ckpt, "--limit", "5",
               "--max-new-tokens", "64",
               "--dump-checksums", "/tmp/parity_taps.json"])
    assert rc in (0, 2), f"parity harness reported mismatches (rc={rc})"
