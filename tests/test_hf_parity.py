"""Cross-framework numeric parity vs the installed HF transformers stack.

The real GAR checkpoints are unreachable in this environment, but
transformers 4.57.6 + torch (cpu) ARE installed — these tests random-init
tiny HF models with the exact structural features the real checkpoints use
(llama3 rope scaling, GQA, tied embeddings, the PLM projector's
linear-GELU-linear + adaptive 2x pool), round-trip the weights through
`save_pretrained` -> our converter, and assert our forward matches HF's to
fp32 tolerance. This de-risks the blocked real-checkpoint milestone
(SURVEY.md §7.3; reference modeling_perception_lm.py:429-572).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from grasp_any_region_tpu.core.config import TextConfig
from grasp_any_region_tpu.core.weights import convert_hf_llama
from grasp_any_region_tpu.models.llama import (
    KVCache,
    embed_tokens,
    llama_decode_step,
    llama_prefill,
    lm_logits,
)

VOCAB = 512
SEQ = 24


def _text_cfg(tie: bool) -> TextConfig:
    # llama3 rope scaling + GQA: the two features that make or break real
    # checkpoint loading (HF LlamaConfig rope_scaling type="llama3")
    return TextConfig(
        vocab_size=VOCAB,
        hidden_size=64,
        intermediate_size=128,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        head_dim=16,
        rope_theta=500000.0,
        rms_norm_eps=1e-5,
        max_position_embeddings=131072,
        tie_word_embeddings=tie,
        rope_scaling_factor=32.0,
        rope_low_freq_factor=1.0,
        rope_high_freq_factor=4.0,
        rope_original_max_position=8192,
    )


def _hf_model(cfg: TextConfig):
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        rope_theta=cfg.rope_theta,
        rms_norm_eps=cfg.rms_norm_eps,
        max_position_embeddings=cfg.max_position_embeddings,
        tie_word_embeddings=cfg.tie_word_embeddings,
        rope_scaling=None
        if cfg.rope_scaling_factor is None
        else {
            "rope_type": "llama3",
            "factor": cfg.rope_scaling_factor,
            "low_freq_factor": cfg.rope_low_freq_factor,
            "high_freq_factor": cfg.rope_high_freq_factor,
            "original_max_position_embeddings": cfg.rope_original_max_position,
        },
        attention_bias=False,
        mlp_bias=False,
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(hf_cfg)
    model.eval()
    return model


def _ours_from_hf(model, cfg: TextConfig) -> dict:
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_hf_llama(cfg, sd)
    assert params is not None
    return jax.tree_util.tree_map(jnp.asarray, params)


def _hf_logits(model, ids: np.ndarray) -> np.ndarray:
    with torch.no_grad():
        out = model(input_ids=torch.from_numpy(ids).long())
    return out.logits.float().numpy()


@pytest.mark.slow  # >15 s on the 1-core CPU lane (round-4 fast-lane budget)
@pytest.mark.parametrize("tie", [True, False])
def test_prefill_logits_match_hf(tie):
    cfg = _text_cfg(tie)
    model = _hf_model(cfg)
    params = _ours_from_hf(model, cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, VOCAB, size=(2, SEQ)).astype(np.int32)
    ref = _hf_logits(model, ids)

    x = embed_tokens(params, jnp.asarray(ids), dtype=jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(SEQ, dtype=jnp.int32), (2, SEQ))
    hidden, _ = llama_prefill(params, cfg, x, positions, use_flash=False)
    ours = np.asarray(
        lm_logits(params, cfg, hidden, valid_vocab=cfg.vocab_size)
    )
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_rope_scaling_matters():
    """Guard against vacuous parity: the llama3-scaled and unscaled rope must
    actually diverge at these positions, so the test above can't pass with a
    broken scaling implementation."""
    cfg = _text_cfg(True)
    import dataclasses

    cfg_noscale = dataclasses.replace(cfg, rope_scaling_factor=None)
    from grasp_any_region_tpu.ops.rope import llama_inv_freq

    a = np.asarray(llama_inv_freq(cfg))
    b = np.asarray(llama_inv_freq(cfg_noscale))
    assert np.max(np.abs(a - b) / b) > 0.1


def test_greedy_decode_matches_hf():
    """Prefill-seeded KV cache decode (our while-loop path's step function)
    must track HF's full-context greedy trajectory."""
    cfg = _text_cfg(True)
    model = _hf_model(cfg)
    params = _ours_from_hf(model, cfg)

    rng = np.random.default_rng(1)
    b, steps = 2, 6
    prompt_lens = np.array([SEQ, SEQ - 5], np.int32)
    ids = rng.integers(0, VOCAB, size=(b, SEQ)).astype(np.int32)
    ids[1, prompt_lens[1]:] = 0  # right padding

    # ours: prefill -> seed cache -> decode_step loop
    x = embed_tokens(params, jnp.asarray(ids), dtype=jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(SEQ, dtype=jnp.int32), (b, SEQ))
    hidden, kv = llama_prefill(params, cfg, x, positions, use_flash=False)
    from grasp_any_region_tpu.core.config import GARConfig
    from grasp_any_region_tpu.models.gar import seed_cache_from_prefill

    cache = seed_cache_from_prefill(
        GARConfig(text=cfg), kv, jnp.asarray(prompt_lens), SEQ + steps + 8,
        dtype=jnp.float32,
    )
    last = hidden[jnp.arange(b), prompt_lens - 1]
    cur = np.asarray(
        jnp.argmax(lm_logits(params, cfg, last, valid_vocab=VOCAB), -1)
    ).astype(np.int32)

    ours_tokens = [cur]
    for _ in range(steps - 1):
        emb = embed_tokens(params, jnp.asarray(cur)[:, None], dtype=jnp.float32)
        h, cache = llama_decode_step(
            params, cfg, emb, cache, SEQ, use_kernel=False
        )
        logits = lm_logits(params, cfg, h[:, 0], valid_vocab=VOCAB)
        cur = np.asarray(jnp.argmax(logits, -1)).astype(np.int32)
        ours_tokens.append(cur)
    ours_tokens = np.stack(ours_tokens, axis=1)  # (B, steps)

    # HF: greedy continuation per row (full recompute — reference semantics)
    for row in range(b):
        seq = list(ids[row, : prompt_lens[row]])
        for s in range(steps):
            logits = _hf_logits(model, np.asarray([seq], np.int32))
            nxt = int(np.argmax(logits[0, -1]))
            assert nxt == int(ours_tokens[row, s]), (
                f"row {row} step {s}: hf {nxt} ours {int(ours_tokens[row, s])}"
            )
            seq.append(nxt)


def test_projector_matches_hf():
    from transformers.models.perception_lm.modeling_perception_lm import (
        PerceptionLMMultiModalProjector,
    )

    class _NS:
        pass

    hf_cfg = _NS()
    hf_cfg.vision_config = _NS()
    hf_cfg.vision_config.model_args = {"embed_dim": 32}
    hf_cfg.text_config = _NS()
    hf_cfg.text_config.hidden_size = 48
    hf_cfg.projector_pooling_ratio = 2

    torch.manual_seed(0)
    proj = PerceptionLMMultiModalProjector(hf_cfg)
    proj.eval()

    t, n = 3, 16  # 3 tiles, 4x4 token grid
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((t, n, 32)).astype(np.float32)
    with torch.no_grad():
        ref = proj(torch.from_numpy(feats)).numpy()

    import dataclasses

    from grasp_any_region_tpu.core.config import GARConfig, VisionConfig
    from grasp_any_region_tpu.models.projector import projector_forward

    cfg = GARConfig(
        vision=VisionConfig(width=32),
        text=dataclasses.replace(_text_cfg(True), hidden_size=48),
        projector_pooling_ratio=2,
    )
    params = {
        "fc1": jnp.asarray(proj.linear_1.weight.detach().numpy().T),
        "b1": jnp.asarray(proj.linear_1.bias.detach().numpy()),
        "fc2": jnp.asarray(proj.linear_2.weight.detach().numpy().T),
        "b2": jnp.asarray(proj.linear_2.bias.detach().numpy()),
    }
    ours = np.asarray(projector_forward(params, cfg, jnp.asarray(feats)))
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)
