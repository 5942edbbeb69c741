"""LoRA tests: no-op at init, merge equivalence, lora-only training."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from grasp_any_region_tpu.core.config import gar_tiny
from grasp_any_region_tpu.data.synthetic import synthetic_batch
from grasp_any_region_tpu.models import init_gar_params
from grasp_any_region_tpu.models.llama import embed_tokens, llama_prefill
from grasp_any_region_tpu.train.lora import (
    LoRAConfig,
    add_lora_params,
    lora_trainable_mask,
    merge_lora,
)

CFG = gar_tiny()
LC = LoRAConfig(rank=4, alpha=8.0, targets=("wq", "wv", "w_down"))


def _prefill_logits(params, ids):
    pos = jnp.broadcast_to(jnp.arange(ids.shape[1]), ids.shape)
    embeds = embed_tokens(params["llm"], ids, jnp.float32)
    hidden, _ = llama_prefill(params["llm"], CFG.text, embeds, pos, use_flash=False)
    return np.asarray(hidden)


def test_lora_zero_init_is_noop(rng):
    params = init_gar_params(jax.random.PRNGKey(0), CFG)
    ids = jnp.asarray(rng.integers(0, 1000, size=(1, 12)), jnp.int32)
    base = _prefill_logits(params, ids)
    lora = add_lora_params(jax.random.PRNGKey(1), params, CFG.text, LC)
    assert "wq_lora_a" in lora["llm"]["blocks"]
    np.testing.assert_allclose(_prefill_logits(lora, ids), base, rtol=1e-6)


def test_lora_merge_equivalence(rng):
    params = init_gar_params(jax.random.PRNGKey(0), CFG)
    lora = add_lora_params(jax.random.PRNGKey(1), params, CFG.text, LC)
    # make adapters non-trivial
    blocks = dict(lora["llm"]["blocks"])
    for t in LC.targets:
        blocks[f"{t}_lora_b"] = (
            jax.random.normal(jax.random.PRNGKey(2), blocks[f"{t}_lora_b"].shape) * 0.02
        )
    lora["llm"] = dict(lora["llm"]); lora["llm"]["blocks"] = blocks

    ids = jnp.asarray(rng.integers(0, 1000, size=(1, 12)), jnp.int32)
    adapted = _prefill_logits(lora, ids)
    base = _prefill_logits(params, ids)
    assert np.abs(adapted - base).max() > 1e-4  # adapters actually act

    merged = merge_lora(lora, LC)
    assert "wq_lora_a" not in merged["llm"]["blocks"]
    np.testing.assert_allclose(_prefill_logits(merged, ids), adapted, rtol=2e-4, atol=1e-5)


@pytest.mark.slow  # >15 s on the 1-core CPU lane (round-4 fast-lane budget)
def test_lora_only_training_updates_only_adapters(rng):
    from grasp_any_region_tpu.train import OptimizerConfig, init_sharded_state, make_train_step

    params = init_gar_params(jax.random.PRNGKey(0), CFG)
    params = add_lora_params(jax.random.PRNGKey(1), params, CFG.text, LC)
    mask = lora_trainable_mask(params)
    flat_mask = jax.tree_util.tree_leaves(mask)
    assert any(flat_mask) and not all(flat_mask)

    opt = OptimizerConfig(lr=1e-2, total_steps=4, accumulation=1, lora_only=True,
                          warmup_ratio=0.0)
    batch, labels, _ = synthetic_batch(CFG, batch=1, grid=(2, 1), regions=1, seed=2)
    state, tx = init_sharded_state(params, opt, mesh=None)
    step = make_train_step(CFG, tx, mask_compat=False, use_flash=False, donate=False)
    new_state, metrics = step(state, batch, labels)

    def changed(path_substr):
        import numpy as _np

        before = jax.tree_util.tree_leaves_with_path(params)
        after = dict(
            ("/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp), v)
            for kp, v in jax.tree_util.tree_leaves_with_path(new_state.params)
        )
        diffs = []
        for kp, v in before:
            path = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
            if path_substr in path:
                diffs.append(float(jnp.abs(after[path] - v).max()))
        return max(diffs) if diffs else 0.0

    assert changed("_lora_b") > 0.0  # adapters moved
    assert changed("blocks/wq") == 0.0 or changed("llm/blocks/wq/") == 0.0
    # base attention weight untouched
    np.testing.assert_array_equal(
        np.asarray(new_state.params["llm"]["blocks"]["wo"]),
        np.asarray(params["llm"]["blocks"]["wo"]),
    )
    np.testing.assert_array_equal(
        np.asarray(new_state.params["vision"]["blocks"]["wqkv"]),
        np.asarray(params["vision"]["blocks"]["wqkv"]),
    )
