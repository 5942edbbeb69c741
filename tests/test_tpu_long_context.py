"""Long-context training on the REAL chip — the round-3 headline proof.

The reference trains with flash-attn 2.7.4 at max_length=16384
(projects/grasp_any_region/configs/gar_1b.py:28, requirements.txt:2). Until
round 3 our training backward materialized (B, H, Sq, Sk) fp32 logits per
remat block (at S=8192 that is 8.6 GB per layer — unrunnable on a 16 GB
v5e). With the Pallas FA-2 backward (ops/flash_backward.py) the same
forward+backward fits and runs: these tests take gradients of the full
GAR-1B DECODER (1.2B params, bf16) through the remat'd prefill at the
reference's own context lengths.

Run via the TPU lane:  GAR_TPU_TESTS=1 python -m pytest tests/test_tpu_long_context.py -q
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

tpu = jax.default_backend() == "tpu"
pytestmark = [
    pytest.mark.skipif(not tpu, reason="needs a real TPU backend"),
    pytest.mark.slow,
]


def _grad_step(seq_len: int) -> float:
    from grasp_any_region_tpu.core.config import gar_1b
    from grasp_any_region_tpu.data.builders import PackedTextBatch
    from grasp_any_region_tpu.models.llama import init_llama_params
    from grasp_any_region_tpu.train.step import packed_loss_fn

    cfg = gar_1b()
    params = {"llm": init_llama_params(
        jax.random.PRNGKey(0), cfg.text, cfg.padded_vocab_size, jnp.bfloat16
    )}
    rng = np.random.default_rng(0)
    ids = rng.integers(10, 32000, (1, seq_len)).astype(np.int32)
    packed = PackedTextBatch(
        input_ids=jnp.asarray(ids),
        positions=jnp.arange(seq_len, dtype=jnp.int32)[None],
        segment_ids=jnp.ones((1, seq_len), jnp.int32),
        labels=jnp.asarray(ids),
    )

    @jax.jit
    def grad_step(params, packed):
        loss, grads = jax.value_and_grad(
            lambda p: packed_loss_fn(p, cfg, packed)
        )(params)
        gn = jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(jnp.square(x.astype(jnp.float32))),
            grads, jnp.float32(0),
        )
        return loss, jnp.sqrt(gn)

    loss, gn = grad_step(params, packed)
    loss, gn = float(loss), float(gn)
    assert np.isfinite(loss) and np.isfinite(gn), (loss, gn)
    assert gn > 0.0
    return loss


def test_decoder_grad_s8192():
    """fwd+bwd of the 1.2B decoder at S=8192 B=1 — previously OOM'd."""
    _grad_step(8192)


def test_decoder_grad_s16384():
    """The reference's full max_length=16384 (configs/gar_1b.py:28)."""
    _grad_step(16384)
