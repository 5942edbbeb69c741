"""1F1B pipeline schedule (parallel/pipeline.pipeline_train_1f1b).

The GPipe path (tests/test_pipeline.py) differentiates THROUGH the schedule;
1F1B instead runs each microbatch's backward as soon as its forward retires
from the last stage, with the loss head folded into that stage. These tests
assert the manual schedule is numerically invisible: loss AND every gradient
(blocks, head, embeddings) match jax.value_and_grad over the plain
single-device decoder + chunked CE, in fp32, including packed/segment-id
batches and data-parallel composition.

Reference analog: none — the reference never pipelines GAR (PP appears only
as a vLLM judge-server flag, evaluation/DLC-Bench/serve_judge.sh:7).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from grasp_any_region_tpu.core.config import gar_tiny
from grasp_any_region_tpu.models.llama import init_llama_params, llama_prefill
from grasp_any_region_tpu.parallel.pipeline import (
    make_pipeline_mesh,
    pipeline_train_1f1b,
)
from grasp_any_region_tpu.train.losses import chunked_cross_entropy, shift_labels


def _setup(num_layers=4, B=4, S=32, seed=7):
    cfg = dataclasses.replace(gar_tiny().text, num_layers=num_layers)
    params = init_llama_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(seed)
    embeds = jnp.asarray(
        rng.standard_normal((B, S, cfg.hidden_size)), dtype=jnp.float32
    )
    positions = jnp.tile(jnp.arange(S, dtype=jnp.int32), (B, 1))
    labels = jnp.asarray(
        rng.integers(0, cfg.vocab_size, size=(B, S)), dtype=jnp.int32
    )
    # sprinkle ignore-index like chat-template supervision does
    labels = jnp.where(
        jnp.asarray(rng.random((B, S)) < 0.3), jnp.int32(-100), labels
    )
    return cfg, params, embeds, positions, labels


def _ref_loss_fn(cfg, segment_ids=None, right_padded=True):
    def loss(params, embeds, positions, labels):
        hidden, _ = llama_prefill(
            params, cfg, embeds, positions, use_flash=False,
            segment_ids=segment_ids, right_padded=right_padded,
        )
        return chunked_cross_entropy(
            params, cfg, hidden, shift_labels(labels)
        )

    return loss


def _assert_tree_close(got, want, atol, keys=None):
    got_flat = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(got)
    )
    want_flat = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(want)
    )
    checked = 0
    for k, g in got_flat.items():
        if keys is not None and not any(s in k for s in keys):
            continue
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(want_flat[k]), atol=atol, err_msg=k
        )
        checked += 1
    assert checked


@pytest.mark.parametrize("n_stages,n_micro", [(2, 4), (4, 4), (4, 2)])
def test_1f1b_matches_value_and_grad(n_stages, n_micro):
    cfg, params, embeds, positions, labels = _setup()
    mesh = make_pipeline_mesh(n_stages)

    ref = jax.jit(
        jax.value_and_grad(_ref_loss_fn(cfg), argnums=(0, 1))
    )(params, embeds, positions, labels)
    (ref_loss, (ref_gp, ref_ge)) = ref

    loss, d_llm, d_embeds = jax.jit(
        lambda p, e, pos, lab: pipeline_train_1f1b(
            p, cfg, e, pos, lab, mesh, n_micro=n_micro, use_flash=False
        )
    )(params, embeds, positions, labels)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-6)
    _assert_tree_close(d_llm["blocks"], ref_gp["blocks"], atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(d_llm["final_norm"]), np.asarray(ref_gp["final_norm"]),
        atol=2e-5,
    )
    head_key = "embed" if "lm_head" not in params else "lm_head"
    np.testing.assert_allclose(
        np.asarray(d_llm[head_key]), np.asarray(ref_gp[head_key]), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(d_embeds), np.asarray(ref_ge), atol=2e-5
    )


def test_1f1b_packed_segments_left_pad():
    """Packed rows: block-diagonal segment attention + right_padded=False."""
    cfg, params, embeds, positions, labels = _setup(B=2, S=48)
    rng = np.random.default_rng(3)
    seg = np.zeros((2, 48), np.int32)
    seg[0, :20] = 1
    seg[0, 20:44] = 2
    seg[1, :31] = 1
    segment_ids = jnp.asarray(seg)
    labels = jnp.where(segment_ids > 0, labels, jnp.int32(-100))
    mesh = make_pipeline_mesh(2)

    ref_loss, (ref_gp, ref_ge) = jax.jit(
        jax.value_and_grad(
            _ref_loss_fn(cfg, segment_ids=segment_ids, right_padded=False),
            argnums=(0, 1),
        )
    )(params, embeds, positions, labels)

    loss, d_llm, d_embeds = jax.jit(
        lambda p, e, pos, lab: pipeline_train_1f1b(
            p, cfg, e, pos, lab, mesh, n_micro=2, use_flash=False,
            segment_ids=segment_ids, right_padded=False,
        )
    )(params, embeds, positions, labels)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-6)
    _assert_tree_close(d_llm["blocks"], ref_gp["blocks"], atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(d_embeds), np.asarray(ref_ge), atol=2e-5
    )


def test_1f1b_composes_with_data_parallel():
    """(data=2, pipe=2) mesh: microbatch rows shard over data, grads psum."""
    cfg, params, embeds, positions, labels = _setup(B=4)
    devices = np.array(jax.devices()[:4]).reshape(2, 2)
    from jax.sharding import Mesh

    mesh = Mesh(devices, ("data", "pipe"))

    ref_loss, (ref_gp, ref_ge) = jax.jit(
        jax.value_and_grad(_ref_loss_fn(cfg), argnums=(0, 1))
    )(params, embeds, positions, labels)

    loss, d_llm, d_embeds = jax.jit(
        lambda p, e, pos, lab: pipeline_train_1f1b(
            p, cfg, e, pos, lab, mesh, n_micro=2, use_flash=False
        )
    )(params, embeds, positions, labels)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-6)
    _assert_tree_close(d_llm["blocks"], ref_gp["blocks"], atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(d_embeds), np.asarray(ref_ge), atol=2e-5
    )


def test_1f1b_packed_train_step_matches_gpipe():
    """make_packed_train_step(pipe_schedule='1f1b') == the gpipe step."""
    import grasp_any_region_tpu.core.config as config_mod
    from grasp_any_region_tpu.data.builders import pack_text_batch
    from grasp_any_region_tpu.models import init_gar_params
    from grasp_any_region_tpu.train import OptimizerConfig, init_sharded_state
    from grasp_any_region_tpu.train.step import make_packed_train_step

    cfg = config_mod.gar_tiny()
    cfg = dataclasses.replace(
        cfg, text=dataclasses.replace(cfg.text, num_layers=4)
    )
    params = init_gar_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    docs = [
        rng.integers(5, 200, size=int(n)).astype(np.int32)
        for n in rng.integers(20, 60, size=8)
    ]
    packed = pack_text_batch(docs, seq_len=64, labels=docs)
    packed = jax.tree_util.tree_map(lambda x: x[:2], packed)

    mesh = make_pipeline_mesh(2)
    opt = OptimizerConfig(lr=1e-3, total_steps=10, accumulation=1)

    losses = {}
    for sched in ("gpipe", "1f1b"):
        state, tx = init_sharded_state(params, opt, mesh=None)
        step = make_packed_train_step(
            cfg, tx, donate=False, mesh=mesh, pipe_schedule=sched,
            use_flash=False,
        )
        ls = []
        for _ in range(2):
            state, m = step(state, packed)
            ls.append(float(m["loss"]))
        losses[sched] = ls
    np.testing.assert_allclose(losses["gpipe"], losses["1f1b"], rtol=1e-5)
