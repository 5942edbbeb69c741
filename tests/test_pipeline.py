"""Pipeline parallelism (parallel/pipeline.py) on the virtual CPU mesh.

The reference exposes PP only as a vLLM judge-server flag
(evaluation/DLC-Bench/serve_judge.sh:7); here it is a real GPipe schedule
over a 'pipe' mesh axis. These tests assert the schedule is numerically
invisible: hidden states AND gradients match the single-device
llama_prefill body exactly (fp32, same op order per layer).
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
    pipeline_bubble_fraction,
    pipeline_prefill,
)


def _setup(num_layers=4, B=4, S=32):
    cfg = dataclasses.replace(gar_tiny().text, num_layers=num_layers)
    params = init_llama_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(7)
    embeds = jnp.asarray(
        rng.standard_normal((B, S, cfg.hidden_size)), dtype=jnp.float32
    )
    positions = jnp.tile(jnp.arange(S, dtype=jnp.int32), (B, 1))
    return cfg, params, embeds, positions


def _ref_hidden(cfg, params, embeds, positions):
    hidden, _ = llama_prefill(params, cfg, embeds, positions, use_flash=False)
    return hidden


@pytest.mark.parametrize("n_stages,n_micro", [(2, 4), (4, 4), (4, 2)])
def test_pipeline_forward_matches_single_device(n_stages, n_micro):
    cfg, params, embeds, positions = _setup()
    ref = _ref_hidden(cfg, params, embeds, positions)
    mesh = make_pipeline_mesh(n_stages)
    out = jax.jit(
        lambda p, e, pos: pipeline_prefill(
            p, cfg, e, pos, mesh, n_micro=n_micro, use_flash=False
        )
    )(params, embeds, positions)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pipeline_backward_matches_single_device():
    """jax.grad through the schedule == grad through the plain scan —
    the reverse pipeline is exact, not an approximation."""
    cfg, params, embeds, positions = _setup()
    mesh = make_pipeline_mesh(4)

    def loss_pipe(p, e):
        h = pipeline_prefill(p, cfg, e, positions, mesh, n_micro=4,
                             use_flash=False)
        return jnp.mean(h * h)

    def loss_ref(p, e):
        h, _ = llama_prefill(p, cfg, e, positions, use_flash=False)
        return jnp.mean(h * h)

    (lp, gp) = jax.jit(jax.value_and_grad(loss_pipe, argnums=(0, 1)))(
        params, embeds
    )
    (lr, gr) = jax.jit(jax.value_and_grad(loss_ref, argnums=(0, 1)))(
        params, embeds
    )
    np.testing.assert_allclose(float(lp), float(lr), rtol=1e-6)
    flat_p = jax.tree_util.tree_leaves_with_path(gp[0]["blocks"])
    flat_r = dict(jax.tree_util.tree_leaves_with_path(gr[0]["blocks"]))
    assert flat_p
    for path, leaf in flat_p:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_r[path]), atol=2e-5,
            err_msg=str(path),
        )
    np.testing.assert_allclose(
        np.asarray(gp[1]), np.asarray(gr[1]), atol=2e-5
    )


def test_pipeline_remat_matches():
    cfg, params, embeds, positions = _setup(num_layers=2, B=2, S=16)
    mesh = make_pipeline_mesh(2)
    ref = _ref_hidden(cfg, params, embeds, positions)
    out = pipeline_prefill(
        params, cfg, embeds, positions, mesh, n_micro=2, remat=True,
        use_flash=False,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pipeline_rejects_bad_factorizations():
    cfg, params, embeds, positions = _setup(num_layers=3)
    mesh = make_pipeline_mesh(2)
    with pytest.raises(ValueError, match="num_layers"):
        pipeline_prefill(params, cfg, embeds, positions, mesh, use_flash=False)
    cfg4, params, embeds, positions = _setup(num_layers=4, B=4)
    with pytest.raises(ValueError, match="n_micro"):
        pipeline_prefill(
            params, cfg4, embeds, positions, mesh, n_micro=3, use_flash=False
        )


def test_bubble_fraction():
    assert pipeline_bubble_fraction(1, 8) == 0.0
    assert pipeline_bubble_fraction(4, 12) == pytest.approx(3 / 15)
