"""On-chip dissection of the GAR-1B train step (VERDICT r4: train roofline).

Run from the repo root: python -m tools.train_dissect
All probes go through tools/probe_common.py — the single correct
scan-inside-one-jit / carry-perturbed / single-fetch implementation (its
docstring has the rules and the round-4 deflation postmortem).
"""
import numpy as np
import jax
import jax.numpy as jnp

from grasp_any_region_tpu.core.config import gar_1b
from grasp_any_region_tpu.data.synthetic import synthetic_batch
from grasp_any_region_tpu.models import init_gar_params
from grasp_any_region_tpu.train import (
    OptimizerConfig, init_sharded_state, make_train_loop,
)
from grasp_any_region_tpu.train.step import loss_fn
from tools.probe_common import ITERS, carry_probe, gnorm, scan_probe, timed

cfg = gar_1b()
params = init_gar_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
batch, labels, _ = synthetic_batch(cfg, batch=1, grid=(4, 4), regions=1, seed=0)


def _loss(p):
    return loss_fn(p, cfg, batch, labels, mask_compat=False)


def _grad_scalar(p):
    loss, g = jax.value_and_grad(_loss)(p)
    return loss + 1e-30 * gnorm(g)  # grads consumed so nothing DCEs


def _sgd_step(p):
    # full backward + param write traffic, no Adam moments / clip / MultiSteps
    loss, g = jax.value_and_grad(_loss)(p)
    p = jax.tree_util.tree_map(
        lambda w, d: w - (1e-8 * d).astype(w.dtype), p, g)
    return p, loss


scan_probe("fwd-only", _loss, params, tag="dissect")
scan_probe("fwd+bwd (grads->norm)", _grad_scalar, params, tag="dissect")
carry_probe("fwd+bwd+sgd-write", _sgd_step, params, tag="dissect")

opt_cfg = OptimizerConfig(lr=1e-4, total_steps=100, accumulation=1)
state, tx = init_sharded_state(params, opt_cfg, mesh=None)
del params  # the loop donates its state; keep exactly one copy resident
loop = make_train_loop(cfg, tx, ITERS, mask_compat=False, donate=True)
s2, _ = loop(state, batch, labels)  # warmup consumes `state`
np.asarray(jax.tree_util.tree_leaves(s2.step)[0:1])
import time

t0 = time.time()
s3, losses = loop(s2, batch, labels)
np.asarray(losses)
print(f"[dissect] full train step (adamw): "
      f"{(time.time()-t0)/ITERS*1000:.0f} ms/iter")
