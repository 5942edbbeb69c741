"""Bisect the 950 ms param-update overhead: carry only a subtree of params
through the scan (the rest captured constant) and SGD-update just it.

Run from the repo root: python -m tools.train_dissect2
Probe rules live in tools/probe_common.py.
"""
import jax
import jax.numpy as jnp

from grasp_any_region_tpu.core.config import gar_1b
from grasp_any_region_tpu.data.synthetic import synthetic_batch
from grasp_any_region_tpu.models import init_gar_params
from grasp_any_region_tpu.train.step import loss_fn
from tools.probe_common import carry_probe

cfg = gar_1b()
params = init_gar_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
batch, labels, _ = synthetic_batch(cfg, batch=1, grid=(4, 4), regions=1, seed=0)


def probe(name, paths):
    """paths: list of (top, sub) keys to carry+update; sub=None -> whole top."""
    def split(p):
        carry, rest = {}, jax.tree_util.tree_map(lambda x: x, p)
        for top, sub in paths:
            if sub is None:
                carry[top] = rest.pop(top)
            else:
                carry.setdefault(top, {})[sub] = rest[top].pop(sub)
        return carry, rest

    carry0, rest = split(params)

    def merge(carry, rest):
        out = dict(rest)
        for top, v in carry.items():
            if isinstance(v, dict) and top in rest:
                out[top] = {**rest[top], **v}
            else:
                out[top] = v
        return out

    def step(c):
        loss, g = jax.value_and_grad(
            lambda cc: loss_fn(merge(cc, rest), cfg, batch, labels,
                               mask_compat=False))(c)
        c = jax.tree_util.tree_map(
            lambda w, d: w - (1e-8 * d).astype(w.dtype), c, g)
        return c, loss

    carry_probe(f"update {name}", step, carry0, tag="dissect2")


probe("llm only", [("llm", None)])
probe("vision only", [("vision", None)])
probe("embed only", [("llm", "embed")])
probe("llm blocks only", [("llm", "blocks")])
