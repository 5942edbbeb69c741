"""On-chip dissection of the GAR-1B train step (VERDICT r4: train roofline).

Run from the repo root: python -c "exec(open('tools/train_dissect.py').read())"
(the axon relay executes per FETCH — every probe is a scan-of-8 inside one
jit with a single scalar fetch; see docs/PERF_NOTES.md round-2 notes).
"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from grasp_any_region_tpu.core.config import gar_1b
from grasp_any_region_tpu.data.synthetic import synthetic_batch
from grasp_any_region_tpu.models import init_gar_params
from grasp_any_region_tpu.train import OptimizerConfig, init_sharded_state, make_train_loop
from grasp_any_region_tpu.train.step import loss_fn

ITERS = 8
cfg = gar_1b()
params = init_gar_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
batch, labels, _ = synthetic_batch(cfg, batch=1, grid=(4, 4), regions=1, seed=0)

def timed(name, fn, *args):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]  # force
    t0 = time.time()
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    dt = (time.time() - t0) / ITERS
    print(f"[dissect] {name}: {dt*1000:.0f} ms/iter", file=sys.stderr)
    return dt

@jax.jit
def fwd_loop(p, b, l):
    def body(acc, _):
        return acc + loss_fn(p, cfg, b, l, mask_compat=False), None
    acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
    return acc

@jax.jit
def grad_loop(p, b, l):
    # grads consumed through a non-removable scale so nothing DCEs
    def body(acc, _):
        loss, g = jax.value_and_grad(
            lambda pp: loss_fn(pp, cfg, b, l, mask_compat=False))(p)
        gn = jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x.astype(jnp.float32) ** 2),
            g, jnp.float32(0.0))
        return acc + loss + 1e-30 * gn, None
    acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
    return acc

@jax.jit
def sgd_loop(p, b, l):
    # full backward + param write traffic, no Adam moments / clip / MultiSteps
    def body(pp, _):
        loss, g = jax.value_and_grad(
            lambda q: loss_fn(q, cfg, b, l, mask_compat=False))(pp)
        pp = jax.tree_util.tree_map(
            lambda w, d: w - (1e-8 * d).astype(w.dtype), pp, g)
        return pp, loss
    pp, losses = jax.lax.scan(body, p, None, length=ITERS)
    return losses

timed("fwd-only", fwd_loop, params, batch, labels)
timed("fwd+bwd (grads->norm)", grad_loop, params, batch, labels)
timed("fwd+bwd+sgd-write", sgd_loop, params, batch, labels)

opt_cfg = OptimizerConfig(lr=1e-4, total_steps=100, accumulation=1)
state, tx = init_sharded_state(params, opt_cfg, mesh=None)
del params  # the loop donates its state; keep exactly one copy resident
loop = make_train_loop(cfg, tx, ITERS, mask_compat=False, donate=True)
s2, _ = loop(state, batch, labels)  # warmup consumes `state`
np.asarray(jax.tree_util.tree_leaves(s2.step)[0:1])
t0 = time.time()
s3, losses = loop(s2, batch, labels)
np.asarray(losses)
print(f"[dissect] full train step (adamw): "
      f"{(time.time()-t0)/ITERS*1000:.0f} ms/iter", file=sys.stderr)
