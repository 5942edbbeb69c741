"""Isolate the ViT backward cost (train-step roofline, round 4).

Each probe: scan of ITERS iterations inside one jit, carry perturbs the
params each step (defeats XLA while-loop invariant code motion), single
scalar fetch. Run: python -c "exec(open('tools/vit_bwd_dissect.py').read())"
"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from grasp_any_region_tpu.core.config import gar_1b
from grasp_any_region_tpu.models.vision import vision_forward, init_vision_params

ITERS = 8
cfg = gar_1b().vision
key = jax.random.PRNGKey(0)
vp = init_vision_params(key, cfg, jnp.bfloat16)
pix = jax.random.normal(key, (17, 3, 448, 448), jnp.bfloat16)


def timed(name, fn, *args):
    out = fn(*args)
    np.asarray(out).ravel()[:1]
    t0 = time.time()
    out = fn(*args)
    np.asarray(out).ravel()[:1]
    print(f"[vit] {name}: {(time.time()-t0)/ITERS*1000:.0f} ms/iter",
          file=sys.stderr)


def perturbed(p, eps):
    return jax.tree_util.tree_map(
        lambda x: (x * (1 + eps).astype(x.dtype))
        if jnp.issubdtype(x.dtype, jnp.floating) else x, p)


def gnorm(tree):
    return jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(x.astype(jnp.float32) ** 2), tree,
        jnp.float32(0.0))


def make(name, loss_maker):
    @jax.jit
    def loop(p, px):
        def body(eps, _):
            val = loss_maker(perturbed(p, eps), px)
            return eps + 1e-30 * val, None
        eps, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return eps
    timed(name, loop, vp, pix)


def fwd_only(p, px):
    return vision_forward(p, cfg, px, remat=True).astype(jnp.float32).sum()


def full_grad(p, px):
    loss, g = jax.value_and_grad(fwd_only)(p, px)
    return loss + gnorm(g)


def norope_grad(p, px):
    """Grads w.r.t. everything except the learned rope freqs (angles are
    stop_gradient'ed) — isolates the rope-frequency backward cost."""
    def f(q, frozen):
        merged = {**q, "rope_freqs": jax.lax.stop_gradient(frozen)}
        return vision_forward(merged, cfg, px, remat=True).astype(jnp.float32).sum()
    q0 = {k: v for k, v in p.items() if k != "rope_freqs"}
    loss, g = jax.value_and_grad(f)(q0, p["rope_freqs"])
    return loss + gnorm(g)


def noflash_grad(p, px):
    """use_flash=False: XLA-composed attention instead of the Pallas
    custom_vjp pair — isolates the flash fwd/bwd kernel cost."""
    def f(q):
        return vision_forward(q, cfg, px, remat=True,
                              use_flash=False).astype(jnp.float32).sum()
    loss, g = jax.value_and_grad(f)(p)
    return loss + gnorm(g)


make("fwd (remat path)", fwd_only)
make("fwd+bwd", full_grad)
make("fwd+bwd rope_freqs frozen", norope_grad)
make("fwd+bwd xla attention", noflash_grad)
