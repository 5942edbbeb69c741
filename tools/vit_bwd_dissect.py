"""Isolate the ViT backward cost (train-step roofline, round 4).

Run from the repo root: python -m tools.vit_bwd_dissect
Probe rules live in tools/probe_common.py (scan inside one jit,
carry-perturbed params, single scalar fetch).
"""
import jax
import jax.numpy as jnp

from grasp_any_region_tpu.core.config import gar_1b
from grasp_any_region_tpu.models.vision import init_vision_params, vision_forward
from tools.probe_common import gnorm, scan_probe

cfg = gar_1b().vision
key = jax.random.PRNGKey(0)
vp = init_vision_params(key, cfg, jnp.bfloat16)
pix = jax.random.normal(key, (17, 3, 448, 448), jnp.bfloat16)


def fwd_only(p, px):
    return vision_forward(p, cfg, px, remat=True).astype(jnp.float32).sum()


def full_grad(p, px):
    loss, g = jax.value_and_grad(fwd_only)(p, px)
    return loss + 1e-30 * gnorm(g)


def norope_grad(p, px):
    """Grads w.r.t. everything except the learned rope freqs (angles are
    stop_gradient'ed) — isolates the rope-frequency backward cost."""
    def f(q, frozen):
        merged = {**q, "rope_freqs": jax.lax.stop_gradient(frozen)}
        return vision_forward(merged, cfg, px, remat=True).astype(jnp.float32).sum()

    q0 = {k: v for k, v in p.items() if k != "rope_freqs"}
    loss, g = jax.value_and_grad(f)(q0, p["rope_freqs"])
    return loss + 1e-30 * gnorm(g)


def noflash_grad(p, px):
    """use_flash=False: XLA-composed attention instead of the Pallas
    custom_vjp pair — isolates the flash fwd/bwd kernel cost."""
    def f(q):
        return vision_forward(q, cfg, px, remat=True,
                              use_flash=False).astype(jnp.float32).sum()

    loss, g = jax.value_and_grad(f)(p)
    return loss + 1e-30 * gnorm(g)


scan_probe("fwd (remat path)", fwd_only, vp, pix, tag="vit")
scan_probe("fwd+bwd", full_grad, vp, pix, tag="vit")
scan_probe("fwd+bwd rope_freqs frozen", norope_grad, vp, pix, tag="vit")
scan_probe("fwd+bwd xla attention", noflash_grad, vp, pix, tag="vit")
