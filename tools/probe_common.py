"""Shared scan-probe machinery for every on-chip measurement script.

VERDICT r4 Weak #7: the dissection tools copy-pasted this boilerplate with
drift, and these scripts are what perf claims rest on — the round-4
"107-vs-197 TF/s ceiling mystery" was exactly a probe bug (a loop whose
body was loop-invariant, so XLA hoisted the work out and the fetch timed an
empty scan). This module is the single correct implementation of the rules
(docs/PERF_NOTES.md round-2/round-4 notes):

  1. The axon relay executes lazily and charges per FETCH — every probe is
     a scan of ITERS iterations inside ONE jit with a single scalar fetch.
     `block_until_ready` proves nothing; warmups must also fetch.
  2. The scan body must DEPEND ON THE CARRY (perturb the params by a
     carry-held epsilon) or XLA's loop-invariant code motion computes it
     once and the probe under-reports by ~ITERS x.
  3. Anything the probe must not DCE (gradients) folds into the scalar
     through a tiny multiplier.

Use `scan_probe` for stateless work (fwd / fwd+bwd), `carry_probe` when the
body genuinely updates the tree (optimizer-write traffic).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

ITERS = 8


def perturbed(tree, eps):
    """Scale every float leaf by (1 + eps); eps is a traced scalar held in
    the scan carry, which is what defeats invariant code motion (rule 2)."""
    return jax.tree_util.tree_map(
        lambda x: (x * (1 + eps).astype(x.dtype))
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )


def gnorm(tree):
    """Scalar consumer for gradient trees (rule 3)."""
    return jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(x.astype(jnp.float32) ** 2),
        tree,
        jnp.float32(0.0),
    )


def timed(name, fn, *args, iters=ITERS, tag="probe"):
    """Warmup (fetched), then one timed call (fetched once). Returns s/iter."""
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]  # rule 1
    t0 = time.time()
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    dt = (time.time() - t0) / iters
    print(f"[{tag}] {name}: {dt*1000:.0f} ms/iter", file=sys.stderr)
    return dt


def scan_probe(name, scalar_fn, tree, *args, iters=ITERS, tag="probe"):
    """Time `scalar_fn(tree, *args) -> scalar` per the three rules.

    The body evaluates scalar_fn on a carry-perturbed copy of `tree` and
    folds the result back into the carry, so every iteration both depends
    on and feeds the carry. Returns s/iter.
    """

    @jax.jit
    def loop(p, *a):
        def body(eps, _):
            val = scalar_fn(perturbed(p, eps), *a)
            return eps + 1e-30 * val.astype(jnp.float32), None

        eps, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return eps

    return timed(name, loop, tree, *args, iters=iters, tag=tag)


def carry_probe(name, step_fn, tree, *args, iters=ITERS, tag="probe"):
    """Time `step_fn(tree, *args) -> (tree, scalar)` with the tree carried
    through the scan (optimizer/param-write probes). Returns s/iter."""

    @jax.jit
    def loop(p, *a):
        def body(pp, _):
            pp, val = step_fn(pp, *a)
            return pp, val

        pp, vals = jax.lax.scan(body, p, None, length=iters)
        return vals

    return timed(name, loop, tree, *args, iters=iters, tag=tag)
