"""Measure the chip's achievable bf16 matmul TF/s (the roofline numerator).

Addresses VERDICT r3 Weak #4: the round-3 "107 TF/s measured ceiling" was
probed with per-iteration fetches through the axon relay, which charges per
FETCH and replays the un-materialized graph (docs/PERF_NOTES.md round-2
notes) — so it conflated relay overhead with chip throughput. This probe
puts N back-to-back matmuls inside ONE jit (lax.scan with a data dependence
so XLA cannot CSE them) and fetches a single scalar: the only host round
trip is the final fetch, and the loop body is pure MXU work.

Usage: python tools/mxu_ceiling.py [--dim 4096] [--steps 64] [--iters 5]
"""

import argparse
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    d, n = args.dim, args.steps

    @jax.jit
    def chain(x, w):
        def body(c, _):
            # data-dependent chain: each matmul consumes the previous result
            c = (c @ w) * jnp.bfloat16(1.0)
            return c, None

        c, _ = jax.lax.scan(body, x, None, length=n)
        return c.sum()

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (d, d), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (d, d), jnp.bfloat16) / d

    float(chain(x, w))  # compile + warmup
    best = 0.0
    for _ in range(args.iters):
        t0 = time.time()
        s = float(chain(x, w))
        dt = time.time() - t0
        tf = 2 * d * d * d * n / dt / 1e12
        best = max(best, tf)
        print(f"[mxu] {n}x ({d}x{d})@({d}x{d}): {dt*1e3:.1f} ms -> "
              f"{tf:.1f} TF/s (sum {s:.3f})", file=sys.stderr)
    print(f"[mxu] best: {best:.1f} TF/s bf16 "
          f"(v5e nameplate ~197 TF/s -> {best/197*100:.0f}%)", file=sys.stderr)


if __name__ == "__main__":
    main()
