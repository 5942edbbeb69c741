"""Accept-rate + tok/s harness for self-speculative decoding (VERDICT r3 #9).

Measures single-stream GAR-1B decode on the real chip in three weight
regimes, bounding the technique from both sides before real checkpoints
exist:
  * random weights        — accept-rate floor (draft disagrees ~always)
  * identity-tail weights — accept-rate ceiling (layers >= k are residual
    passthroughs, so draft == full model and every draft is accepted)

Run from the repo root:  python -c "exec(open('tools/spec_bench.py').read())"
"""
import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

from grasp_any_region_tpu.core.config import gar_1b
from grasp_any_region_tpu.data.synthetic import synthetic_batch
from grasp_any_region_tpu.models import init_gar_params
from grasp_any_region_tpu.models.generate import generate
from grasp_any_region_tpu.models.speculative import generate_speculative

NEW = 256
cfg = gar_1b()
params = init_gar_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
batch, _, pl = synthetic_batch(cfg, batch=1, grid=(4, 4), regions=1, seed=0)


def identity_tail(p, k):
    L = cfg.text.num_layers
    sel = (jnp.arange(L) < k)
    def z(w):
        return w * sel.reshape((L,) + (1,) * (w.ndim - 1)).astype(w.dtype)
    blocks = dict(p["llm"]["blocks"])
    blocks["wo"] = z(blocks["wo"])
    blocks["w_down"] = z(blocks["w_down"])
    return {**p, "llm": {**p["llm"], "blocks": blocks}}


def run_base(p, label):
    r = generate(p, cfg, batch, pl, max_new_tokens=NEW, temperature=0.0)
    np.asarray(r.tokens)  # force (relay executes per fetch)
    t0 = time.time()
    r = generate(p, cfg, batch, pl, max_new_tokens=NEW, temperature=0.0)
    np.asarray(r.tokens)
    dt = time.time() - t0
    n = int(r.num_generated[0])
    print(f"[spec] base generate {label}: {n} tok in {dt:.2f}s = "
          f"{n/dt:.1f} tok/s", file=sys.stderr)
    return n / dt


def run_spec(p, label, gamma, k):
    r = generate_speculative(p, cfg, batch, pl, max_new_tokens=NEW,
                             gamma=gamma, draft_layers=k)
    np.asarray(r.tokens)
    t0 = time.time()
    r = generate_speculative(p, cfg, batch, pl, max_new_tokens=NEW,
                             gamma=gamma, draft_layers=k)
    np.asarray(r.tokens)
    dt = time.time() - t0
    n = int(r.num_generated[0])
    acc = int(r.stats.accepted)
    drafted = int(r.stats.drafted)
    rate = acc / max(drafted, 1)
    print(f"[spec] spec {label} gamma={gamma} k={k}: {n} tok in {dt:.2f}s = "
          f"{n/dt:.1f} tok/s, accept {acc}/{drafted} = {rate:.2f}",
          file=sys.stderr)
    return n / dt, rate


base = run_base(params, "random")
for gamma, k in ((4, 2), (4, 4), (8, 4)):
    run_spec(params, "random", gamma, k)

pid = identity_tail(params, 4)
base_i = run_base(pid, "identity-tail")
for gamma, k in ((4, 4), (8, 4), (16, 4)):
    run_spec(pid, "identity-tail", gamma, k)
