"""Headline benchmark: GAR-1B region-captioning throughput on one TPU chip.

Workload (mirrors the DLC-Bench single-region inference path, SURVEY.md §3.2):
  * 1 image at the training tile budget: thumbnail + 4x4 grid = 17 tiles of
    448x448 -> 4,352 image tokens
  * 1 region mask -> mask patch embedding + 256 replay tokens
  * prefill ~4.7k tokens, then 256 greedy decode steps (typical detailed
    caption length)

Prints ONE JSON line:
  {"metric": "...", "value": captions/sec/chip, "unit": "captions/s",
   "vs_baseline": value / BASELINE_CAPTIONS_PER_SEC}

BASELINE_CAPTIONS_PER_SEC is our estimate of the reference stack's A100
throughput on the same workload (the reference publishes no speed numbers —
SURVEY.md §6): HF torch GAR-1B greedy decode runs ~80-120 tok/s on A100 with
the per-region python replay loop; 256 tokens + prefill ≈ 3.0 s/caption
=> ~0.33 captions/s. The north star (BASELINE.json) asks for >2x A100 on
v5e-8; this bench runs on ONE chip.
"""

import json
import sys
import time

BASELINE_CAPTIONS_PER_SEC = 0.33
DECODE_TOKENS = 256


def main():
    import jax
    import jax.numpy as jnp

    from grasp_any_region_tpu.core.config import gar_1b
    from grasp_any_region_tpu.data.synthetic import synthetic_batch
    from grasp_any_region_tpu.models import init_gar_params
    from grasp_any_region_tpu.models.generate import generate

    cfg = gar_1b()  # full 16-tile budget (configs/gar_1b.py:101)
    params = init_gar_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    batch, _, prompt_lens = synthetic_batch(
        cfg, batch=1, grid=(4, 4), regions=1, seed=0
    )
    print(
        f"[bench] prompt_len={int(prompt_lens[0])} tiles={int(batch.num_tiles[0])} "
        f"decode={DECODE_TOKENS}",
        file=sys.stderr,
    )

    def run():
        # eot_id=-1: no early exit -> deterministic token count
        out = generate(
            params, cfg, batch, prompt_lens,
            max_new_tokens=DECODE_TOKENS, eot_id=-1,
            mask_compat=False, use_flash=None,
        )
        jax.block_until_ready(out.tokens)
        return out

    t0 = time.time()
    run()
    compile_s = time.time() - t0
    print(f"[bench] compile+first run: {compile_s:.1f}s", file=sys.stderr)

    iters = 3
    t0 = time.time()
    for _ in range(iters):
        run()
    dt = (time.time() - t0) / iters
    caps_per_sec = 1.0 / dt
    print(
        f"[bench] steady-state {dt*1000:.0f} ms/caption "
        f"({DECODE_TOKENS/dt:.1f} decode tok/s incl. prefill)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "gar1b_region_captions_per_sec_per_chip",
                "value": round(caps_per_sec, 4),
                "unit": "captions/s",
                "vs_baseline": round(caps_per_sec / BASELINE_CAPTIONS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
