"""Self-speculative decoding: exactness vs generate(), accept-rate behavior.

The output contract is bit-identical greedy tokens (models/speculative.py
keeps a draft token only when it matches the full model's argmax), so the
parity test is exact equality, not tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grasp_any_region_tpu.core.config import gar_tiny

pytestmark = pytest.mark.slow  # ~3 min of CPU compiles; fast lane budget is 5
from grasp_any_region_tpu.data.synthetic import synthetic_batch
from grasp_any_region_tpu.models import init_gar_params
from grasp_any_region_tpu.models.generate import generate
from grasp_any_region_tpu.models.speculative import generate_speculative


@pytest.fixture(scope="module")
def setup():
    cfg = gar_tiny()
    params = init_gar_params(jax.random.PRNGKey(3), cfg, dtype=jnp.bfloat16)
    batch, _, pl = synthetic_batch(cfg, batch=1, grid=(2, 2), regions=1, seed=5)
    return cfg, params, batch, pl


def test_speculative_matches_greedy(setup):
    cfg, params, batch, pl = setup
    ref = generate(params, cfg, batch, pl, max_new_tokens=24, temperature=0.0)
    for gamma, k in ((4, 1), (2, 2)):
        spec = generate_speculative(
            params, cfg, batch, pl, max_new_tokens=24,
            gamma=gamma, draft_layers=k,
        )
        np.testing.assert_array_equal(
            np.asarray(spec.tokens), np.asarray(ref.tokens),
            err_msg=f"gamma={gamma} draft_layers={k}",
        )
        np.testing.assert_array_equal(
            np.asarray(spec.num_generated), np.asarray(ref.num_generated)
        )


def test_speculative_accepts_identity_tail(setup):
    """Zeroing wo/w_down of every layer past the draft depth makes those
    blocks exact residual passthroughs, so draft == full model and every
    draft token must be accepted (the mechanism's upper bound)."""
    cfg, params, batch, pl = setup
    k = 1
    L = cfg.text.num_layers
    sel = (jnp.arange(L) < k).astype(jnp.float32)

    def tail_zero(w):  # (L, ...) stacked block weight
        return (w * sel.reshape((L,) + (1,) * (w.ndim - 1)).astype(w.dtype))

    blocks = dict(params["llm"]["blocks"])
    blocks["wo"] = tail_zero(blocks["wo"])
    blocks["w_down"] = tail_zero(blocks["w_down"])
    doctored = {**params, "llm": {**params["llm"], "blocks": blocks}}

    gamma = 4
    spec = generate_speculative(
        doctored, cfg, batch, pl, max_new_tokens=16,
        gamma=gamma, draft_layers=k,
    )
    rounds = int(spec.stats.rounds)
    accepted = int(spec.stats.accepted)
    drafted = int(spec.stats.drafted)
    assert rounds > 0
    # every completed round must accept all gamma drafts (the final round
    # can be cut short by eot/max_new)
    assert accepted >= drafted - gamma, (rounds, drafted, accepted)
    # parity still holds on the doctored weights
    ref = generate(doctored, cfg, batch, pl, max_new_tokens=16,
                   temperature=0.0)
    np.testing.assert_array_equal(np.asarray(spec.tokens),
                                  np.asarray(ref.tokens))


def test_speculative_eot_early_exit(setup):
    """Force eot to be the argmax quickly by biasing the embedding row; the
    loop must stop, num_generated must count through the first eot, and
    everything after must be pad."""
    cfg, params, batch, pl = setup
    ref = generate(params, cfg, batch, pl, max_new_tokens=32, temperature=0.0)
    eot = int(np.asarray(ref.tokens)[0, int(ref.num_generated[0]) - 1])
    spec = generate_speculative(
        params, cfg, batch, pl, max_new_tokens=32, gamma=3, draft_layers=1,
    )
    n = int(spec.num_generated[0])
    toks = np.asarray(spec.tokens)[0]
    if n < 32:  # ended on eot
        assert (toks[n:] == 0).all()
    np.testing.assert_array_equal(toks, np.asarray(ref.tokens)[0])
    assert eot == toks[n - 1] or n == 32


def test_cli_speculative_smoke(tmp_path, capsys):
    """cli/gar_with_mask.py --speculative drives the draft/verify decode
    end-to-end from files (the reference demo surface, demo/gar_with_mask.py)."""
    from PIL import Image

    from grasp_any_region_tpu.cli.gar_with_mask import main

    rng = np.random.default_rng(0)
    img = tmp_path / "img.png"
    msk = tmp_path / "msk.png"
    Image.fromarray(rng.integers(0, 255, (80, 96, 3), dtype=np.uint8)).save(img)
    m = np.zeros((80, 96), np.uint8)
    m[20:60, 30:70] = 255
    Image.fromarray(m, "L").save(msk)
    main([
        "--preset", "gar_tiny", "--random-init",
        "--image", str(img), "--mask", str(msk),
        "--max-new-tokens", "8", "--speculative", "2,1",
    ])
    out = capsys.readouterr().out
    assert f"=== {img} ===" in out
